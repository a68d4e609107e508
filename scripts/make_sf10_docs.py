"""Build the sf10 DOCUMENTS decade for the round-12 LSH/dedup value
gate (VERDICT r11 next-round #3): 100 copies of sf0.1's documents
(500k docs — one decade above the sf1 sweep's 50k) under make_sf1's
DOC-DEPENDENT salt-interleave model, so the similarity structure
stays 1x-like per copy (cross-copy shingle overlap ~1/97, no planted
quadratic output) while the corpus is 100x. make_sf10.py deliberately
copies documents VERBATIM (its gate is decimal/window aggregates and
identical copies would plant quadratic pair output for dedup — its
header says so), hence this separate builder for the dedup subset.

The salt model is make_sf1.py's exactly (' s<copy>d<doc%97>x<pos> '
between every pair of original tokens, n_chars recomputed), built
with Spark HOFs instead of pandas .apply so 100 copies stay fast.

Usage: python scripts/make_sf10_docs.py [out_dir]
       (default /tmp/ordspark_sf10docs)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402

BASE = "/root/testdata/sf0.1"
COPIES = 100


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ordspark_sf10docs"
    spark = get_session("make_sf10_docs")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, BASE, "documents")
    span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    grown = (docs.withColumn("copy", F.explode(
                 F.sequence(F.lit(0), F.lit(COPIES - 1))))
             .withColumn("doc_id",
                         F.col("doc_id") + F.col("copy") * span))
    toks = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            toks,
            lambda t, j: F.when(
                j < F.size(toks) - 1,
                F.concat(t, F.lit(" s"),
                         F.col("copy").cast("string"), F.lit("d"),
                         (F.col("doc_id") % 97).cast("string"),
                         F.lit("x"), j.cast("string"))
            ).otherwise(t)),
        " ")
    final = (grown.withColumn(
                 "text", F.when(F.col("copy") == 0,
                                F.col("text")).otherwise(salted))
             .withColumn("n_chars", F.length("text").cast("long"))
             .drop("copy"))
    (final.repartition(32).write.mode("overwrite")
     .parquet(f"{out}/documents.parquet"))
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"wrote {out}/documents.parquet: {n} rows "
          f"({COPIES}x of {BASE})", flush=True)


if __name__ == "__main__":
    main()
