"""Round-7b scale probe: the three REMAINING re-hashed operators at
1x/10x/100x, default confs — the portable (md5-derived) hash family
landed this round changed dedup_simhash, vector_ann_lsh and
text_fingerprint's hot loops, so their scale story needs re-measuring
(dedup_minhash_lsh is covered by scaleup_r7.py).

Corpus construction matches scaleup_r6: documents get per-copy salt
tokens interleaved (cross-copy overlap → 0); embeddings get shifted
ids + per-coordinate jitter with the 8 query vectors kept 1x (fixed
probe set, growing corpus — the real ANN regime).

Usage: python scripts/scaleup_r7b.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from scripts.probe_common import time_op  # noqa: E402

OPS = ("dedup_simhash", "text_fingerprint", "vector_ann_lsh")


def build_scaled(spark, sf_dir: str, copies: int, out: str) -> None:
    copy_col = F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    dkey = (load(spark, sf_dir, "documents")
            .agg(F.max("doc_id")).collect()[0][0] + 1)
    vkey = (load(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id")).collect()[0][0] + 1)
    salt = F.concat(F.lit(" s"), F.col("copy").cast("string"), F.lit(" "))
    docs = (load(spark, sf_dir, "documents").withColumn("copy", copy_col)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * dkey)
            .withColumn("text", F.when(
                F.col("copy") == 0, F.col("text")).otherwise(
                F.regexp_replace("text", " ", salt))))
    emb = (load(spark, sf_dir, "embeddings").withColumn("copy", copy_col)
           .withColumn("vec_id", F.col("vec_id") + F.col("copy") * vkey)
           .withColumn("embedding", F.expr(
               "transform(embedding, (x, i) -> CAST(x + "
               "0.001 * ((copy * 31 + i) % 7 - 3) AS FLOAT))")))
    for table, df in (("documents", docs), ("embeddings", emb)):
        (df.drop("copy").repartition(32)
         .write.mode("overwrite").parquet(f"{out}/{table}.parquet"))
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"  {table}: {copies}x at {n} rows", flush=True)



def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r7b")
    spark.sparkContext.setLogLevel("ERROR")

    big10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r7b_10x_")
    big100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r7b_100x_")
    print("building 10x ...", flush=True)
    build_scaled(spark, sf_dir, 10, big10)
    print("building 100x ...", flush=True)
    build_scaled(spark, sf_dir, 100, big100)

    summary: dict = {}
    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big10)
        t100 = time_op(spark, name, big100)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
              f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x",
              flush=True)
        summary[name] = {
            "1x": round(t1, 2), "10x": round(t10, 2), "100x": round(t100, 2),
            "ratio_1_to_10": round(t10 / t1, 1),
            "ratio_10_to_100": round(t100 / t10, 1)}
    print("SCALEUP_R7B_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
