"""10× scale-up check for the documents-table pipeline ops.

Builds a key-shifted 10× copy of ``documents`` (doc_ids offset per
copy, text left identical — which makes every block/gram shared
across ~10 docs, the WORST case for the dedup/decontamination ops:
maximum candidate density and per-key skew) and times each op warm
at 1× and 10×. Ratios near 10× mean linear scaling under that
stress; below means overheads amortizing.

Usage: python scripts/scaleup_docs.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402

COPIES = 10
OPS = ["text_pii_redact", "text_decontaminate_ngram",
       "dedup_subdoc_blocks", "dedup_minhash_lsh",
       "pipeline_training_data", "sample_stratified",
       "pipeline_corpus_curation"]


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_")
    docs = load(spark, sf_dir, "documents")
    shift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = docs.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
    (copies.withColumn("doc_id",
                       F.col("doc_id") + F.col("copy") * F.lit(shift))
     .drop("copy")
     .repartition(32)
     .write.mode("overwrite").parquet(f"{big}/documents.parquet"))
    print(f"10x copy at {big} "
          f"({spark.read.parquet(f'{big}/documents.parquet').count()} rows)")

    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s "
              f"ratio={t10 / t1:.1f}x")


if __name__ == "__main__":
    main()
