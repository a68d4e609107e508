"""10× scale-up check for the round-2 operator additions.

Key-shifted 10× copies of the tables each op reads (customer /
events / documents / embeddings), warm timings at 1× and 10×.
Customer names are REGENERATED from the shifted key (not copied), so
the fuzzy-dedup pair density stays realistic instead of exploding
10× copies of identical names into quadratic pairs.

Usage: python scripts/scaleup_r2.py [sf_dir]
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
# op -> table it scales with
OPS = {
    "dedup_fuzzy_levenshtein": "customer",
    "win_fill_forward": "events",
    "agg_bitmap_distinct": "events",
    "win_sessionize_gaps": "events",
    "agg_min_max_by": "orders",
    "merge_upsert_scd2": "orders",
    "num_histogram_fixed": "lineitem",
    "text_vocab_topk": "documents",
    "text_entropy_quality": "documents",
    "vector_centroid_agg": "embeddings",
}
KEYS = {"customer": "c_custkey", "events": "event_id",
        "orders": "o_orderkey", "lineitem": "l_orderkey",
        "documents": "doc_id", "embeddings": "vec_id"}


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r2")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_r2_")
    for table in sorted(set(OPS.values())):
        df = load(spark, sf_dir, table)
        key = KEYS[table]
        shift = df.agg(F.max(key)).collect()[0][0] + 1
        copies = (df.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
            .withColumn(key, F.col(key) + F.col("copy") * F.lit(shift))
            .drop("copy"))
        if table == "customer":
            # regenerate names from the shifted key so near-dup
            # density stays realistic (10 identical copies of every
            # name would measure a quadratic-output artifact instead)
            copies = copies.withColumn(
                "c_name",
                F.concat(F.lit("Customer#"),
                         F.lpad(F.col("c_custkey").cast("string"), 9, "0")))
        if table == "events":
            copies = copies.withColumn(
                "user_id", F.col("user_id") + F.col("event_id") % COPIES
                * F.lit(1000000))
        (copies.repartition(32)
         .write.mode("overwrite").parquet(f"{big}/{table}.parquet"))
        n = spark.read.parquet(f"{big}/{table}.parquet").count()
        print(f"{table}: 10x at {n} rows")

    for name, table in OPS.items():
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s "
              f"ratio={t10 / t1:.1f}x")


if __name__ == "__main__":
    main()
