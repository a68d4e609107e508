"""10x scale-up check for the round-2 tranche-2 operators.

Same method as scaleup_r2.py (key-shifted 10x copies, warm timings
at 1x and 10x), with two additions this tranche needs:

- orders and lineitem share the o_orderkey/l_orderkey domain, so
  both are shifted by the SAME constant (orders' max key) — a
  per-table shift would misalign the copies and quietly shrink the
  bloom-join's matches;
- embeddings' labels are remapped per copy (label + 10*copy), so the
  knn-join's blocks keep their 1x SIZE while the probe count grows
  10x. That models the documented scale path (block granularity is
  refined as the corpus grows — LSH/IVF cells at 100 TB); without
  the remap, exact blocked knn is quadratic in block size by
  construction and the ratio would measure that, not the engine.

Usage: python scripts/scaleup_r2b.py [sf_dir]
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
OPS = {
    "event_funnel": "events",
    "retention_cohorts": "events",
    "agg_incremental_merge": "orders",
    "join_bloom_prefilter": "lineitem",   # + orders, shift-aligned
    "vector_knn_join": "embeddings",
    "sink_compact_small_files": "documents",
}
KEYS = {"events": "event_id", "orders": "o_orderkey",
        "lineitem": "l_orderkey", "documents": "doc_id",
        "embeddings": "vec_id"}


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r2b")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_r2b_")
    # one shift constant for the whole orderkey domain
    okey_shift = (load(spark, sf_dir, "orders")
                  .agg(F.max("o_orderkey")).collect()[0][0] + 1)
    tables = sorted(set(OPS.values()) | {"orders"})
    for table in tables:
        df = load(spark, sf_dir, table)
        key = KEYS[table]
        shift = (okey_shift if table in ("orders", "lineitem")
                 else df.agg(F.max(key)).collect()[0][0] + 1)
        copies = (df.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
            .withColumn(key, F.col(key) + F.col("copy") * F.lit(shift)))
        # secondary-key shifts derived from the data, like the
        # primary shift — hard-coded constants silently alias copies
        # (deflating per-user / per-block growth) the day the 1x
        # domain outgrows them.
        if table == "events":
            user_shift = df.agg(F.max("user_id")).collect()[0][0] + 1
            copies = copies.withColumn(
                "user_id",
                F.col("user_id") + F.col("copy") * F.lit(user_shift))
        if table == "embeddings":
            label_shift = df.agg(F.max("label")).collect()[0][0] + 1
            copies = copies.withColumn(
                "label", F.col("label") + F.col("copy") * F.lit(label_shift))
        (copies.drop("copy").repartition(32)
         .write.mode("overwrite").parquet(f"{big}/{table}.parquet"))
        n = spark.read.parquet(f"{big}/{table}.parquet").count()
        print(f"{table}: 10x at {n} rows")

    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s "
              f"ratio={t10 / t1:.1f}x")


if __name__ == "__main__":
    main()
