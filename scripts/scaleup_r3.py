"""10x scale-up check for the round-3 tranche.

Same key-shifted-copies method as scaleup_r2b.py. Round-3 notes:

- customer is copied with its OWN c_custkey shift and orders' copies
  re-point o_custkey into the matching customer copy, so Q18's
  per-customer order density stays at its 1x value (the realistic
  model: more customers, not 10x-denser ones);
- part copies shift p_partkey only — the (price, size) value domain
  deliberately stays put, so the skyline's distinct-pair set stays
  1x-sized while the raw scan grows 10x (exactly the shape the
  banded sweep claims to exploit);
- documents copies duplicate text verbatim, so the boilerplate
  strip's shared-block set saturates (every block lands in >= 10
  docs). That is the worst case for its counting join — kept
  deliberately.

Usage: python scripts/scaleup_r3.py [sf_dir]
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
    "sql_tpch_q18": "lineitem",
    "skyline_pareto": "part",
    "join_asof_forward": "events",
    "assoc_pair_lift": "events",
    "ts_resample_interpolate": "events",
    "agg_time_bucket_multi": "events",
    "win_streak_longest": "events",
    "anomaly_zscore": "events",
    "cdc_apply_changelog": "events",
    "join_interval_overlap": "events",
    "text_boilerplate_strip": "documents",
    "embedding_quantize_int8": "embeddings",
    "split_train_test": "documents",
    "corpus_mix_report": "documents",
}
KEYS = {"events": "event_id", "orders": "o_orderkey",
        "lineitem": "l_orderkey", "documents": "doc_id",
        "embeddings": "vec_id", "part": "p_partkey",
        "customer": "c_custkey"}


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r3")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_r3_")
    okey_shift = (load(spark, sf_dir, "orders")
                  .agg(F.max("o_orderkey")).collect()[0][0] + 1)
    cust_shift = (load(spark, sf_dir, "customer")
                  .agg(F.max("c_custkey")).collect()[0][0] + 1)
    tables = sorted(set(OPS.values()) | {"orders", "customer"})
    for table in tables:
        df = load(spark, sf_dir, table)
        key = KEYS[table]
        shift = (okey_shift if table in ("orders", "lineitem")
                 else cust_shift if table == "customer"
                 else df.agg(F.max(key)).collect()[0][0] + 1)
        copies = (df.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
            .withColumn(key, F.col(key) + F.col("copy") * F.lit(shift)))
        if table == "events":
            user_shift = df.agg(F.max("user_id")).collect()[0][0] + 1
            copies = copies.withColumn(
                "user_id",
                F.col("user_id") + F.col("copy") * F.lit(user_shift))
        if table == "orders":
            copies = copies.withColumn(
                "o_custkey",
                F.col("o_custkey") + F.col("copy") * F.lit(cust_shift))
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
