"""10x scale-up check for the round-3 tranche-2 operators.

Same key-shifted-copies method as scaleup_r3.py, with one twist for
the graph family: lineitem copies shift l_partkey and l_suppkey
(derived from the data, not constants) IN ADDITION to l_orderkey,
so the part–supplier / co-purchase GRAPH itself grows 10x (10
disconnected copies: 10x nodes, 10x edges, constant degree) — the
realistic growth model. Shifting only the order key would replay
the same graph 10x and merely stress the distinct.

Embeddings copies keep vectors verbatim under fresh vec_ids — every
cluster's membership grows 10x while the representative comparison
stays one-vs-rep, the linearity dedup_semdedup claims.

Usage: python scripts/scaleup_r3b.py [sf_dir]
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
    "graph_pagerank": "lineitem",
    "graph_triangle_count": "lineitem",
    "graph_bfs_levels": "lineitem",
    "event_markov_transitions": "events",
    "export_jsonl_sharded": "documents",
    "quality_gate_reasons": "documents",
    "sample_weighted_bernoulli": "documents",
    "dedup_semdedup": "embeddings",
    "scan_observed_metrics": "orders",
}
KEYS = {"events": "event_id", "lineitem": "l_orderkey",
        "documents": "doc_id", "embeddings": "vec_id",
        "supplier": "s_suppkey", "orders": "o_orderkey"}


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r3b")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_r3b_")
    # graph_bfs_levels reads supplier too: copies shift s_suppkey by
    # the SAME amount as lineitem's l_suppkey so the graphs line up,
    # and the seed set (s_suppkey <= 2) stays in copy 0 only — a
    # fixed blast-radius probe against a 10x bigger graph.
    s_shift = (load(spark, sf_dir, "lineitem")
               .agg(F.max("l_suppkey")).collect()[0][0] + 1)
    for table in sorted(set(OPS.values()) | {"supplier"}):
        df = load(spark, sf_dir, table)
        key = KEYS[table]
        shift = (s_shift if table == "supplier"
                 else df.agg(F.max(key)).collect()[0][0] + 1)
        copies = (df.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))))
            .withColumn(key, F.col(key) + F.col("copy") * F.lit(shift)))
        if table == "lineitem":
            # NOTE: do not rebind s_shift here — supplier copies must
            # use the SAME +1 shift so graph vertex ids line up
            p_shift = df.agg(F.max("l_partkey")).collect()[0][0] + 1
            copies = (copies.withColumn(
                "l_partkey",
                F.col("l_partkey") + F.col("copy") * F.lit(p_shift))
                .withColumn(
                "l_suppkey",
                F.col("l_suppkey") + F.col("copy") * F.lit(s_shift)))
        if table == "events":
            user_shift = df.agg(F.max("user_id")).collect()[0][0] + 1
            copies = copies.withColumn(
                "user_id",
                F.col("user_id") + F.col("copy") * F.lit(user_shift))
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
