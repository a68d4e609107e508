"""10x scale-up check for the round-5 tranche (de-vacuated paths +
multimodal codec pipeline).

Same key-shifted-copies method as scaleup_r2b/r3. Round-5 notes:

- documents copies get a per-copy SALT token INTERLEAVED between
  every pair of words (not appended: a single trailing token leaves
  cross-copy Jaccard at ~0.96 — still a near-dup clique, which
  would measure LSH's inherently quadratic-in-group-size pair
  output, a semantic change, not scale). Interleaving puts the
  copy's salt inside EVERY 3-word shingle, driving cross-copy
  shingle overlap to zero while same-copy doc-pair similarity is
  preserved (both docs carry the same salt in the same positions) —
  so near-dup structure replicates per copy and pair counts grow
  ~linearly with the 10x corpus. Token count doubles per doc (the
  per-doc work constant shifts; the SCALE exponent is what's
  measured);
- lineitem copies shift l_orderkey only: supplier stays a 1x
  dimension, so join_groupwise_max sees 10x facts over the same
  supplier domain (more volume per supplier — the realistic shape);
- orders copies re-point o_custkey into the matching customer copy
  (join_anti's unmatched-customer fraction stays at its 1x value);
- supplier and nation ship verbatim at 1x (dimensions don't grow
  10x when facts do).

Usage: python scripts/scaleup_r5.py [sf_dir]
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
OPS = (
    "join_groupwise_max",
    "join_anti",
    "sql_tpch_q7",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "multimodal_columns",
    "multimodal_resize_stub",
    "multimodal_frame_sample",
    "multimodal_phash_dedup",
)


def time_op(spark, name: str, sf_dir: str) -> float:
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r5")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="ordspark_scaleup_r5_")
    okey_shift = (load(spark, sf_dir, "orders")
                  .agg(F.max("o_orderkey")).collect()[0][0] + 1)
    cust_shift = (load(spark, sf_dir, "customer")
                  .agg(F.max("c_custkey")).collect()[0][0] + 1)
    doc_shift = (load(spark, sf_dir, "documents")
                 .agg(F.max("doc_id")).collect()[0][0] + 1)

    copy_col = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
    li = (load(spark, sf_dir, "lineitem").withColumn("copy", copy_col)
          .withColumn("l_orderkey",
                      F.col("l_orderkey") + F.col("copy") * okey_shift))
    orders = (load(spark, sf_dir, "orders").withColumn("copy", copy_col)
              .withColumn("o_orderkey",
                          F.col("o_orderkey") + F.col("copy") * okey_shift)
              .withColumn("o_custkey",
                          F.col("o_custkey") + F.col("copy") * cust_shift))
    cust = (load(spark, sf_dir, "customer").withColumn("copy", copy_col)
            .withColumn("c_custkey",
                        F.col("c_custkey") + F.col("copy") * cust_shift))
    salt = F.concat(F.lit(" s"), F.col("copy").cast("string"), F.lit(" "))
    docs = (load(spark, sf_dir, "documents").withColumn("copy", copy_col)
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("copy") * doc_shift)
            .withColumn("text", F.when(
                F.col("copy") == 0, F.col("text")).otherwise(
                F.regexp_replace("text", " ", salt))))
    for table, df in (("lineitem", li), ("orders", orders),
                      ("customer", cust), ("documents", docs)):
        (df.drop("copy").repartition(32)
         .write.mode("overwrite").parquet(f"{big}/{table}.parquet"))
        n = spark.read.parquet(f"{big}/{table}.parquet").count()
        print(f"{table}: 10x at {n} rows", flush=True)
    for table in ("supplier", "nation"):
        (load(spark, sf_dir, table)
         .write.mode("overwrite").parquet(f"{big}/{table}.parquet"))
        print(f"{table}: 1x dimension", flush=True)

    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s "
              f"ratio={t10 / t1:.1f}x", flush=True)


if __name__ == "__main__":
    main()
