"""Round-6 scale probes: (a) the dedup_clusters 10x record the
round-5 verdict asked for (it became the bench's #3 cost with no
recorded scale ratio), with the CC round count logged; (b) a 100x
probe of the five most expensive/representative ops so the 100 TB
claims rest on two measured decades (1x -> 10x -> 100x), not one.

Scaling method per table (key-shifted copies, as scaleup_r2..r5):

- lineitem: shift l_orderkey AND l_partkey per copy. Shifting the
  part key too makes the co-purchase graph 100 DISJOINT copies of
  the 1x graph — triangles grow exactly linearly, which is the scale
  question. (Shifting only the orderkey would densify one shared
  part domain: a semantic change that measures graph densification,
  not data scale.)
- orders: shift o_orderkey (+o_custkey into the matching customer
  copy's range, for shape consistency with prior rounds).
- documents: shift doc_id; non-zero copies get a per-copy salt token
  INTERLEAVED between every pair of words (see scaleup_r5.py's note:
  interleaving drives cross-copy shingle overlap to zero so near-dup
  pair density grows linearly, not quadratically).
- embeddings: shift vec_id; non-zero copies get index-dependent
  jitter on every coordinate (a pure scalar rescale would leave
  cosine structure identical — jitter makes copies distinct points
  without reshaping the space). Query rows (vec_id < N_QUERIES) stay
  1x — fixed probe set, growing corpus, the realistic ANN regime.

Usage: python scripts/scaleup_r6.py [sf_dir]
Prints one line per (op, scale) and a JSON summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.operators import dedup  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402

OPS_100 = (
    "agg_multi",
    "join_shuffle_equi",
    "graph_triangle_count",
    "dedup_minhash_lsh",
    "vector_ann_pq",
)


def build_scaled(spark, sf_dir: str, copies: int, out: str) -> None:
    copy_col = F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    okey = (load(spark, sf_dir, "orders")
            .agg(F.max("o_orderkey")).collect()[0][0] + 1)
    pkey = (load(spark, sf_dir, "part")
            .agg(F.max("p_partkey")).collect()[0][0] + 1)
    ckey = (load(spark, sf_dir, "customer")
            .agg(F.max("c_custkey")).collect()[0][0] + 1)
    dkey = (load(spark, sf_dir, "documents")
            .agg(F.max("doc_id")).collect()[0][0] + 1)
    vkey = (load(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id")).collect()[0][0] + 1)

    li = (load(spark, sf_dir, "lineitem").withColumn("copy", copy_col)
          .withColumn("l_orderkey",
                      F.col("l_orderkey") + F.col("copy") * okey)
          .withColumn("l_partkey",
                      F.col("l_partkey") + F.col("copy") * pkey))
    orders = (load(spark, sf_dir, "orders").withColumn("copy", copy_col)
              .withColumn("o_orderkey",
                          F.col("o_orderkey") + F.col("copy") * okey)
              .withColumn("o_custkey",
                          F.col("o_custkey") + F.col("copy") * ckey))
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
    for table, df in (("lineitem", li), ("orders", orders),
                      ("documents", docs), ("embeddings", emb)):
        (df.drop("copy").repartition(32)
         .write.mode("overwrite").parquet(f"{out}/{table}.parquet"))
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"  {table}: {copies}x at {n} rows", flush=True)


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
    spark = get_session("scaleup_r6")
    spark.sparkContext.setLogLevel("ERROR")

    big10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r6_10x_")
    big100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r6_100x_")
    print("building 10x ...", flush=True)
    build_scaled(spark, sf_dir, 10, big10)
    print("building 100x ...", flush=True)
    build_scaled(spark, sf_dir, 100, big100)

    summary: dict = {}

    # (a) dedup_clusters 1x / 10x with CC rounds
    t1 = time_op(spark, "dedup_clusters", sf_dir)
    r1 = dedup.LAST_CC_ROUNDS
    t10 = time_op(spark, "dedup_clusters", big10)
    r10 = dedup.LAST_CC_ROUNDS
    print(f"dedup_clusters: 1x={t1:.2f}s (cc_rounds={r1}) "
          f"10x={t10:.2f}s (cc_rounds={r10}) ratio={t10 / t1:.1f}x",
          flush=True)
    summary["dedup_clusters"] = {
        "1x": round(t1, 2), "10x": round(t10, 2),
        "ratio_10x": round(t10 / t1, 1),
        "cc_rounds": {"1x": r1, "10x": r10}}

    # (b) 100x probe of the top-5
    for name in OPS_100:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big10)
        t100 = time_op(spark, name, big100)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
              f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x",
              flush=True)
        summary[name] = {
            "1x": round(t1, 2), "10x": round(t10, 2),
            "100x": round(t100, 2),
            "ratio_1_to_10": round(t10 / t1, 1),
            "ratio_10_to_100": round(t100 / t10, 1)}

    print("SCALEUP_R6_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
