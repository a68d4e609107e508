"""Round-14 probe (VERDICT r13 #5): where does graph_triangle_count
spend its time one decade up?  627 s at sf10 was the worst cell in
SWEEP_r13_sf10. Decomposes the query into its cumulative stages (each
timed with the noop sink, warm):

  A. per-order part sets (groupBy l_orderkey + sort_array/collect_set)
  B. + pair explode + DISTINCT  (the und edge set)
  C. + degree table (union + count)
  D. + orientation (two deg joins + src/dst select)
  E. + adjacency lists (groupBy src + sorted collect_list)
  F. full query (+ the two adjacency joins + array_intersect sum)

and prints the skew profile of the oriented edge set (top dst
in-degrees; per-partition row counts of the final join's probe side)
— the §2.5 check: orientation bounds OUT-degree by O(sqrt|E|), but a
hub's IN-degree is unbounded, so every edge into it repeats the
hub's nbrs array through the dst-side join.

Usage: python scripts/probe_r14_triangle.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)


def t(spark, label, df, n=2):
    def run():
        df.write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(f"tri-probe: {label}")
    run()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    samples.sort()
    print(f"{label:44s} med={samples[len(samples)//2]:8.3f} "
          f"min={samples[0]:8.3f}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ordspark_sf1"
    spark = get_session("probe_r14_triangle")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    und = (sets.select(F.explode(F.flatten(F.expr(
        "transform(ps, (x, i) -> transform("
        "slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x AS pa, y AS pb)))"))).alias("e"))
        .select("e.pa", "e.pb").distinct())
    deg = (und.select(F.col("pa").alias("node"))
           .unionAll(und.select(F.col("pb").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    da, db = deg.alias("da"), deg.alias("db")
    keyed = (und.join(da, F.col("pa") == F.col("da.node"))
             .join(db, F.col("pb") == F.col("db.node"))
             .select("pa", "pb", F.col("da.deg").alias("dega"),
                     F.col("db.deg").alias("degb")))
    fwd = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("pa") < F.col("pb")))
    oriented = keyed.select(
        F.when(fwd, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(fwd, F.col("pb")).otherwise(F.col("pa")).alias("dst"))
    adj = (oriented.groupBy("src")
           .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
           .withColumnRenamed("src", "node"))
    au, av = adj.alias("au"), adj.alias("av")
    tri = (oriented
           .join(au, F.col("src") == F.col("au.node"))
           .join(av, F.col("dst") == F.col("av.node"))
           .select(F.size(F.array_intersect(
               F.col("au.nbrs"), F.col("av.nbrs"))).alias("k"))
           .agg(F.coalesce(F.sum("k"), F.lit(0)).cast("bigint")
                .alias("n_triangles")))

    t(spark, "A order part sets", sets)
    t(spark, "B + pair explode + distinct (und)", und)
    t(spark, "C + degree table", deg)
    t(spark, "D + orientation joins", oriented)
    t(spark, "E + adjacency lists", adj)
    t(spark, "F full (adjacency-intersection joins)", tri)

    # skew profile
    n_edges = und.count()
    print(f"edges: {n_edges}", flush=True)
    top_in = (oriented.groupBy("dst").count()
              .orderBy(F.desc("count")).limit(10).collect())
    print("top oriented IN-degrees (dst side of the av join):",
          [(r.dst, r["count"]) for r in top_in], flush=True)
    top_out = (oriented.groupBy("src").count()
               .orderBy(F.desc("count")).limit(5).collect())
    print("top oriented OUT-degrees (nbrs array lengths):",
          [(r.src, r["count"]) for r in top_out], flush=True)


if __name__ == "__main__":
    main()
