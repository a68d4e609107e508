"""Round-5 task: can graph_pagerank's local latency floor be cut
>=20% without hurting the scale story? Times variants at a given SF.

Usage: python scripts/pagerank_exp.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.operators.graph import (  # noqa: E402
    _PR_SCALE, _bipartite_edges, graph_pagerank)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402


def v1_cached_edges(spark, sf_dir):
    """Persist edges + deg before the loop (recompute avoidance)."""
    edges = _bipartite_edges(spark, sf_dir).persist()
    deg = (edges.groupBy("src").agg(F.count("*").alias("deg"))
           .withColumnRenamed("src", "node").persist())
    n = deg.agg(F.count("*").alias("n_nodes"))
    rank = (deg.crossJoin(F.broadcast(n))
            .select("node", "deg", "n_nodes",
                    F.expr(f"CAST({_PR_SCALE} DIV n_nodes AS BIGINT)")
                    .alias("rank_fp")))
    for _ in range(3):
        contrib = (rank.join(edges, rank.node == edges.src)
                   .select(F.col("dst"),
                           F.expr("(85 * (rank_fp DIV deg)) DIV 100")
                           .alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        rank = (deg.crossJoin(F.broadcast(n))
                .join(contrib, deg.node == contrib.dst)
                .select("node", "deg", "n_nodes",
                        F.expr(f"CAST((15 * {_PR_SCALE}) DIV "
                               "(100 * n_nodes) + s AS BIGINT)")
                        .alias("rank_fp")))
    out = rank.select("node", "rank_fp")
    try:
        return out.count()
    finally:
        edges.unpersist()
        deg.unpersist()


def v2_fused(spark, sf_dir):
    """Carry (deg, n_nodes) through each iteration: contrib joins
    back to the PREVIOUS rank row instead of re-joining deg +
    re-broadcasting n. Same result on graphs where every node has
    an in-edge (symmetric bipartite graph: always)."""
    edges = _bipartite_edges(spark, sf_dir)
    deg = (edges.groupBy("src").agg(F.count("*").alias("deg"))
           .withColumnRenamed("src", "node"))
    n = deg.agg(F.count("*").alias("n_nodes"))
    rank = (deg.crossJoin(F.broadcast(n))
            .select("node", "deg", "n_nodes",
                    F.expr(f"CAST({_PR_SCALE} DIV n_nodes AS BIGINT)")
                    .alias("rank_fp")))
    for _ in range(3):
        contrib = (rank.join(edges, rank.node == edges.src)
                   .select("dst",
                           F.expr("(85 * (rank_fp DIV deg)) DIV 100")
                           .alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        rank = (rank.drop("rank_fp")
                .join(contrib, rank.node == contrib.dst)
                .select("node", "deg", "n_nodes",
                        F.expr(f"CAST((15 * {_PR_SCALE}) DIV "
                               "(100 * n_nodes) + s AS BIGINT)")
                        .alias("rank_fp")))
    return rank.select("node", "rank_fp").count()


def v3_cached_fused(spark, sf_dir):
    """v1 + v2 combined."""
    edges = _bipartite_edges(spark, sf_dir).persist()
    deg = (edges.groupBy("src").agg(F.count("*").alias("deg"))
           .withColumnRenamed("src", "node"))
    n = deg.agg(F.count("*").alias("n_nodes"))
    rank = (deg.crossJoin(F.broadcast(n))
            .select("node", "deg", "n_nodes",
                    F.expr(f"CAST({_PR_SCALE} DIV n_nodes AS BIGINT)")
                    .alias("rank_fp")).persist())
    for _ in range(3):
        contrib = (rank.join(edges, rank.node == edges.src)
                   .select("dst",
                           F.expr("(85 * (rank_fp DIV deg)) DIV 100")
                           .alias("c"))
                   .groupBy("dst").agg(F.sum("c").alias("s")))
        rank = (rank.drop("rank_fp")
                .join(contrib, rank.node == contrib.dst)
                .select("node", "deg", "n_nodes",
                        F.expr(f"CAST((15 * {_PR_SCALE}) DIV "
                               "(100 * n_nodes) + s AS BIGINT)")
                        .alias("rank_fp")))
    out = rank.select("node", "rank_fp")
    try:
        return out.count()
    finally:
        edges.unpersist()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("prexp")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "v0_current": lambda s, d: graph_pagerank(s, d).count(),
        "v1_cached": v1_cached_edges,
        "v2_fused": v2_fused,
        "v3_cached_fused": v3_cached_fused,
    }
    # warm-up: JVM + parquet footer caches
    load(spark, sf_dir, "lineitem").count()
    for name, fn in variants.items():
        times = []
        for _ in range(reps):
            t0 = time.time()
            n = fn(spark, sf_dir)
            times.append(time.time() - t0)
        print(f"{name}: n={n} min={min(times):.2f}s "
              f"times={[round(t, 2) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
