"""Round-14 session-2 A/B: CC convergence check fused into the
checkpoint materialization via Observation.

Before: every CC round = eager localCheckpoint job + a SECOND
sum-agg job over the just-checkpointed labels (2 jobs + 2 scans of
labels per round). After: the DECIMAL(38,0) label sum rides the
checkpoint's own action as a CollectMetrics observation (1 job +
1 scan per round). This probe interleaves both forms on
dedup_clusters and dedup_clusters_neardup (the two CC callers),
recording wall med + Spark job count per run, and asserts the
outputs are row-identical.

Usage: python scripts/probe_r14_ccobs.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)


def job_count(spark) -> int:
    store = spark._jsc.sc().statusStore()
    return store.jobsList(None).size()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    load_all_operators()
    spark = get_session("probe_r14_ccobs")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"launch loadavg {os.getloadavg()[0]:.2f}", flush=True)

    from open_reaction_database_web_scraper_spark.operators import dedup

    # The OLD form, reconstructed: collect()-based convergence sum.
    # Kept verbatim from the pre-change connected_components so the
    # A/B legs differ ONLY in how the sum is computed.
    def cc_old(edges, max_iter=20):
        def _ckpt(df):
            return df.localCheckpoint(eager=True)
        sym = edges.select(F.col("src").cast("long").alias("src"),
                           F.col("dst").cast("long").alias("dst"))
        sym = sym.unionByName(sym.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst"))).cache()
        labels = _ckpt(sym.select(F.col("src").alias("doc_id")).distinct()
                       .withColumn("label", F.col("doc_id")))
        prev_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        for _ in range(1, max_iter + 1):
            neigh = (sym.join(labels, sym.src == labels.doc_id)
                     .groupBy(F.col("dst").alias("doc_id"))
                     .agg(F.min("label").alias("neigh_label")))
            labels = _ckpt(labels.join(neigh, "doc_id", "left")
                           .select("doc_id",
                                   F.least("label",
                                           F.coalesce("neigh_label",
                                                      "label"))
                                   .alias("label")))
            cur_sum = labels.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError("no convergence")
        sym.unpersist()
        return labels

    for qname in ("dedup_clusters", "dedup_clusters_neardup"):
        fn = REGISTRY[qname].fn
        legs: dict[str, tuple[list[float], list[int]]] = {
            "obs(new)": ([], []), "collect(old)": ([], [])}
        orig_cc = dedup.connected_components
        for rep in range(reps + 1):  # rep 0 = warm both, discarded
            for leg, cc_impl in (("obs(new)", orig_cc),
                                 ("collect(old)", cc_old)):
                dedup.connected_components = cc_impl
                j0 = job_count(spark)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                dj = job_count(spark) - j0
                spark.catalog.clearCache()
                if rep:
                    legs[leg][0].append(dt)
                    legs[leg][1].append(dj)
        dedup.connected_components = orig_cc
        for leg, (ts, js) in legs.items():
            ts.sort()
            print(f"{qname:24s} {leg:13s} med {ts[len(ts)//2]:6.3f} "
                  f"min {ts[0]:6.3f} max {ts[-1]:6.3f} "
                  f"jobs/run {sorted(js)[len(js)//2]}", flush=True)

        # output identity, old vs new CC
        dedup.connected_components = cc_old
        old_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        dedup.connected_components = orig_cc
        new_rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert old_rows == new_rows, f"{qname}: outputs differ!"
        print(f"{qname}: outputs identical ({len(new_rows)} rows)",
              flush=True)


if __name__ == "__main__":
    main()
