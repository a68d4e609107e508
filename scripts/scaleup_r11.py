"""Round-11 decade probes for the LSH hot-bucket guard (VERDICT r10
next-round #1's "Done" conditions beyond the unit tests):

1. HOT-CLUSTER decades: corpora planting a k-identical boilerplate
   cluster on top of sf0.1's documents, k = 10^4 / 10^5 / 10^6. The
   identical-signature collapse makes the cluster ONE band row and
   the cluster queries consume k-1 star edges, so wall-clock should
   be ~flat in k (pre-guard: k²/2 candidates per band — the 10^6
   cell would be 5×10^11 join rows, i.e. unrunnable).

2. DENSIFYING-CORPUS decades: the salt-interleave growth model that
   blew the CC round budget at 100× in round 10 (many DISTINCT
   signatures in the same band buckets — collapse alone cannot help).
   The hot_cap second line of defense (cap + loud recorded
   exclusions, the sweep's recorded-exclusion discipline) must make
   the 10×/100× cells COMPLETE, with the excluded-bucket count and
   CC round count recorded as data.

Usage: python scripts/scaleup_r11.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.operators import dedup  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from probe_common import build_salted_docs  # noqa: E402

BUDGET_S = 900.0


def time_call_budgeted(spark, fn) -> tuple[float | None, str | None]:
    """Probe-hygiene harness for a CALLABLE (scaleup_r10's
    time_op_budgeted takes a registered name): wall budget with a
    recorded DNF, loud non-convergence recorded as data."""
    sc = spark.sparkContext
    fired = threading.Event()

    def _kill():
        fired.set()
        sc.cancelAllJobs()

    timer = threading.Timer(BUDGET_S, _kill)
    timer.start()
    try:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 2), None
    except RuntimeError as exc:
        if "did not converge" in str(exc):
            return None, "non_converged (>20 rounds, raised loudly)"
        if fired.is_set():
            return None, f"DNF (budget {BUDGET_S:.0f}s)"
        raise
    except Exception:  # noqa: BLE001 — cancelled jobs surface here
        if fired.is_set():
            return None, f"DNF (budget {BUDGET_S:.0f}s)"
        raise
    finally:
        timer.cancel()


def build_hot_cluster_docs(spark, sf_dir: str, k: int, out: str) -> None:
    """sf_dir's documents plus k IDENTICAL boilerplate docs — the
    web-crawl million-fold-boilerplate shape the guard exists for."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dkey = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    boiler = ("breaking news subscribe to our newsletter all rights "
              "reserved terms of service privacy policy contact us")
    hot = (spark.range(k)
           .select((F.col("id") + dkey).alias("doc_id"),
                   F.lit(boiler).alias("text")))
    (docs.unionByName(hot).repartition(32)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    print(f"  hot-cluster corpus: +{k} identical docs", flush=True)


def guarded_neardup_clusters(spark, sf_dir: str,
                             hot_cap: int | None,
                             max_iter: int = 20) -> None:
    """dedup_clusters_neardup's exact shape with the hot_cap and CC
    round-budget knobs exposed (the registered query runs
    hot_cap=None/lossless, max_iter=20)."""
    rep_pairs, members = dedup.minhash_rep_pairs(spark, sf_dir,
                                                 hot_cap=hot_cap)
    edges = (rep_pairs.select(F.col("rep_a").alias("src"),
                              F.col("rep_b").alias("dst"))
             .unionByName(dedup.member_star_edges(members)))
    try:
        labels = dedup.connected_components(edges, max_iter=max_iter)
        labels.write.format("noop").mode("overwrite").save()
    finally:
        members.unpersist()
        spark.catalog.clearCache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r11")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict[str, dict] = {}

    # --- 1. hot-cluster decades (registered query, lossless guard)
    cells, rounds = {}, {}
    for k in (10_000, 100_000, 1_000_000):
        d = tempfile.mkdtemp(prefix=f"ordspark_r11_hot{k}_")
        build_hot_cluster_docs(spark, sf_dir, k, d)
        t, dnf = time_call_budgeted(
            spark, lambda d=d: guarded_neardup_clusters(spark, d, None))
        cells[f"k={k}"] = t if t is not None else dnf
        rounds[f"k={k}"] = dedup.LAST_CC_ROUNDS
    summary["hot_cluster_neardup_clusters"] = {
        **cells, "cc_rounds": rounds,
        "corpus_model": "sf0.1 + k identical boilerplate docs"}
    print("hot_cluster:", json.dumps(summary
          ["hot_cluster_neardup_clusters"]), flush=True)

    # --- 2. densifying corpus under hot_cap (cap + loud exclusions)
    d10 = tempfile.mkdtemp(prefix="ordspark_r11_d10_")
    d100 = tempfile.mkdtemp(prefix="ordspark_r11_d100_")
    build_salted_docs(spark, sf_dir, 10, d10)
    build_salted_docs(spark, sf_dir, 100, d100)
    # cells actually informative (first execution of this probe also
    # ran cap=64/mi=20 at 100x: 20 rounds, loud raise — the cap
    # bounds CANDIDATE VOLUME, not graph diameter, so the densified
    # diameter needs either a raised round budget (26 rounds at
    # cap=64) or a tighter cap that prunes the chain-forming hot
    # buckets themselves (cap=8 converges in 8 rounds under the
    # DEFAULT budget)):
    cases = (
        ("cap=None 10x", d10, None, 20),
        ("cap=64 10x", d10, 64, 20),
        ("cap=64 mi=64 100x", d100, 64, 64),
        ("cap=8 100x", d100, 8, 20),
    )
    for label, d, cap, mi in cases:
        t, dnf = time_call_budgeted(
            spark,
            lambda d=d, cap=cap, mi=mi: guarded_neardup_clusters(
                spark, d, cap, mi))
        summary[f"salt_interleave {label}"] = {
            "sec": t if t is not None else dnf,
            "cc_rounds": dedup.LAST_CC_ROUNDS,
            "hot_buckets_excluded": dedup.LAST_LSH_HOT_BUCKETS,
            "corpus_model": "salt-interleave (densifying)"}
        print(f"salt_interleave {label}:",
              json.dumps(summary[f"salt_interleave {label}"]),
              flush=True)

    print(json.dumps({"r11_probe": summary}), flush=True)


if __name__ == "__main__":
    main()
