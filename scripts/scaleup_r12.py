"""Round-12 probes (VERDICT r11 next-round #2, #6, #7b):

1. HOT_CAP RECALL, measured: the densifying-corpus 10x cell is the
   largest where the LOSSLESS (cap=None) minhash pair set completes,
   so it is where "loud, recall-losing" can become "loud, MEASURED".
   The cap only ever REMOVES candidate buckets, so the capped output
   is a subset of the lossless output and recall = n_cap/n_lossless.
   Recorded per cap alongside the excluded-bucket counts; SCALING.md
   carries the numbers and tests/test_round12.py pins a floor at
   test scale (same corpus model, one decade down) like
   vector_ann_lsh's recall-floor test.

2. EXHAUSTIVE vs ANN hard-negative miner at the sf1 decade, both
   budgeted: the sweep's budget_capped exclusion of the quadratic-by-
   spec exhaustive miner should carry its own measured cost next to
   the ANN form's, so "use the ANN form at scale" is a number, not
   advice.

3. STATEFUL-STREAM KEY SKEW: every applyInPandasWithState job keys
   state by user_id; one pathological hot user serializes into a
   single task whose per-batch pandas frame grows with the skew.
   Planted 90%-one-user corpora at 1x/4x/16x the sf0.1 event count
   through stream_ewma_stateful and stream_dedup_ttl, wall time
   recorded → the knee (and the documented posture) in SCALING.md.

Usage: python scripts/scaleup_r12.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import datetime as dt
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
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from probe_common import build_salted_docs  # noqa: E402

BUDGET_S = 900.0


def time_call_budgeted(spark, fn):
    sc = spark.sparkContext
    fired = threading.Event()

    def _kill():
        fired.set()
        sc.cancelAllJobs()

    timer = threading.Timer(BUDGET_S, _kill)
    timer.start()
    try:
        t0 = time.perf_counter()
        out = fn()
        return round(time.perf_counter() - t0, 2), None, out
    except Exception as e:
        if fired.is_set():
            return None, f"DNF>{BUDGET_S:.0f}s (budget kill)", None
        return None, f"error: {type(e).__name__}: {e}", None
    finally:
        timer.cancel()
        spark.catalog.clearCache()


def probe_hot_cap_recall(spark, sf_dir: str, summary: dict) -> None:
    d10 = tempfile.mkdtemp(prefix="ordspark_r12_recall10x_")
    build_salted_docs(spark, sf_dir, 10, d10)
    counts: dict[str, dict] = {}
    def count_pairs(cap):
        pairs, members = dedup.minhash_pairs(spark, d10, hot_cap=cap)
        try:
            return pairs.count()
        finally:
            members.unpersist()

    for label, cap in (("lossless", None), ("cap=64", 64), ("cap=8", 8)):
        t, dnf, n = time_call_budgeted(
            spark, lambda cap=cap: count_pairs(cap))
        counts[label] = {
            "pairs": n, "sec": t if t is not None else dnf,
            "hot_buckets_excluded": dedup.LAST_LSH_HOT_BUCKETS}
        print(f"recall probe {label}: {json.dumps(counts[label])}",
              flush=True)
    base = counts["lossless"]["pairs"]
    for label in ("cap=64", "cap=8"):
        if base and counts[label]["pairs"] is not None:
            counts[label]["pair_recall"] = round(
                counts[label]["pairs"] / base, 4)
    summary["hot_cap_recall_10x"] = {
        **counts, "corpus_model": "salt-interleave (densifying) 10x"}
    print("hot_cap_recall_10x:",
          json.dumps(summary["hot_cap_recall_10x"]), flush=True)


def probe_miners_sf1(spark, summary: dict) -> None:
    sf1 = "/tmp/ordspark_sf1"
    import os
    if not os.path.isdir(sf1):
        print("skip miners: no /tmp/ordspark_sf1 (run make_sf1 first)",
              flush=True)
        return
    cells = {}
    for name in ("sample_hard_negative_mine_ann",
                 "sample_hard_negative_mine"):
        t, dnf, n = time_call_budgeted(
            spark, lambda name=name: REGISTRY[name].fn(spark, sf1)
            .write.format("noop").mode("overwrite").save())
        cells[name] = {"sec": t if t is not None else dnf}
        print(f"miner {name}@sf1: {json.dumps(cells[name])}", flush=True)
    summary["hard_negative_miners_sf1"] = cells


def build_skewed_events(spark, sf_dir: str, mult: int, out: str) -> int:
    """events x mult with 90% of rows reassigned to ONE user — the
    hot-key regime that serializes a keyed-state stream into a
    single task. Timestamps/event_ids are re-spread so the replay
    chunks stay balanced in TIME (the skew is purely in the key)."""
    ev = load(spark, sf_dir, "events")
    base = ev.agg(F.max("event_id")).collect()[0][0] + 1
    grown = (ev.withColumn("copy", F.explode(
                 F.sequence(F.lit(0), F.lit(mult - 1))))
             .withColumn("event_id",
                         F.col("event_id") + F.col("copy") * base)
             .drop("copy"))
    skewed = grown.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), F.lit(10)) < 9, F.lit(777))
        .otherwise(F.col("user_id")))
    skewed.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/events.parquet")
    n = spark.read.parquet(f"{out}/events.parquet").count()
    print(f"  skewed events: {mult}x at {n} rows (90% user 777)",
          flush=True)
    return n


def probe_stream_skew(spark, sf_dir: str, summary: dict) -> None:
    cells: dict[str, dict] = {}
    for mult in (1, 4, 16):
        d = tempfile.mkdtemp(prefix=f"ordspark_r12_skew{mult}x_")
        n = build_skewed_events(spark, sf_dir, mult, d)
        cell: dict = {"rows": n}
        for name in ("stream_ewma_stateful", "stream_dedup_ttl",
                     "stream_dedup_salted"):
            t, dnf, _ = time_call_budgeted(
                spark, lambda name=name, d=d: REGISTRY[name]
                .fn(spark, d).write.format("noop")
                .mode("overwrite").save())
            cell[name] = t if t is not None else dnf
        cells[f"{mult}x"] = cell
        print(f"stream skew {mult}x: {json.dumps(cell)}", flush=True)
    summary["stream_hot_key_skew"] = {
        **cells, "corpus_model": "events x mult, 90% one user"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r12")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict[str, dict] = {}
    probe_hot_cap_recall(spark, sf_dir, summary)
    probe_miners_sf1(spark, summary)
    probe_stream_skew(spark, sf_dir, summary)
    print(json.dumps({"r12_probe": summary}), flush=True)


if __name__ == "__main__":
    main()
