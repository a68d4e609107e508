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

import json
import sys
import tempfile

sys.path.insert(0, ".")

from open_reaction_database_web_scraper_spark.operators import dedup  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from probe_common import (  # noqa: E402
    build_salted_docs, build_skewed_events)
from probe_common import (  # noqa: E402
    time_call_budgeted as _time_call_budgeted)

BUDGET_S = 900.0


def time_call_budgeted(spark, fn):
    # shared harness (probe_common) at this script's budget; see the
    # round-13 consolidation note there
    return _time_call_budgeted(spark, fn, budget_s=BUDGET_S)


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
