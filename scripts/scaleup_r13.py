"""Round-13 probes (VERDICT r12 next-round #1 and #5):

1. ADAPTIVE DEDUP A/B — the "done" criterion for salting-as-policy:
   same-session wall time of stream_dedup_adaptive vs the two fixed
   forms on BOTH regimes.
   - uniform keys (plain sf0.1 events): adaptive must stay within
     ~1.1x of the unsalted job (its only extra work is the plan-time
     histogram scan; the detector finds no hot user so the stream
     itself IS the unsalted plan);
   - 16x planted skew (90% one user, the round-12 corpus model):
     adaptive must recover >= 1.5x vs the unsalted job (round-12
     measured 70.7 s salted vs 126.9 s unsalted at this cell) and
     its detector must record the salt decision.

2. EWMA HOT-KEY CAPACITY at 64x — the stated O(taps)-per-row
   linearity under skew extended one decade past the round-12 probe
   (35.1 s at 16x): the 64x cell recorded in SCALING.md makes the
   "no superlinear knee" claim a number at the next decade.

Timing harness and the skewed-corpus builder are shared with
scaleup_r12.py via probe_common (the cells are required to be
comparable, so the corpus model has exactly one home).

Usage: python scripts/scaleup_r13.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from probe_common import (  # noqa: E402
    build_skewed_events, time_call_budgeted)

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from open_reaction_database_web_scraper_spark.streaming import jobs  # noqa: E402


def _run(spark, name, d):
    return (REGISTRY[name].fn(spark, d)
            .write.format("noop").mode("overwrite").save())


def _ratio(cell: dict, num: str, den: str) -> object:
    """num/den when both cells timed out clean; otherwise carry the
    DNF/error string forward instead of raising TypeError and losing
    the whole probe session's summary."""
    a, b = cell.get(num), cell.get(den)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and b:
        return round(a / b, 3)
    return f"n/a ({num}={a!r}, {den}={b!r})"


def probe_adaptive_ab(spark, sf_dir: str, summary: dict) -> None:
    cells: dict[str, dict] = {}
    # uniform regime: the driver's own sf0.1 events, untouched
    cell: dict = {}
    for name in ("stream_dedup_ttl", "stream_dedup_adaptive",
                 "stream_dedup_salted"):
        t, dnf, _ = time_call_budgeted(
            spark, lambda n=name: _run(spark, n, sf_dir))
        cell[name] = t if t is not None else dnf
        if name == "stream_dedup_adaptive":
            cell["decision"] = dict(jobs.LAST_DEDUP_SALT_DECISION)
    cell["adaptive_over_unsalted"] = _ratio(
        cell, "stream_dedup_adaptive", "stream_dedup_ttl")
    cells["uniform_sf0.1"] = cell
    print(f"adaptive A/B uniform: {json.dumps(cell)}", flush=True)

    # skewed regime: the round-12 16x cell's corpus model
    d = tempfile.mkdtemp(prefix="ordspark_r13_skew16x_")
    n = build_skewed_events(spark, sf_dir, 16, d)
    cell = {"rows": n}
    for name in ("stream_dedup_ttl", "stream_dedup_adaptive",
                 "stream_dedup_salted"):
        t, dnf, _ = time_call_budgeted(
            spark, lambda n_=name: _run(spark, n_, d))
        cell[name] = t if t is not None else dnf
        if name == "stream_dedup_adaptive":
            cell["decision"] = dict(jobs.LAST_DEDUP_SALT_DECISION)
    cell["unsalted_over_adaptive"] = _ratio(
        cell, "stream_dedup_ttl", "stream_dedup_adaptive")
    cells["skew16x"] = cell
    print(f"adaptive A/B 16x skew: {json.dumps(cell)}", flush=True)
    summary["adaptive_dedup_ab"] = cells


def probe_ewma_64x(spark, sf_dir: str, summary: dict) -> None:
    d = tempfile.mkdtemp(prefix="ordspark_r13_skew64x_")
    n = build_skewed_events(spark, sf_dir, 64, d)
    t, dnf, _ = time_call_budgeted(
        spark, lambda: _run(spark, "stream_ewma_stateful", d))
    cell = {"rows": n,
            "stream_ewma_stateful": t if t is not None else dnf}
    print(f"ewma 64x skew: {json.dumps(cell)}", flush=True)
    summary["ewma_hot_key_64x"] = cell


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("scaleup_r13")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict[str, dict] = {}
    probe_adaptive_ab(spark, sf_dir, summary)
    probe_ewma_64x(spark, sf_dir, summary)
    print(json.dumps({"r13_probe": summary}), flush=True)


if __name__ == "__main__":
    main()
