"""Round-10 scale probe: the FIXPOINT loops at 1x/10x/100x — the one
op family the 100x discipline had never touched (round-9 verdict
missing #3). Plus the post-normalization miner re-run for the
record (the round-10 unit-norm lever cut the exhaustive miner's 10x
decade 13.69s -> 8.67s in the lever commit's decomposition probe;
this script re-measures it in the standard protocol alongside the
celled form).

What the fixpoint probes measure, beyond wall time: the CC round
count (``dedup.LAST_CC_ROUNDS``). Min-label propagation runs
O(diameter) rounds; the salted-copy corpus model grows the corpus
100x while keeping each component's internal structure 1x-like
(cross-copy shingle overlap is zero), so the HYPOTHESIS is rounds
stay ~constant while per-round join/agg volume grows linearly.
A rising round count at scale would mean the corpus-growth model
leaks cross-copy edges (or the chain structure itself scales) —
either way a real finding.

graph_bfs_levels scales via a key-offset lineitem/supplier jitter:
N disjoint copies of the part-supplier graph (diameter constant by
construction), seeds fixed in copy 0 — the "blast radius in a 100x
graph" shape where the edge side of every expand join grows 100x
but the reachable set does not.

Probe hygiene (round-9 rule): every timed cell runs under a wall
BUDGET (default 900 s) enforced by job cancellation; a budget kill
is recorded as a DNF cell with the budget, not an absent number.

Usage: python scripts/scaleup_r10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.operators import dedup  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from scripts.probe_common import (  # noqa: E402
    build_salted_docs,
    build_suffixed_docs,
    time_op,
)
from scripts.scaleup_r9 import build_emb_jitter  # noqa: E402

BUDGET_S = float(os.environ.get("SPARK_GRAFT_PROBE_BUDGET_S", "900"))

CC_OPS = ("dedup_clusters", "dedup_clusters_neardup")
EMB_OPS = (("sample_hard_negative_mine", 2),   # 100x DNF on record (r9)
           ("sample_hard_negative_mine_ann", 3))


def time_op_budgeted(spark, name: str, sf_dir: str):
    """time_op under a wall budget: a timer cancels all jobs at
    BUDGET_S and the cell records a DNF instead of hanging the
    probe (round-9 probe-hygiene rule: a recorded DNF with its
    budget is a legitimate data point)."""
    sc = spark.sparkContext
    fired = threading.Event()

    def _kill():
        fired.set()
        sc.cancelAllJobs()

    timer = threading.Timer(BUDGET_S, _kill)
    timer.start()
    try:
        t = time_op(spark, name, sf_dir)
        return round(t, 2), None
    except RuntimeError as exc:
        if "did not converge" in str(exc):
            # the fixpoint's loud-failure contract firing IS a probe
            # result (diameter exceeded the round budget) — record it
            return None, "non_converged (>20 rounds, raised loudly)"
        if fired.is_set():
            # a budget cancellation can surface as RuntimeError too
            # (round-10 advice): the DNF branch must catch it here,
            # not crash the probe
            return None, f"DNF (budget {BUDGET_S:.0f}s)"
        raise
    except Exception as exc:  # noqa: BLE001 — cancelled jobs surface here
        if fired.is_set():
            return None, f"DNF (budget {BUDGET_S:.0f}s)"
        raise exc
    finally:
        timer.cancel()


def build_graph_jitter(spark, sf_dir: str, copies: int, out: str) -> None:
    """N disjoint key-offset copies of the part-supplier graph:
    lineitem's (l_partkey, l_suppkey) pairs replicated with per-copy
    key offsets (diameter constant by construction), supplier copied
    the same way so the fixed seed set (s_suppkey <= 2) exists only
    in copy 0. Only the two columns the graph ops read are written
    (plus the seed filter column) — the probe scales the GRAPH, not
    the fact table's payload bytes."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pmax = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    smax = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    li = (li.withColumn("copy", F.explode(
              F.sequence(F.lit(0), F.lit(copies - 1))))
          .select((F.col("l_partkey") + F.col("copy") * pmax)
                  .alias("l_partkey"),
                  (F.col("l_suppkey") + F.col("copy") * smax)
                  .alias("l_suppkey")))
    li.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/lineitem.parquet")
    sup = (load(spark, sf_dir, "supplier").select("s_suppkey")
           .withColumn("copy", F.explode(
               F.sequence(F.lit(0), F.lit(copies - 1))))
           .select((F.col("s_suppkey") + F.col("copy") * smax)
                   .alias("s_suppkey")))
    sup.repartition(4).write.mode("overwrite") \
        .parquet(f"{out}/supplier.parquet")
    n = spark.read.parquet(f"{out}/lineitem.parquet").count()
    print(f"  graph: {copies}x at {n} lineitem pair rows", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r10")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict = {}

    def record(name, cells, extra=None):
        rec = dict(cells)
        # ratios from NAMED cells, not a compacted list (round-10
        # advice): if an earlier decade DNFs, compaction would
        # mislabel e.g. 100x/1x as ratio_10_to_100
        t1, t10, t100 = (rec.get(k) for k in ("1x", "10x", "100x"))
        num = lambda v: isinstance(v, (int, float))  # noqa: E731
        if num(t1) and num(t10):
            rec["ratio_1_to_10"] = round(t10 / t1, 1)
        if num(t10) and num(t100):
            rec["ratio_10_to_100"] = round(t100 / t10, 1)
        if extra:
            rec.update(extra)
        summary[name] = rec
        print(f"{name}: " + " ".join(
            f"{k}={v}" for k, v in rec.items()), flush=True)

    # --- CC fixpoints, TWO corpus-growth models head-to-head:
    # the suffix (token-bijection) model preserves each copy's
    # within-copy structure exactly (diameter constant by
    # construction — the hypothesis under test is rounds ~constant,
    # per-round volume ~linear); the salt-interleave model is ALSO
    # probed because running it is what EXPOSED its densification
    # artifact (it halves effective shingle width inside each copy
    # -> pair-graph diameter inflates past the 20-round budget and
    # the loop fails loudly, as designed) — both results are data.
    s10 = tempfile.mkdtemp(prefix="ordspark_r10_s10_")
    s100 = tempfile.mkdtemp(prefix="ordspark_r10_s100_")
    build_suffixed_docs(spark, sf_dir, 10, s10)
    build_suffixed_docs(spark, sf_dir, 100, s100)
    for name in CC_OPS:
        cells, rounds = {}, {}
        for key, d in (("1x", sf_dir), ("10x", s10), ("100x", s100)):
            t, dnf = time_op_budgeted(spark, name, d)
            cells[key] = t if t is not None else dnf
            rounds[key] = dedup.LAST_CC_ROUNDS
        record(name, cells, {"cc_rounds": rounds,
                             "corpus_model": "token-bijection suffix"})
    d10 = tempfile.mkdtemp(prefix="ordspark_r10_d10_")
    build_salted_docs(spark, sf_dir, 10, d10)
    for name in CC_OPS:
        t, dnf = time_op_budgeted(spark, name, d10)
        record(name + "__salt_interleave_10x",
               {"10x": t if t is not None else dnf},
               {"cc_rounds": {"10x": dedup.LAST_CC_ROUNDS},
                "corpus_model": "salt-interleave (densifying)"})

    # --- BFS over the key-offset graph jitter
    g10 = tempfile.mkdtemp(prefix="ordspark_r10_g10_")
    g100 = tempfile.mkdtemp(prefix="ordspark_r10_g100_")
    build_graph_jitter(spark, sf_dir, 10, g10)
    build_graph_jitter(spark, sf_dir, 100, g100)
    cells = {}
    for key, d in (("1x", sf_dir), ("10x", g10), ("100x", g100)):
        t, dnf = time_op_budgeted(spark, "graph_bfs_levels", d)
        cells[key] = t if t is not None else dnf
    record("graph_bfs_levels", cells)

    # --- miner family re-run post unit-normalization (round-10 lever)
    e10 = tempfile.mkdtemp(prefix="ordspark_r10_e10_")
    e100 = tempfile.mkdtemp(prefix="ordspark_r10_e100_")
    build_emb_jitter(spark, sf_dir, 10, e10)
    build_emb_jitter(spark, sf_dir, 100, e100)
    for name, decades in EMB_OPS:
        cells = {}
        for key, d in (("1x", sf_dir), ("10x", e10),
                       ("100x", e100))[:decades]:
            t, dnf = time_op_budgeted(spark, name, d)
            cells[key] = t if t is not None else dnf
        if decades == 2:
            cells["100x"] = "not run (r9 recorded DNF >75min; " \
                            "quadratic by spec)"
        record(name, cells)

    summary["loadavg_1m"] = round(os.getloadavg()[0], 2)
    summary["budget_s"] = BUDGET_S
    print("SCALEUP_R10_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
