"""Round-14 plan captures (VERDICT r13 #3 and this round's touched
queries): dump `.explain("formatted")` for the queries this round
examines, BOTH the pre-execution plan (isFinalPlan=false) and — for
the iterative graph family — the EXECUTED plan (isFinalPlan=true),
which is the only artifact that can show AQE's runtime exchange
reuse (the round-13 claim that was timing-only).

Usage: python scripts/capture_plans_r14.py [sf_dir] [name...]
Writes plans/r14/<name>_{before,after,final}.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r14")


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def capture(spark, sf_dir: str, name: str, suffix: str,
            execute: bool = False) -> None:
    df = REGISTRY[name].fn(spark, sf_dir)
    if execute:
        # materialize THIS DataFrame's QueryExecution so the adaptive
        # plan finalizes (isFinalPlan=true) — collect, not a noop
        # write, because a write wraps a NEW QueryExecution whose
        # finalization the df handle cannot see
        df.collect()
    txt = formatted(df)
    path = os.path.join(OUT, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    n_ex = txt.count("Exchange")
    n_reuse = txt.count("ReusedExchange") + txt.count("(reused)")
    n_scan = txt.count("Scan parquet")
    print(f"{path}: exchanges~{n_ex} reused~{n_reuse} scans~{n_scan} "
          f"final={'isFinalPlan=true' in txt}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ["graph_pagerank", "graph_triangle_count",
                             "graph_bfs_levels"]
    os.makedirs(OUT, exist_ok=True)
    load_all_operators()
    spark = get_session("capture_plans_r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        capture(spark, sf_dir, name, "final", execute=True)


if __name__ == "__main__":
    main()
