"""Round-13 probe #2: decompose the stateful-stream drain cost.

Ladder of drains over the SAME 4-chunk replay source (copies=2, the
dedup family's source):
  A. built-in groupBy count (update mode)      -> orchestration + shuffle floor
  B. applyInPandasWithState, stateless trivial -> + per-group Python call cost
  C. applyInPandasWithState, seen-set state,
     trivial compute                           -> + state (de)serialization
  D. the production dedup_ttl update           -> + the row loop
  E. vectorized dedup update (candidate)       -> what the rewrite would buy

Usage: python scripts/probe_r13_drain.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)
from open_reaction_database_web_scraper_spark.streaming import (  # noqa: E402
    jobs)


def t(label, fn, n=3, spark=None):
    from open_reaction_database_web_scraper_spark.testing import (
        drop_drained_memory_sinks)
    fn()  # warm
    if spark is not None:
        drop_drained_memory_sinks(spark)
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
        if spark is not None:
            drop_drained_memory_sinks(spark)
    samples.sort()
    print(f"{label:44s} med={samples[len(samples)//2]:7.3f}  "
          f"min={samples[0]:7.3f} max={samples[-1]:7.3f}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("probe_r13_drain")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    src = jobs._chunked_events_dir(spark, sf_dir, copies=2)

    def stream():
        return (jobs._events_stream(spark, src, cast_ltz=True)
                .withWatermark("ts", "10 minutes"))

    def drain_a():
        agg = stream().groupBy("user_id").agg(F.count("*").alias("n"))
        jobs._run_to_memory(agg, "update")

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def drain_apws(update, state_type):
        out = stream().groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n bigint",
            stateStructType=state_type,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
        jobs._run_to_memory(out, "update")

    def upd_b(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    def upd_c(key, pdfs, state: GroupState):
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            seen.extend(int(x) for x in pdf["event_id"].iloc[:8])
        state.update((seen,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    def upd_c_full(key, pdfs, state: GroupState):
        # full-size state: every id, like the production dedup
        (seen,) = state.get if state.exists else ([],)
        seen = list(seen)
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            seen.extend(int(x) for x in pdf["event_id"])
        state.update((seen,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    def drain_d():
        ev = spark.sparkContext.accumulator(0)
        jobs._run_to_memory(
            jobs.dedup_ttl_updates(stream(), ev), "append")

    t("A  builtin count (orchestration floor)", drain_a, spark=spark)
    t("B  apws stateless trivial", lambda: drain_apws(upd_b, "n bigint"), spark=spark)
    t("C  apws tiny state", lambda: drain_apws(upd_c, "seen array<bigint>"), spark=spark)
    t("C2 apws full-size seen state",
      lambda: drain_apws(upd_c_full, "seen array<bigint>"), spark=spark)
    t("D  production dedup_ttl_updates", drain_d, spark=spark)


if __name__ == "__main__":
    main()
