"""Round-14 probe (VERDICT r13 #4): stream_dedup_salted's state-store
cost. The round-13 drain ladder attributed +2–3 s of the stateful
dedup's wall time to seen-array state (de)serialization + commit.
Candidate: a FIXED-WIDTH state encoding — the seen set packed as a
sorted little-endian int64 byte blob (``seen binary``) instead of
``seen array<bigint>`` — cutting the per-group Arrow list<int64>
materialization and per-element Python conversions on both load and
commit.

Interleaved same-session A/B over the production salted drain
(salt_shards=8, the #1 bench query), plus per-batch stateOperators
metrics (allUpdatesTimeMs, commitTimeMs, stateMemory) from
StreamingQueryProgress so the state-commit claim is checked against
the operator's own counters, not just wall clock.

Usage: python scripts/probe_r14_state.py [sf_dir] [reps]

NOTE: the winning binary encoding LANDED in dedup_ttl_updates after
this probe ran (round 14), so a re-run now compares binary against
binary — the recorded A/B (array med 14.300 / commit 31 575 ms vs
binary med 13.125 / commit 17 815 ms, rows identical) was taken with
the production fn still on the array encoding.
"""
from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)
from open_reaction_database_web_scraper_spark.streaming import (  # noqa: E402
    jobs)
from open_reaction_database_web_scraper_spark.testing import (  # noqa: E402
    drop_drained_memory_sinks)

SALT = 8


def binary_state_updates(stream, ttl_ms: int = 3_600_000):
    """dedup_ttl_updates with the seen set packed as sorted int64
    bytes — logic otherwise line-identical to the production fn."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                "user_id": pd.array([], dtype="int64"),
                                "t_us": pd.array([], dtype="int64"),
                                "value": pd.array([], dtype="float64")})
            return
        (blob,) = state.get if state.exists else (None,)
        seen = set(np.frombuffer(bytes(blob), dtype="<i8").tolist()) \
            if blob else set()
        out_eid, out_us, out_val = [], [], []
        last_us = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf["ts"]
            if getattr(ts.dtype, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            us = ts.astype("datetime64[us]").astype("int64")
            for eid, t_us, val in zip(pdf["event_id"], us, pdf["value"]):
                last_us = max(last_us, int(t_us))
                if int(eid) in seen:
                    continue
                seen.add(int(eid))
                out_eid.append(int(eid))
                out_us.append(int(t_us))
                out_val.append(val)
        state.update(
            (np.array(sorted(seen), dtype="<i8").tobytes(),))
        state.setTimeoutTimestamp(
            max(last_us // 1000 + ttl_ms,
                state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({
            "event_id": pd.array(out_eid, dtype="int64"),
            "user_id": pd.array([key[0]] * len(out_eid), dtype="int64"),
            "t_us": pd.array(out_us, dtype="int64"),
            "value": pd.array(out_val, dtype="float64")})

    grouped = (stream.withColumn(
        "_salt", F.pmod(F.col("event_id"), F.lit(SALT)).cast("int"))
        .groupBy("user_id", "_salt"))
    return grouped.applyInPandasWithState(
        update,
        outputStructType="event_id bigint, user_id bigint, "
                         "t_us bigint, value double",
        stateStructType="seen binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)


def drain_with_metrics(spark, updates):
    name = "s" + uuid.uuid4().hex[:12]
    q = (updates.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table(name).count()
    commit = updates_ms = mem = 0
    for p in q.recentProgress:
        for op in p.get("stateOperators", []):
            commit += op.get("commitTimeMs", 0)
            updates_ms += op.get("allUpdatesTimeMs", 0)
            mem = max(mem, op.get("memoryUsedBytes", 0))
    return rows, {"commitTimeMs": commit, "allUpdatesTimeMs": updates_ms,
                  "stateMemoryMax": mem}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("probe_r14_state")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    src = jobs._chunked_events_dir(spark, sf_dir, copies=2)

    def stream():
        return (jobs._events_stream(spark, src, cast_ltz=True)
                .withWatermark("ts", "10 minutes"))

    def run_array():
        return drain_with_metrics(
            spark, jobs.dedup_ttl_updates(stream(), None,
                                          salt_shards=SALT))

    def run_binary():
        return drain_with_metrics(spark, binary_state_updates(stream()))

    # warm both, check row identity
    ra, _ = run_array()
    drop_drained_memory_sinks(spark)
    rb, _ = run_binary()
    drop_drained_memory_sinks(spark)
    print(f"rows array={ra} binary={rb} identical={ra == rb}", flush=True)

    res = {"array": [], "binary": []}
    met = {"array": [], "binary": []}
    for _ in range(reps):
        for label, fn in (("array", run_array), ("binary", run_binary)):
            t0 = time.perf_counter()
            _, m = fn()
            res[label].append(time.perf_counter() - t0)
            met[label].append(m)
            drop_drained_memory_sinks(spark)
    for label in ("array", "binary"):
        s = sorted(res[label])
        m = met[label][len(met[label]) // 2]
        print(f"{label:7s} med={s[len(s)//2]:7.3f} min={s[0]:7.3f} "
              f"max={s[-1]:7.3f}  {m}", flush=True)


if __name__ == "__main__":
    main()
