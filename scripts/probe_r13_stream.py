"""Round-13 optimization probe: where do the stateful streaming
jobs spend their wall time?  Splits each job into its measurable
components — chunk-dir materialization, hot-key detection (adaptive
only), and the stream drain itself — so the optimization targets the
component that actually dominates (guide §1: measure first).

Usage: python scripts/probe_r13_stream.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)
from open_reaction_database_web_scraper_spark.streaming import (  # noqa: E402
    jobs)
from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402


def t(label, fn, n=3, spark=None):
    # Drop drained memory-sink views between reps (ADVICE r13 #3):
    # without this the FULL-job loop times later jobs against a
    # driver heap pinning every earlier drain's rows — the exact
    # bias the round-13 bench fix removed; probe_r13_drain.py
    # already did the same cleanup.
    from open_reaction_database_web_scraper_spark.testing import (
        drop_drained_memory_sinks)
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
    load_all_operators()
    spark = get_session("probe_r13_stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    # warm each component once
    jobs._chunked_events_dir(spark, sf_dir, copies=2)
    t("chunk_dir copies=2 (dedup family)",
      lambda: jobs._chunked_events_dir(spark, sf_dir, copies=2),
      spark=spark)
    t("chunk_dir copies=1 (ewma/funnel/cdc)",
      lambda: jobs._chunked_events_dir(spark, sf_dir), spark=spark)
    ev = load(spark, sf_dir, "events")
    jobs.dedup_hot_users(ev)
    t("dedup_hot_users (adaptive detector)",
      lambda: jobs.dedup_hot_users(load(spark, sf_dir, "events")))

    # full jobs for reference (same noop methodology as bench)
    for name in ("stream_dedup_ttl", "stream_dedup_salted",
                 "stream_dedup_adaptive", "stream_ewma_stateful",
                 "stream_cdc_apply", "stream_funnel_stateful",
                 "stream_custom_stateful"):
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t(f"FULL {name}",
          lambda fn=fn: fn(spark, sf_dir)
          .write.format("noop").mode("overwrite").save(), spark=spark)


if __name__ == "__main__":
    main()
