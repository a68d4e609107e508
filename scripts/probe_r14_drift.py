"""Round-14 session-2 probe: isolated re-measures of the bench cells
whose round-over-round drift exceeded the host-tenancy envelope.

The round-14 promoted idle capture's median drift vs the round-13
capture is 1.25x (cpu_steal-explained host slowdown). Eight cells
moved >=1.53x — above the envelope. None of their code changed this
round except graph_triangle_count (regime-adaptive branch, whose
sf0.1 branch is the OLD two-probe form). This probe re-measures each
isolated on an idle box (warm rep + 5 timed noop-sink reps, caches
dropped between) so "in-run tenancy burst" vs "code regression" is a
measurement, not an inference.

Usage: python scripts/probe_r14_drift.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)
from open_reaction_database_web_scraper_spark.testing import (  # noqa: E402
    drop_drained_memory_sinks)

QUERIES = [
    "sample_hard_negative_mine_ann",   # x2.01 vs r13 capture
    "export_jsonl_sharded",            # x1.96
    "graph_triangle_count",            # x1.96
    "pack_sequences",                  # x1.91
    "quality_gate_reasons",            # x1.91
    "vector_pca_gram",                 # x1.82
    "text_ngram_novelty",              # x1.77
    "sample_weighted_bernoulli",       # x1.74
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("probe_r14_drift")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"launch loadavg {os.getloadavg()[0]:.2f}", flush=True)
    for name in QUERIES:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"probe drift: {name}")
        samples = []
        for rep in range(6):  # rep 0 = warm-up, discarded
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            drop_drained_memory_sinks(spark)
            if rep:
                samples.append(dt)
        samples.sort()
        med = samples[len(samples) // 2]
        print(f"{name:34s} med {med:6.3f}  min {samples[0]:6.3f}  "
              f"max {samples[-1]:6.3f}", flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
