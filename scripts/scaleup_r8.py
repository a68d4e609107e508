"""Round-8 scale probe: the two heaviest UN-PROBED text-family ops —
text_boilerplate_strip and dedup_subdoc_blocks — at 1x/10x/100x,
default confs. Both share the 8-byte-hash counting-shuffle shape the
round-7 simhash probe stress-tested, and both currently feed their
doc_id-keyed aggregates from a round-robin fanout — the exact
partial-agg-state pattern that OOMed simhash's vote at 100x. This
probe measures whether that matters here (the block/chunk streams
group mostly on the HASH, where round-robin is harmless; only the
per-doc reassembly/count groups on doc_id).

Corpus construction matches scaleup_r7: per-copy salt tokens
interleaved, so cross-copy block overlap is 0 and true shared-block
structure stays 1x-like within each copy.

Usage: python scripts/scaleup_r8.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from scripts.probe_common import build_salted_docs, time_op  # noqa: E402

OPS = ("text_boilerplate_strip", "dedup_subdoc_blocks")



def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r8")
    spark.sparkContext.setLogLevel("ERROR")

    big10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8_10x_")
    big100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8_100x_")
    print("building 10x ...", flush=True)
    build_salted_docs(spark, sf_dir, 10, big10)
    print("building 100x ...", flush=True)
    build_salted_docs(spark, sf_dir, 100, big100)

    summary: dict = {}
    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big10)
        t100 = time_op(spark, name, big100)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
              f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x",
              flush=True)
        summary[name] = {
            "1x": round(t1, 2), "10x": round(t10, 2), "100x": round(t100, 2),
            "ratio_1_to_10": round(t10 / t1, 1),
            "ratio_10_to_100": round(t100 / t10, 1)}
    summary["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print("SCALEUP_R8_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
