"""Round-10b probe: decades for the queries ADDED in round 10, so
their scale claims are measured in the round they land (the probe
discipline rounds 6-10 applied to everything else).

- embedding_binarize_hamming / vector_matryoshka_truncate: fixed
  16-probe set against a growing corpus (jittered embeddings) —
  claim is LINEAR pair work (O(16·N) signature compares / dot folds)
  on top of a linear binarize/normalize pass.
- text_gopher_quality_rules: pure per-row HOF arithmetic — claim is
  a linear map stage with no shuffle (token-bijection corpus so
  per-copy token counts match 1x).
- graph_degree_topk: hash agg + TakeOrderedAndProject over the
  key-offset graph jitter — claim is linear in the edge count.
- curation_cluster_representative: composes dedup_clusters (probed
  in scaleup_r10 — 2 CC rounds at every decade) + one window; probed
  here end-to-end on the same suffix corpus.

Budget rule and corpus models are scaleup_r10's.

Usage: python scripts/scaleup_r10b.py [sf_dir]
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
from scripts.probe_common import build_suffixed_docs  # noqa: E402
from scripts.scaleup_r9 import build_emb_jitter  # noqa: E402
from scripts.scaleup_r10 import (  # noqa: E402
    build_graph_jitter,
    time_op_budgeted,
)

EMB_OPS = ("embedding_binarize_hamming", "vector_matryoshka_truncate")
DOC_OPS = ("text_gopher_quality_rules", "curation_cluster_representative")
GRAPH_OPS = ("graph_degree_topk",)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r10b")
    spark.sparkContext.setLogLevel("ERROR")
    summary: dict = {}

    def run(names, dirs):
        for name in names:
            cells = {}
            for key, d in dirs:
                t, dnf = time_op_budgeted(spark, name, d)
                cells[key] = t if t is not None else dnf
            ts = [v for v in cells.values() if isinstance(v, float)]
            if len(ts) >= 2:
                cells["ratio_1_to_10"] = round(ts[1] / ts[0], 1)
            if len(ts) >= 3:
                cells["ratio_10_to_100"] = round(ts[2] / ts[1], 1)
            summary[name] = cells
            print(f"{name}: " + " ".join(
                f"{k}={v}" for k, v in cells.items()), flush=True)

    e10 = tempfile.mkdtemp(prefix="ordspark_r10b_e10_")
    e100 = tempfile.mkdtemp(prefix="ordspark_r10b_e100_")
    build_emb_jitter(spark, sf_dir, 10, e10)
    build_emb_jitter(spark, sf_dir, 100, e100)
    run(EMB_OPS, (("1x", sf_dir), ("10x", e10), ("100x", e100)))

    s10 = tempfile.mkdtemp(prefix="ordspark_r10b_s10_")
    s100 = tempfile.mkdtemp(prefix="ordspark_r10b_s100_")
    build_suffixed_docs(spark, sf_dir, 10, s10)
    build_suffixed_docs(spark, sf_dir, 100, s100)
    run(DOC_OPS, (("1x", sf_dir), ("10x", s10), ("100x", s100)))

    g10 = tempfile.mkdtemp(prefix="ordspark_r10b_g10_")
    g100 = tempfile.mkdtemp(prefix="ordspark_r10b_g100_")
    build_graph_jitter(spark, sf_dir, 10, g10)
    build_graph_jitter(spark, sf_dir, 100, g100)
    run(GRAPH_OPS, (("1x", sf_dir), ("10x", g10), ("100x", g100)))

    summary["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print("SCALEUP_R10B_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
