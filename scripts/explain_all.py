"""Dump (or red-flag-scan) the physical plan of every registered query.

Usage:
  python scripts/explain_all.py [sf_dir]          # red-flag summary
  python scripts/explain_all.py [sf_dir] NAME...  # full formatted plans

Red flags scanned (the shapes that break at 100 TB):
  - BroadcastNestedLoopJoin / CartesianProduct on non-cross queries
  - BatchEvalPython (row-at-a-time Python) outside the udf_* queries
  - a Window with an empty PartitionBy (single-partition sort)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402

# Queries allowed to carry each flag (deliberate shapes):
# - join_cross_smallk: bounded cartesian is the query's semantics;
# - vector_topk_similarity / vector_ann_ivf: brute-force scoring
#   broadcasts a FIXED tiny side (8 query vectors / 8 centroids) —
#   cost is linear in the corpus, never quadratic;
# - udf_python_scalar / udtf_flatten: the Python escape hatch is the
#   feature under test;
# - text_tfidf: crossJoin(broadcast(n)) of a 1-row aggregate — the
#   scalar-subquery shape; broadcasting one row is always safe.
# - join_salted_skew: same 1-row scalar-subquery shape (the skew
#   threshold aggregate broadcast onto the per-key counts).
ALLOW = {
    "BroadcastNestedLoopJoin": {"join_cross_smallk",
                                "vector_topk_similarity",
                                "vector_ann_ivf",
                                # FIXED 16-probe broadcast against
                                # the corpus on a != condition — the
                                # binary-code compare regime the
                                # query exists to demonstrate
                                # (8-byte XOR/popcount per pair)
                                "embedding_binarize_hamming",
                                # same fixed-16-probe != broadcast,
                                # two dot folds per pair
                                "vector_matryoshka_truncate",
                                # |types|x2 marginal cross-domain:
                                # two 1-to-few broadcast crossJoins
                                # over tiny aggregate tables
                                "stats_chi2_independence",
                                "text_tfidf",
                                "text_lm_perplexity",
                                "join_salted_skew",
                                # 1-row scalar-subquery broadcasts:
                                # user total / corpus token total /
                                # text_tfidf's n_docs (inherited by
                                # the keyword composition)
                                "assoc_pair_lift",
                                "corpus_mix_report",
                                "text_keyword_topk",
                                # 1-row broadcasts again: |V| for the
                                # damping base / the census scalars /
                                # the shard-count aggregate
                                "graph_pagerank",
                                "graph_triangle_count",
                                # 1-row broadcasts: the avg-doc-length
                                # aggregate behind the threshold / the
                                # digit-count total behind the shares
                                "sample_weighted_bernoulli",
                                "profile_benford_digits",
                                # 1-row broadcasts (tpch2 tranche):
                                # the value threshold / the max
                                # revenue / the acctbal cutoff
                                "sql_tpch_q11",
                                "sql_tpch_q15",
                                "sql_tpch_q22",
                                # 1-row broadcasts (llmdata5 mixing
                                # tranche): the (tot, flat_tot) /
                                # budget-total aggregates crossed
                                # onto the ~20-row source table
                                "sample_temperature_mix",
                                "corpus_token_budget_alloc",
                                # 1-row broadcasts (llmdata6): the
                                # (lo, hi) range / MAX(doc_id)
                                # aggregates crossed onto the scan
                                "stats_ks_drift",
                                "corpus_vocab_growth",
                                # bounded label-DOMAIN broadcast
                                # (|labels| rows); the corpus-sized
                                # join is the neg_label equi-join
                                "sample_hard_negative_mine"},
    "CartesianProduct": set(),
    "BatchEvalPython": {"udf_python_scalar", "udtf_flatten"},
    "GlobalWindow": set(),
}
# True readStream jobs (streaming/jobs.py) execute eagerly inside
# fn() and return memory-sink / local results — their plans are not
# the job's dataflow; skip those BY NAME. The streaming_batch module's
# window/join queries are ordinary batch plans and ARE audited.
SKIP_NAMES = {"stream_watermark_late", "stream_dedup_stateful",
              "stream_rate_limit", "stream_foreachbatch_retry",
              "stream_custom_stateful", "stream_session_stateful",
              # runs its observed pass eagerly inside fn() and
              # returns a driver-local metrics row — the returned
              # plan is a LocalTableScan, not the job's dataflow
              "scan_observed_metrics"}


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    load_all_operators()
    spark = get_session("explain")
    spark.sparkContext.setLogLevel("ERROR")

    if names:
        for n in names:
            print(f"{'=' * 70}\n{n}\n{'=' * 70}")
            print(plan_of(REGISTRY[n].fn(spark, sf_dir)))
        return 0

    n_flags = 0
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if name in SKIP_NAMES:
            continue
        try:
            plan = plan_of(spec.fn(spark, sf_dir))
        except Exception as e:
            print(f"FLAG {name}: plan failed: {e}")
            n_flags += 1
            continue
        flags = []
        for marker in ("BroadcastNestedLoopJoin", "CartesianProduct",
                       "BatchEvalPython"):
            if marker in plan and name not in ALLOW[marker]:
                flags.append(marker)
        if re.search(r"Arguments: \[\], \[[^\]]+ (ASC|DESC)", plan) \
                and name not in ALLOW["GlobalWindow"]:
            flags.append("GlobalWindow")
        if flags:
            n_flags += 1
            print(f"FLAG {name}: {', '.join(flags)}")
    print(f"\n{n_flags} flagged")
    return 1 if n_flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
