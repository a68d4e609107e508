"""ANN quality pins (SURVEY.md §2.11 similarity search).

The approximate variants trade recall for candidate-set size; on the
driver's synthetic embeddings (near-random, no cluster structure)
absolute recall is inherently modest — these pins are regression
floors for the deterministic hashes/centroids, not quality targets.
IVF probes 2/8 cells (25% of the corpus) and must beat random
selection; multi-table LSH must beat its single-table ancestor (5%).
"""

from __future__ import annotations

import pytest

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


@pytest.fixture(scope="module")
def exact_topk(spark, sf_dir):
    rows = REGISTRY["vector_topk_similarity"].fn(spark, sf_dir).collect()
    return {(r.query_id, r.neighbor_id) for r in rows}


def _recall(approx_rows, exact):
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(exact & approx) / len(exact)


def test_exact_topk_shape(spark, sf_dir, exact_topk):
    # 8 queries × top-5, cosine within [-1, 1]
    assert len(exact_topk) == 40
    rows = REGISTRY["vector_topk_similarity"].fn(spark, sf_dir).collect()
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)


def test_ivf_recall_floor(spark, sf_dir, exact_topk):
    rows = REGISTRY["vector_ann_ivf"].fn(spark, sf_dir).collect()
    assert _recall(rows, exact_topk) >= 0.40


def test_lsh_recall_floor(spark, sf_dir, exact_topk):
    rows = REGISTRY["vector_ann_lsh"].fn(spark, sf_dir).collect()
    assert _recall(rows, exact_topk) >= 0.15


def test_ivf_returns_full_topk(spark, sf_dir):
    """Probing must yield ≥ TOP_K candidates per query on this data —
    the index covers every corpus vector, so 2 cells suffice."""
    rows = REGISTRY["vector_ann_ivf"].fn(spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(n == 5 for n in per_q.values()), per_q


def test_pq_recall_floor(spark, sf_dir):
    """PQ+ADC with exact rerank must recover a healthy fraction of
    the true top-k (measured 0.75+ on the driver embeddings; floor
    leaves margin for seed sensitivity)."""
    exact = {(r.query_id, r.neighbor_id)
             for r in REGISTRY["vector_topk_similarity"]
             .fn(spark, sf_dir).collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in REGISTRY["vector_ann_pq"].fn(spark, sf_dir).collect()}
    assert len(exact & pq) / len(exact) >= 0.6


def test_pq_is_deterministic(spark, sf_dir):
    a = REGISTRY["vector_ann_pq"].fn(spark, sf_dir).collect()
    b = REGISTRY["vector_ann_pq"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
