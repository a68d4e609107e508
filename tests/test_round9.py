"""Round-9 pins: the ANN-celled hard-negative miner (the round-8
verdict's one `weak` — its exhaustive pool replaced by LSH candidate
cells) recall floor + planted semantics.
"""

import pytest

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


# ---------------------------------------------------------------------------
# sample_hard_negative_mine_ann


def test_hard_negative_ann_recall_floor(spark, sf_dir):
    """The celled miner must recover ≥0.6 of the exhaustive miner's
    top-3 cross-label pairs (the vector_ann_* recall-floor pattern;
    measured 0.80 at sf0.001 with 8 tables × adaptive bits)."""
    exact = {(r.query_id, r.negative_id)
             for r in REGISTRY["sample_hard_negative_mine"]
             .fn(spark, sf_dir).collect()}
    ann = {(r.query_id, r.negative_id)
           for r in REGISTRY["sample_hard_negative_mine_ann"]
           .fn(spark, sf_dir).collect()}
    assert exact, "exhaustive miner returned nothing"
    assert len(exact & ann) / len(exact) >= 0.6


def test_hard_negative_ann_excludes_same_label(spark, tmp_path):
    """Celled variant: negatives are cross-label only; the same-label
    near-twin never appears even though it shares every LSH bucket
    with the probe, and the near-identical cross-label vector (which
    provably collides — identical sign pattern) is mined first."""
    base = [1.0, 0.0, 2.0, -1.0]
    twin = [x * 1.001 for x in base]          # same label, cos ~ 1
    close = [1.0, 0.1, 2.0, -1.0]             # other label, cos ~ 0.998
    far = [0.0, 5.0, 0.0, 0.0]                # other label, cos 0
    rows = [(0, "a", base), (1, "a", twin), (2, "b", close),
            (3, "b", far)]
    d = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = sorted(REGISTRY["sample_hard_negative_mine_ann"].fn(spark, d)
                 .collect(), key=lambda r: -r.cosine)
    assert all(r.query_id == 0 and r.neg_label == "b" for r in out)
    assert 1 not in {r.negative_id for r in out}   # twin excluded
    assert out and out[0].negative_id == 2         # hard first
    assert {r.negative_id for r in out} <= {2, 3}


def test_hard_negative_ann_subset_of_pool(spark, sf_dir):
    """Every mined pair must be a (probe, non-probe) cross-label pair
    — the cells only ever NARROW the exhaustive pool."""
    rows = REGISTRY["sample_hard_negative_mine_ann"].fn(
        spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.query_id % 25 == 0
        assert r.negative_id % 25 != 0
        assert r.label != r.neg_label


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
