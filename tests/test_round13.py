"""Round-13 hardening tests (ADVICE r12 closures).

1. vector_pca_power on a degenerate (zero-covariance) corpus: the
   shrunk iterate collapses to all-zero, den = Σv² = 0 and the trace
   is 0 — both previously divided by zero (and the oracle yielded
   NULL/inf, diverging). Now both sides emit 0.0 rows, hash-matched.
"""

from __future__ import annotations

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.testing import compare

load_all_operators()


def run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_pca_degenerate_zero_corpus(spark, tmp_path):
    """All-zero embeddings → zero Gram, zero covariance, all-zero
    iterate: den == 0 and trace == 0. The engine must emit d rows of
    (dim, 0.0, 0.0, 0.0) instead of raising ZeroDivisionError, and
    the oracle's mirrored CASE must produce the identical frame."""
    d = 8
    df = spark.createDataFrame(
        [(int(i), [0.0] * d, 0) for i in range(20)],
        "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = run("vector_pca_power", spark, str(tmp_path))
    rows = out.collect()
    assert len(rows) == d
    assert all(r.loading == 0.0 and r.eigenvalue == 0.0
               and r.explained_var == 0.0 for r in rows)
    ok, msg = compare(out, REGISTRY["vector_pca_power"].oracle,
                      str(tmp_path), "pca_degenerate")
    assert ok, msg
