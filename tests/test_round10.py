"""Round-10 tests: the plane-dot sign-margin pin (round-9 advice),
unit-normalization equivalence, and the miner-family lever guards.

The sign-LSH oracles compare ``dot > 0`` independently in Spark and
DuckDB. The folds are elementwise-identical by the dot convention
(sequential double accumulation both sides), so a bucket flip would
need a plane dot to sit within accumulation-order float error of
exactly 0. These tests MEASURE that margin on every driver corpus:
the minimum |plane·vector| over all (vector, plane) combinations the
queries actually evaluate is pinned orders of magnitude above 1-ulp
territory (~1e-16 relative), so the near-zero-dot assumption is a
checked invariant, not a hope.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from open_reaction_database_web_scraper_spark.operators import llmdata6, vectors
from open_reaction_database_web_scraper_spark.operators.vectors import (
    _PLANE_W,
    _plane_weights,
)
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")


def _embeddings(sf_dir: str) -> np.ndarray:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["embedding"])
    return np.vstack(tbl.column("embedding").to_pylist()).astype("float64")


def _plane_matrix(base: int, n: int, dim: int) -> np.ndarray:
    planes = [base + i for i in range(n)]
    _plane_weights(None, planes)
    return np.array([_PLANE_W[p][:dim] for p in planes])


def _min_abs_margin(x: np.ndarray, base: int, n_planes: int) -> float:
    w = _plane_matrix(base, n_planes, x.shape[1])
    return float(np.abs(x @ w.T).min())


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_hardneg_ann_plane_dot_margin(sf_dir):
    """Miner namespace (base 2000): dots of UNIT-NORMALIZED vectors
    against the 8 tables x bits(N) planes the celled miner evaluates
    at this corpus size. Margin floor 1e-9: ~7 decimal orders above
    the ~1e-16 accumulation-order error of a 64-term double fold."""
    x = _embeddings(sf_dir)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    bits = min(max(int(math.ceil(math.log2(
        max(len(x), 2) / llmdata6.HARDNEG_TARGET_BUCKET))),
        llmdata6.HARDNEG_MIN_BITS), llmdata6.HARDNEG_MAX_BITS)
    margin = _min_abs_margin(x, llmdata6.HARDNEG_PLANE_BASE,
                             llmdata6.HARDNEG_TABLES * bits)
    assert margin > 1e-9, margin


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ann_lsh_plane_dot_margin(sf_dir):
    """ANN namespace (base 0): vector_ann_lsh buckets RAW double
    vectors with the fixed 4x6 plane set — same margin pin."""
    x = _embeddings(sf_dir)
    margin = _min_abs_margin(
        x, 0, vectors.N_TABLES * vectors.BITS_PER_TABLE)
    assert margin > 1e-9, margin


def test_unit_normalize_matches_ratio_cosine(spark):
    """unit_normalize + one dot must equal the ratio-form cosine to
    well under the 9-dp boundary (they differ only in fold order of
    the same doubles), on a deterministic non-trivial vector set."""
    from pyspark.sql import functions as F

    from open_reaction_database_web_scraper_spark.functions.vector_math import (
        cosine_similarity, dot, unit_normalize)

    rows = [(i, [((i * 31 + d * 7) % 97) / 97.0 - 0.33
                 for d in range(16)]) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "id int, e array<double>")
    pairs = (df.alias("a").join(df.alias("b"), F.col("a.id") < F.col("b.id"))
             .select(F.col("a.e").alias("ea"), F.col("b.e").alias("eb")))
    ratio = pairs.select(
        cosine_similarity(F.col("ea"), F.col("eb")).alias("c")).collect()
    na = unit_normalize(pairs, "ea")
    nb = unit_normalize(na, "eb")
    normed = nb.select(dot(F.col("ea"), F.col("eb")).alias("c")).collect()
    worst = max(abs(r.c - s.c) for r, s in zip(ratio, normed))
    assert worst < 1e-12, worst


def test_unit_norm_sql_matches_spark_bitwise(spark):
    """Cross-engine: DuckDB's unit_norm_sql fold must reproduce the
    Spark normalized-dot cosine BIT-FOR-BIT (no rounding) on the
    driver embeddings — the contract the three converted oracles
    (miners, knn join) rely on at the 9-dp boundary."""
    import duckdb
    from pyspark.sql import functions as F

    from open_reaction_database_web_scraper_spark.catalog import load
    from open_reaction_database_web_scraper_spark.functions.vector_math import (
        dot, unit_normalize)
    from open_reaction_database_web_scraper_spark.functions.vector_math import (
        unit_norm_sql)

    sf_dir = SF_DIRS[0]
    emb = unit_normalize(
        load(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")),
        "e")
    a = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = emb.filter(F.col("vec_id") % 25 == 1).select(
        F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    got = {(r.ia, r.ib): r.c for r in
           a.crossJoin(b).select(
               "ia", "ib", dot(F.col("ea"), F.col("eb")).alias("c"))
           .collect()}
    con = duckdb.connect()
    want = {(ia, ib): c for ia, ib, c in con.execute(f"""
        WITH emb0 AS (
          SELECT vec_id, embedding::DOUBLE[] AS e
          FROM '{sf_dir}/embeddings.parquet'
        ), emb AS (
          SELECT vec_id, {unit_norm_sql('e')} AS e FROM emb0
        )
        SELECT a.vec_id, b.vec_id, list_dot_product(a.e, b.e)
        FROM emb a JOIN emb b
          ON a.vec_id % 25 = 0 AND b.vec_id % 25 = 1
    """).fetchall()}
    assert got.keys() == want.keys() and got
    assert all(got[k] == want[k] for k in got), "bitwise divergence"


def test_pca_gram_agrees_with_power_cov(spark, sf_dir):
    """The quantized Gram table (vector_pca_gram) must reproduce
    vector_pca_power's answer: build cov from the dequantized Gram /
    means / count and power-iterate it — the resulting direction must
    align with the PCA query's loadings (|cos| > 0.999; quantization
    error is <= 1e-9 per term, orders below the spectral gap)."""
    rows = REGISTRY["vector_pca_gram"].fn(spark, sf_dir).collect()
    q = {(r.i, r.j): r.q for r in rows}
    n = q[(-1, -1)]
    d = 1 + max(i for i, j in q if j >= 0)
    gram = np.array([[q[(i, j)] for j in range(d)]
                     for i in range(d)]) / 1e9
    mean = np.array([q[(i, -1)] for i in range(d)]) / 1e9 / n
    cov = gram / n - np.outer(mean, mean)
    v = np.ones(d) / np.sqrt(d)
    for _ in range(50):
        w = cov @ v
        v = w / np.linalg.norm(w)
    loadings = np.array([
        r.loading for r in sorted(
            REGISTRY["vector_pca_power"].fn(spark, sf_dir).collect(),
            key=lambda r: r.dim)])
    cos = abs(float(v @ loadings) /
              (np.linalg.norm(v) * np.linalg.norm(loadings)))
    assert cos > 0.999, cos
