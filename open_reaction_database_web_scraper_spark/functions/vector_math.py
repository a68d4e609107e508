"""Dense-vector column math using higher-order functions.

All JVM-side (``zip_with`` / ``aggregate``) — no Python in the hot
path, so similarity scans stay inside whole-stage codegen and scale
linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(df, col: str):
    """Replace array<double> column ``col`` with its unit-norm form,
    so a downstream PAIR stage computes cosine as ONE dot fold
    instead of dot + two norms — the round-10 miner lever: the 10×
    decomposition probe measured the interpreted per-pair folds at
    ~91% of the exhaustive miner's wall (12.48 s of 13.69 s), and
    cutting 3 folds to 1 took the 10× decade 13.69 s → 8.67 s while
    the sort-side levers (carry-key pre-window, Arrow per-batch
    top-k) moved nothing — Spark's InferWindowGroupLimit already
    bounds every rank-window exchange with a Partial WindowGroupLimit
    (see SCALING.md round 10).

    Normalization is O(N), pair work is O(pairs); the division by a
    positive scalar also preserves sign-LSH bucket signs (up to the
    float-margin documented at the call sites). The norm is computed
    once into a column (not inside the lambda) so codegen evaluates
    one fold per vector, not one per element.

    Cross-engine contract: mirrors ``unit_norm_sql`` below
    element-for-element — same sequential square fold (bit-identical
    to DuckDB's list_dot_product, the established dot convention),
    same sqrt, same per-element IEEE division — so normalized-dot
    cosines hash-match the oracle exactly like ratio-form cosines
    did. Degenerate zero vectors divide to NaN in both engines, the
    same degeneracy the ratio form had.
    """
    return (df.withColumn("__nrm", l2_norm(F.col(col)))
            .withColumn(col, F.transform(
                col, lambda x: x / F.col("__nrm")))
            .drop("__nrm"))


def unit_norm_sql(e: str) -> str:
    """DuckDB mirror of ``unit_normalize`` for oracle SQL: inline
    list_transform over the same expression. DuckDB evaluates the
    norm subexpression deterministically, so recomputation per
    element cannot change the value."""
    return (f"list_transform({e}, x -> x / "
            f"sqrt(list_dot_product({e}, {e})))")
