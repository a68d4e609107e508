"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG depends on accumulation order, which differs
between Spark's partial-aggregate tree and the DuckDB oracle (and
between runs once partitioning changes). The engine therefore sums
in exact DECIMAL and casts the final total back to DOUBLE: the
decimal accumulation is order-insensitive and bit-identical in both
engines, at no extra shuffle cost (the decimal partial aggregate is
still map-side combined, and whole-stage codegen covers decimals).

The driver's synthetic numerics are all 2-decimal values, so the
per-row cast to DECIMAL(18,4) is exact (no rounding ambiguity), and
DECIMAL(18,4) products stay within precision 38 in both engines —
every derived expression like ``price * (1 - discount)`` is computed
exactly when both operands are cast first.

Oracle-side equivalents (DuckDB):
    dsum(c)  ->  CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DOUBLE)
    davg(c)  ->  CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(c)

One more rule for HIGHER-scale decimals (products, scale-8+; scale-12
quality sums): reduce the exact sum's scale before the DOUBLE cast so
its integer image stays below 2^53. DuckDB converts decimal→double as
int128→double (a rounding when the image exceeds 2^53) then ÷10^scale
(a second rounding); Spark's BigDecimal.doubleValue rounds once — a
1-ULP data-dependent divergence otherwise. At scale 4 a money-sum's
image converts exactly, so both engines round once and agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str) -> Column:
    """Exact decimal image of a (≤4-decimal) double column."""
    return _col(c).cast(DEC)


def dsum(c: Column | str) -> Column:
    """Order-insensitive double SUM (exact decimal accumulator)."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-insensitive double AVG = exact-sum / count."""
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def dsum_sql(expr: str) -> str:
    """DuckDB oracle text matching :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB oracle text matching :func:`davg`."""
    return f"{dsum_sql(expr)} / COUNT({expr})"
