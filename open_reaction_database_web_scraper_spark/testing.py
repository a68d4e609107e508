"""Differential-oracle test harness.

Mimics the driver's correctness gate: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare row count, column names, and an order-insensitive
canonical value multiset. Floats are compared bit-exactly — the
engine's decimal-accumulator idiom (functions/numeric.py) is what
makes that feasible.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _canon(v):
    """Canonical, hashable, engine-agnostic value image."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("s", str(v))


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df: DataFrame, oracle_sql: str, sf_dir: str,
            name: str = "?") -> tuple[bool, str]:
    """Driver-style comparison. Returns (ok, message)."""
    s_rows_raw = spark_df.collect()
    s_cols = spark_df.columns
    o_cols, o_rows_raw = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(c.lower() for c in o_cols) and \
       sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        return False, (f"{name}: column mismatch spark={sorted(s_cols)} "
                       f"oracle={sorted(o_cols)}")
    if len(s_rows_raw) != len(o_rows_raw):
        return False, (f"{name}: row count spark={len(s_rows_raw)} "
                       f"oracle={len(o_rows_raw)}")
    s = canon_rows(s_cols, [tuple(r) for r in s_rows_raw])
    o = canon_rows(o_cols, o_rows_raw)
    if s != o:
        diff_i = next(i for i, (a, b) in enumerate(zip(s, o)) if a != b)
        return False, (f"{name}: value mismatch at sorted-row {diff_i}:\n"
                       f"  spark : {s[diff_i]}\n  oracle: {o[diff_i]}")
    return True, f"{name}: OK ({len(s)} rows)"


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    from .registry import REGISTRY, load_all_operators
    load_all_operators()
    return REGISTRY[name].fn(spark, sf_dir)
