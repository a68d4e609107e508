"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``open_reaction_database_web_scraper_spark``
(one module per SURVEY.md §2 category) and self-register into
``registry.REGISTRY``; this file only adapts the registry to the
driver's function signatures.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all_operators,
)

load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return REGISTRY["agg_multi"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted where not
    SQL-expressible (driver then records a rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
