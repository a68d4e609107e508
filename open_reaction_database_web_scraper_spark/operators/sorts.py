"""Sorts, limits, top-k (SURVEY.md §2.6).

Top-k never does a full sort: ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject, a per-partition bounded heap + driver merge —
O(n) scan, no shuffle of the full table. That's the shape that holds
at 100 TB; explicit unique tiebreakers make results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "sort_order_by",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
    tags=("sort",),
)
def sort_order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit total ordering — replaces the reference's implicit
    crawl/insertion order (web_scrpaer_2.py:263). Range-partitioned
    sort (sampled bounds), spillable."""
    return (load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
            .orderBy("l_returnflag", "l_orderkey", "l_linenumber"))


@register(
    "limit_head",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10
    """,
    tags=("sort", "limit"),
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row cap — the reference's test-mode truncation
    (web_scraper.py:324,369). Ordered by the primary key so the
    head is deterministic across engines."""
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey").limit(10))


@register(
    "topk_order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "topk"),
)
def topk_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-k rows via TakeOrderedAndProject (bounded heap, no
    full sort). Unique (price DESC, key) order → deterministic set."""
    return (load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(20))
