"""Projections, filters and predicates (SURVEY.md §2.2).

All predicates here are Catalyst-pushable: `.explain` shows them in
``PushedFilters`` at the parquet scan, so at 100 TB they prune row
groups before any bytes move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "project_rename",
    oracle="""
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           o_totalprice AS total_price
    FROM orders
    """,
    tags=("project",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename — the reference's reactionId →
    reaction_id reshaping (web_scrpaer_2.py:88-92). Column pruning
    reaches the scan: ReadSchema lists only three fields."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("total_price"),
    )


@register(
    "filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_returnflag = 'R'
    """,
    tags=("filter",),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate (reference: identifier type == SMILES,
    web_scraper.py:433)."""
    return (load(spark, sf_dir, "lineitem")
            .filter(F.col("l_returnflag") == "R")
            .select("l_orderkey", "l_linenumber", "l_quantity"))


@register(
    "filter_bool",
    oracle="""
    SELECT event_id, (event_type <> 'error') AS success FROM events
    WHERE event_type <> 'error'
    """,
    tags=("filter",),
)
def filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep successful records only — the reference's success filter
    before save (web_scrpaer_2.py:542)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "success", F.col("event_type") != "error")
    return ev.filter(F.col("success")).select("event_id", "success")


@register(
    "filter_prefix",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_name LIKE 'Customer#00000001%'
    """,
    tags=("filter",),
)
def filter_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-prefix predicate (reference: rid.startswith('ord-'),
    web_scrpaer_2.py:422). StartsWith pushes down as a scan filter."""
    return (load(spark, sf_dir, "customer")
            .filter(F.col("c_name").startswith("Customer#00000001"))
            .select("c_custkey", "c_name"))


@register(
    "filter_null_safe",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'error'), 'UNKNOWN') AS etype
    FROM events
    WHERE COALESCE(NULLIF(event_type, 'error'), 'UNKNOWN') = 'UNKNOWN'
    """,
    tags=("filter",),
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-key tolerance: absent → default, then filter on the
    default — the reference's ``.get(k, default)`` semantics
    (web_scrpaer_2.py:107,147,187)."""
    ev = load(spark, sf_dir, "events")
    etype = F.coalesce(
        F.nullif(F.col("event_type"), F.lit("error")), F.lit("UNKNOWN"))
    return (ev.withColumn("etype", etype)
            .filter(F.col("etype") == "UNKNOWN")
            .select("event_id", "etype"))


@register(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
    WHERE l_quantity > 25 AND l_discount BETWEEN 0.02 AND 0.06
      AND l_returnflag = 'N'
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-clause predicate (reference's JSON shape validation,
    web_scrpaer_2.py:362,366). All three conjuncts push to the scan."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_quantity") > 25)
                      & F.col("l_discount").between(0.02, 0.06)
                      & (F.col("l_returnflag") == "N"))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount"))


@register(
    "filter_isin",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("filter",),
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership filter — the reference's specific-datasets mode
    (web_scrpaer_2.py:475-476,521). In(list) pushes down; at scale a
    long list flips to a broadcast semi-join instead."""
    return (load(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select("o_orderkey", "o_orderpriority"))


@register(
    "filter_range_rownum",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    WHERE rn BETWEEN 2 AND 4
    """,
    tags=("filter", "window"),
)
def filter_range_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional slice start..end within a group — the reference's
    ``all_reaction_ids[start:end]`` (web_scrpaer_2.py:425-430). The
    order key (date, key) is total, so the slice is deterministic.
    ``rn`` is widened to BIGINT so the driver sees the same dtype the
    DuckDB oracle renders (row_number is int32 in Spark, int64 in
    DuckDB — the string hash matches either way, the cast removes
    the divergence note entirely)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (load(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn").between(2, 4))
            .select("o_custkey", "o_orderkey", "rn"))
