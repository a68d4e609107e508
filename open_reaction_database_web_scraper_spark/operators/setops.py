"""Set operations (SURVEY.md §2.7).

The reference's union is the per-thread result merge
(web_scrpaer_2.py:497-505); its dedup is the seen-set accumulation
(:262,422). Spark's UNION is a zero-shuffle concatenation of
partitions; DISTINCT/INTERSECT/EXCEPT each cost one hash shuffle on
the full row — at scale, prefer dropDuplicates on an explicit key
subset so the shuffle key is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "set_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append batches by name (dead-letter recombination pattern)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    return clicks.unionByName(views)


@register(
    "set_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("setop",),
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup (reference's seen-set, web_scrpaer_2.py:262)."""
    return (load(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_linestatus").distinct())


@register(
    "set_intersect",
    oracle="""
    SELECT user_id AS id FROM events
    INTERSECT
    SELECT o_custkey AS id FROM orders
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ids present in both inputs."""
    ev = load(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    od = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    return ev.intersect(od)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS id FROM orders
    EXCEPT
    SELECT user_id AS id FROM events
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ids lost between runs (v1-vs-v2 output diffing)."""
    od = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id"))
    ev = load(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    return od.subtract(ev)  # EXCEPT DISTINCT semantics, matching the oracle


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection — each row kept min(count_left,
    count_right) times, the bag semantics INTERSECT DISTINCT loses.
    Spark plans it as a count-compare aggregate, not a join of the
    duplicated rows."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25) \
        .select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_discount") > 0.05) \
        .select(F.col("l_returnflag").alias("flag"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference — each row kept max(0, count_left -
    count_right) times (bag semantics for run-diffing where
    multiplicity matters)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 25) \
        .select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_discount") > 0.05) \
        .select(F.col("l_returnflag").alias("flag"))
    return a.exceptAll(b)
