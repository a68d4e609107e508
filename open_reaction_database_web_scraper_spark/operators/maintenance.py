"""Table-maintenance / catalog-analytics operators [E].

The reference maintains its scraped corpus imperatively — re-running
the scraper overwrites per-dataset JSON files in place
(web_scrpaer_2.py:556-569 writes one file per dataset id, replacing
prior content) and the v1 pipeline appends failed rows for later
retry (web_scraper.py:349-352). At warehouse scale those flows are
MERGE (upsert), column profiling (what did we just ingest?), mode /
top-value summaries, and calendar-spine densification for reporting.
Each is expressed here as a declarative Spark plan with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.numeric import dsum, dsum_sql
from ..registry import register


@register(
    "merge_upsert_scd1",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey,
             o_totalprice + 10.0 AS o_totalprice,
             'U' AS o_orderstatus
      FROM orders WHERE o_orderkey % 7 = 0
    ), inserts AS (
      SELECT o_orderkey + 100000000 AS o_orderkey,
             1.0 AS o_totalprice,
             'N' AS o_orderstatus
      FROM orders WHERE o_orderkey % 97 = 0
    ), changes AS (
      SELECT * FROM updates UNION ALL SELECT * FROM inserts
    )
    SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice,
           COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN c.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS change_type
    FROM orders b FULL OUTER JOIN changes c
      ON b.o_orderkey = c.o_orderkey
    """,
    tags=("maintenance", "join"),
)
def merge_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 MERGE: apply an update/insert change-set onto a base
    table, last-writer-wins (the relational form of the reference's
    per-dataset file overwrite, web_scrpaer_2.py:556-569).

    Shape: one full-outer shuffle join on the merge key with
    COALESCE per column — both sides hash-partition once on
    o_orderkey and AQE coalesces/skew-splits as needed. At 100 TB
    this is exactly the copy-on-write MERGE kernel: the only
    refinement a real lakehouse adds is pruning the join to the
    partitions the change-set touches, which composes with the
    partitioned sink ops here (scans.py). The change-set is derived
    deterministically from the base table so the query is
    self-contained; price delta is an exact double op (+10.0), no
    float-rounding divergence.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"))
    inserts = base.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + F.lit(100000000)).alias("o_orderkey"),
        F.lit(1.0).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"))
    changes = updates.unionByName(inserts)
    b, c = base.alias("b"), changes.alias("c")
    return (b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"),
                   "full_outer")
            .select(
                F.coalesce("c.o_orderkey", "b.o_orderkey")
                .alias("o_orderkey"),
                F.coalesce("c.o_totalprice", "b.o_totalprice")
                .alias("o_totalprice"),
                F.coalesce("c.o_orderstatus", "b.o_orderstatus")
                .alias("o_orderstatus"),
                F.when(F.col("b.o_orderkey").isNull(), "insert")
                .when(F.col("c.o_orderkey").isNull(), "keep")
                .otherwise("update").alias("change_type")))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@register(
    "profile_table_stats",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS DOUBLE) AS min_val,
               CAST(MAX({c}) AS DOUBLE) AS max_val
        FROM lineitem
        """ for c in _PROFILE_COLS),
    tags=("maintenance", "agg"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler: per-column row/null/distinct
    counts and min/max, emitted long-form (one row per column) — the
    post-ingest sanity report the reference prints by hand
    (web_scraper.py:512-561's sample report walks counts per field).

    All profiled columns are computed in ONE scan: a single
    hash-aggregate produces every stat, then a driver-free
    explode(array(struct…)) re-shapes the 1×N row to long form. The
    exact multi-column COUNT(DISTINCT) costs Spark one Expand
    (×|cols| rows, partial-agg'd map-side before the shuffle) — the
    standard exact plan; swap in approx_count_distinct per column to
    drop the Expand at 100 TB if ±2 % error is acceptable.
    """
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_nonnull"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"))
        for c in _PROFILE_COLS])
    return (one.select(F.explode(rows).alias("r")).select("r.*"))


@register(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY day
               ORDER BY n_events DESC, event_type) AS rn
      FROM counts
    )
    SELECT day, event_type AS mode_event_type, n_events
    FROM ranked WHERE rn = 1
    """,
    tags=("maintenance", "agg", "window"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group (mode), deterministic tie-break
    by value. Two-level plan: hash-aggregate the (group, value)
    counts first — that shrinks data to |distinct pairs| BEFORE the
    window — then rank within group. Never windows over raw rows:
    at 100 TB the count agg is map-side-combined and the window
    input is tiny. Tie-break (count DESC, value ASC) makes the row
    unique, so the result is stable at any parallelism.
    """
    ev = load(spark, sf_dir, "events")
    counts = (ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n_events")))
    w = Window.partitionBy("day").orderBy(
        F.desc("n_events"), F.asc("event_type"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("day", F.col("event_type").alias("mode_event_type"),
                    "n_events"))


@register(
    "date_spine_fill_gaps",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MIN(o_orderdate)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('day', MAX(o_orderdate)) AS TIMESTAMP) AS hi
      FROM orders
    ), spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             COUNT(*) AS n_orders,
             {dsum_sql('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT s.day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, CAST(0 AS DOUBLE)) AS revenue
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    tags=("maintenance", "datetime", "join"),
)
def date_spine_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine densification: one row per day between the
    table's min and max order date, zero-filled where no orders
    exist — the gap-free daily series every reporting layer wants.

    The spine is generated from a 1-row bounds aggregate via
    sequence()+explode — no driver round-trip, no Python range. The
    daily aggregate shrinks orders to |days| rows before the join,
    and that post-agg side is broadcast (|days| rows is tiny even
    over a century of data — Spark can't broadcast the PRESERVED
    side of an outer join, so the hint goes on the daily side), so
    the big table is scanned exactly once and the join is
    shuffle-free.
    """
    od = load(spark, sf_dir, "orders")
    bounds = od.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY")))
        .alias("day"))
    daily = (od.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
             .agg(F.count("*").alias("n_orders"),
                  dsum("o_totalprice").alias("revenue")))
    return (spine
            .join(F.broadcast(daily), "day", "left")
            .select("day",
                    F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                    F.coalesce("revenue", F.lit(0.0)).alias("revenue")))


@register(
    "merge_upsert_scd2",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT b.o_orderkey, b.o_totalprice, b.o_orderstatus,
           1 AS version,
           CASE WHEN c.o_orderkey IS NULL THEN TRUE ELSE FALSE END
             AS is_current
    FROM orders b LEFT JOIN chg c ON b.o_orderkey = c.o_orderkey
    UNION ALL
    SELECT c.o_orderkey, c.o_totalprice, b.o_orderstatus,
           2 AS version, TRUE AS is_current
    FROM orders b JOIN chg c ON b.o_orderkey = c.o_orderkey
    """,
    tags=("maintenance", "join"),
)
def merge_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 MERGE: apply a change-set while KEEPING history — the
    matched base row is retired (is_current=false) and a version-2
    row is appended, unmatched rows stay current at version 1. The
    reference's per-dataset overwrite (web_scrpaer_2.py:556-569)
    destroys the old file; this is the audit-preserving form.

    One left join on the merge key, then matched rows EXPLODE into
    (retired, new) pairs via an inline array of structs — so the base
    table is scanned and joined exactly once, not once per output
    branch like the oracle's 2-scan UNION. At 100 TB the join is the
    standard MERGE shuffle (AQE-skew-safe) and the explode is narrow.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    chg = (base.filter(F.col("o_orderkey") % 7 == 0)
           .select("o_orderkey",
                   (F.col("o_totalprice") + F.lit(10.0)).alias("new_price")))
    joined = base.join(chg, "o_orderkey", "left")
    row = lambda price, version, current: F.struct(  # noqa: E731
        price.alias("o_totalprice"),
        F.lit(version).alias("version"),
        F.lit(current).alias("is_current"))
    versions = F.when(
        F.col("new_price").isNull(),
        F.array(row(F.col("o_totalprice"), 1, True))).otherwise(
        F.array(row(F.col("o_totalprice"), 1, False),
                row(F.col("new_price"), 2, True)))
    return (joined.select("o_orderkey", "o_orderstatus",
                          F.explode(versions).alias("v"))
            .select("o_orderkey", F.col("v.o_totalprice"),
                    "o_orderstatus", F.col("v.version"),
                    F.col("v.is_current")))


@register(
    "profile_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), counts AS (
      SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
    ), t AS (SELECT SUM(n) AS total FROM counts)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
           ROUND(LOG10(1 + 1.0 / digit), 6) AS benford_expected
    FROM counts, t
    """,
    tags=("profile", "quality"),
)
def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the
    Benford expectation — the classic anomaly screen for fabricated
    or truncated numeric columns, run as a profiling query.

    The digit is extracted integer-only: price → exact cents BIGINT
    → first character of its decimal rendering (integer-to-string is
    deterministic in every engine, unlike float formatting or
    log10-based digit math at powers of ten). One map-side-combined
    hash agg on a 9-value domain plus a 1-row total join; shares
    divide exact integers, so both engines round the same double.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.expr(
        "CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
        " AS STRING), 1, 1) AS BIGINT)")
    counts = (orders.select(digit.alias("digit"))
              .groupBy("digit").agg(F.count("*").alias("n")))
    t = counts.agg(F.sum("n").alias("total"))
    return (counts.crossJoin(F.broadcast(t))
            .select("digit", "n",
                    F.round(F.col("n").cast("double") / F.col("total"), 6)
                    .alias("share"),
                    F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
                    .alias("benford_expected")))
