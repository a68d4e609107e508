"""Round-3 relational extensions [E].

Four shapes a relational engine at 100 TB needs that the first two
tranches didn't cover: a HAVING-gated large-group join (TPC-H Q18 as
raw SQL text), a Pareto/skyline operator (the classic "no full
quadratic dominance check" exercise), the forward variant of the
as-of join (join_asof covers backward), and market-basket pair
lifting (bounded self-join on a tiny per-key domain).

The reference has no relational surface at all (SURVEY.md §2.3); all
rows here are [E] generalizations exercised on the driver tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# Shared verbatim by Spark and DuckDB (same cross-dialect subset
# sql_tpch_q3 pins: ANSI joins, decimal casts, ORDER BY ... LIMIT).
_Q18_SQL = """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big b      ON b.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@register("sql_tpch_q18", oracle=_Q18_SQL, tags=("sql", "join", "having"))
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) as RAW SQL text — the
    HAVING-subquery join shape: an aggregate over the fact table
    gates which orders survive, then the survivors re-join the same
    fact for the detail rollup.

    Catalyst's plan is the scalable one: the `big` CTE is a
    map-side-combined hash aggregate whose output (keys above the
    quantity threshold — a tiny fraction) joins back as a
    broadcast/shuffled equi-join, so lineitem is scanned twice but
    never exploded; the final ORDER BY ... LIMIT 100 is
    TakeOrderedAndProject (per-task heaps, no global sort). The
    threshold makes `big` shrink with selectivity, not data — at
    100 TB the gate join is the cheap side. Tie-safety: o_orderkey
    in the sort makes the top-100 cut deterministic in both engines.
    """
    from .sql_surface import _register_views
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q18_SQL)


@register(
    "skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT p_retailprice, p_size FROM part
    )
    SELECT p.p_retailprice, p.p_size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice
             OR q.p_size > p.p_size)
    )
    """,
    tags=("skyline", "window"),
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over part: the (price, size)
    pairs not weakly dominated by any other pair (cheaper-or-equal
    AND bigger-or-equal, strict in at least one).

    The oracle is the textbook quadratic NOT EXISTS; the engine
    shape is the O(n log n) sweep, decomposed so no global window
    ever runs:

    1. distinct (price, size) pairs (hash agg, map-side combined);
    2. price-banded sweep — rows hash into fixed price bands, and
       within each band a window ordered by (price ASC, size DESC)
       carries the running max size over STRICTLY PRECEDING rows;
    3. the cross-band carry-in is a per-band MAX aggregate (≤ #bands
       rows) whose prefix-max over lower bands is computed on the
       tiny aggregate and broadcast back.

    A pair is dominated iff max(in-band running max, lower-band
    carry-in) >= its size: a preceding pair in the (price ASC,
    size DESC) order is either strictly cheaper with size >= ours,
    or equal-priced with strictly larger size — both weakly dominate
    (and nothing else precedes us, so the test is exact, duplicates
    having been removed up front). Every stage is partitioned; the
    only driver-visible state is the #bands-row carry table, so the
    sweep survives any data size while the oracle's self-join is
    quadratic.
    """
    pts = (load(spark, sf_dir, "part")
           .select("p_retailprice", "p_size").distinct())
    # Fixed clamped band domain (num_histogram_fixed convention):
    # the driver's retail prices live in [900, 1000); 16 bands of
    # 6.25 so the banded sweep actually spreads over all 16
    # partitions (the earlier 75-wide bands assumed TPC-H's
    # [900, 2100) domain and collapsed onto 2 bands here). Any
    # monotone clamped banding is correctness-neutral.
    n_bands = 16
    band = F.least(
        F.greatest(F.floor((F.col("p_retailprice") - 900.0) / 6.25),
                   F.lit(0)),
        F.lit(n_bands - 1)).alias("band")
    pts = pts.select("p_retailprice", "p_size", band)

    in_band = (Window.partitionBy("band")
               .orderBy(F.col("p_retailprice").asc(),
                        F.col("p_size").desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    swept = pts.withColumn("run_max", F.max("p_size").over(in_band))

    band_max = pts.groupBy("band").agg(F.max("p_size").alias("bmax"))
    lower = (Window.orderBy("band")
             .rowsBetween(Window.unboundedPreceding, -1))
    # Global window over <= n_bands rows — a constant-size aggregate,
    # not a data-sized sort (same posture as broadcast dim tables).
    carry = band_max.select(
        "band", F.max("bmax").over(lower).alias("carry_max"))

    # greatest() already skips NULL arguments, so one -1 fallback
    # (first row of band 0: both sides NULL) is the only case left.
    dominated = (F.coalesce(
        F.greatest(F.col("run_max"), F.col("carry_max")), F.lit(-1))
        >= F.col("p_size"))
    return (swept.join(F.broadcast(carry), "band", "left")
            .filter(~dominated)
            .select("p_retailprice", "p_size"))


@register(
    "join_asof_forward",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MIN(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ), clicks AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click'
    ), u AS (
      SELECT user_id, ts, 0 AS is_purchase, event_id,
             CAST(NULL AS BIGINT) AS p_id,
             CAST(NULL AS TIMESTAMP) AS p_ts
      FROM clicks
      UNION ALL
      SELECT user_id, ts, 1, CAST(NULL AS BIGINT),
             purchase_id, ts
      FROM purchases
    ), carried AS (
      SELECT user_id, ts, is_purchase, event_id,
             FIRST_VALUE(p_id IGNORE NULLS) OVER w AS purchase_id,
             FIRST_VALUE(p_ts IGNORE NULLS) OVER w AS purchase_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_purchase
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, ts, purchase_id, purchase_ts
    FROM carried WHERE is_purchase = 0
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: EARLIEST purchase at-or-after each click,
    per user (join_asof covers the backward latest-at-or-before
    direction; time-to-conversion queries need this mirror).

    Same one-shuffle union+window emulation: tag both sides, sort
    once on (user, ts), and carry the next purchase backward with
    ``first(ignorenulls)`` over the CURRENT ROW..UNBOUNDED FOLLOWING
    frame. Clicks sort before purchases at equal ts (is_purchase
    0 < 1), so an equal-ts purchase is inside the click's forward
    frame — '>=' semantics. Duplicate purchases per (user, ts)
    pre-reduce to MIN(event_id) so both engines are deterministic.
    The oracle runs the identical ANSI emulation (window'd IGNORE
    NULLS is cross-dialect), doubling as a parity pin for forward
    frames.
    """
    ev = load(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.min("event_id").alias("p_id"))
                 .select("user_id", "ts",
                         F.lit(1).alias("is_purchase"),
                         F.lit(None).cast("long").alias("event_id"),
                         "p_id",
                         F.col("ts").alias("p_ts")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.lit(0).alias("is_purchase"),
                      "event_id",
                      F.lit(None).cast("long").alias("p_id"),
                      F.lit(None).cast(ev.schema["ts"].dataType)
                      .alias("p_ts")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "is_purchase")
         .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    carried = clicks.unionByName(purchases).select(
        "user_id", "ts", "is_purchase", "event_id",
        F.first("p_id", ignorenulls=True).over(w).alias("purchase_id"),
        F.first("p_ts", ignorenulls=True).over(w).alias("purchase_ts"))
    return (carried.filter(F.col("is_purchase") == 0)
            .select("event_id", "user_id", "ts",
                    "purchase_id", "purchase_ts"))


@register(
    "assoc_pair_lift",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), totals AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
      FROM events
    ), singles AS (
      SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM ut a
      JOIN ut b ON a.user_id = b.user_id
               AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ROUND(p.n_both * t.n_users / (sa.n * sb.n), 6) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN totals t
    """,
    tags=("analytics", "join"),
)
def assoc_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair lift over event types: for every unordered
    pair of event types, how many users did both, and the lift
    (observed co-occurrence over the independence expectation).

    Scale shape: the per-user self-join runs AFTER the distinct
    (user, type) reduction, so each user contributes at most
    |types|²/2 pairs — the type domain is a small constant, making
    the join output bounded by users x a constant, never quadratic
    in events. Singles and the 1-row user total are tiny aggregates
    broadcast into the final projection; every big stage is a
    map-side-combined hash agg keyed on user_id or the pair domain.
    """
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    # 1-row user total: the scalar-subquery broadcast shape
    # (crossJoin of a single aggregate row — allow-listed in
    # scripts/explain_all.py like text_tfidf's).
    n_users = ev.agg(
        F.count_distinct("user_id").cast("double").alias("n_users"))
    singles = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("type_a"),
                      F.col("b.event_type").alias("type_b"))
             .agg(F.count("*").alias("n_both")))
    sa = singles.select(F.col("event_type").alias("type_a"),
                        F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"),
                        F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .crossJoin(F.broadcast(n_users))
            .select("type_a", "type_b", "n_both",
                    F.round(F.col("n_both") * F.col("n_users")
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift")))


_Q7_SQL = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3')
       OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
    GROUP BY n1.n_name, n2.n_name,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT)
"""


@register("sql_tpch_q7", oracle=_Q7_SQL, tags=("sql", "join"))
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations) as RAW SQL —
    the self-aliased-dimension shape: nation joins in TWICE under
    different roles (supplier's vs customer's), with a symmetric
    OR pair predicate that only the pairing of BOTH aliases can
    resolve (neither scan can push the disjunction alone). The
    nation pair (19, 3) is chosen to have supplier+customer volume
    at EVERY test scale factor — the original (1, 2) pair had no
    sf0.001 suppliers, so the query was green-by-emptiness there
    (the vacuous-coverage failure mode diffcheck now fails on).

    Scale shape: Catalyst plans the two 25-row nation aliases as
    independent broadcasts and leaves the residual OR as a join
    filter AFTER both decodes; the fact side still shuffles only for
    the big equi-joins. Revenue uses the exact decimal-accumulator
    idiom (same text both engines); the ship-year is grouped as
    BIGINT so neither engine's EXTRACT integer width leaks into the
    schema (reference analog: per-dataset × per-kind tallies,
    web_scrpaer_2.py:461-462).
    """
    from .sql_surface import _register_views
    _register_views(spark, sf_dir,
                    ("supplier", "lineitem", "orders", "customer",
                     "nation"))
    return spark.sql(_Q7_SQL)


_Q14_SQL = """
    SELECT 100.00
           * CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4))
                  AS DOUBLE)
           / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                       AS DECIMAL(38,4)) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
"""


@register("sql_tpch_q14", oracle=_Q14_SQL, tags=("sql", "join", "agg"))
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion revenue share) as RAW SQL — the
    conditional-aggregate-over-join shape reduced to ONE global
    row: a date-sliced fact scan joined to the part dimension, with
    a CASE-gated numerator and ungated denominator accumulated in
    the SAME pass (one aggregate, not two queries).

    Scale shape: the shipdate range prunes at the parquet scan
    (PushedFilters), part joins by AQE choice, and both sums are
    exact DECIMAL partials merged map-side; each sum is cast to
    DOUBLE BEFORE the division (Spark's decimal÷decimal truncates
    by its result-scale rule while DuckDB promotes to double —
    dividing the doubles is the same IEEE op in both engines, no
    ROUND tolerance needed).
    """
    from .sql_surface import _register_views
    _register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q14_SQL)


_Q6_SQL = """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * CAST(l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("sql_tpch_q6", oracle=_Q6_SQL, tags=("sql", "agg", "pushdown"))
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) as RAW SQL — the purest
    pushdown benchmark: no join, one global sum, FOUR conjunctive
    range predicates that must all reach the parquet scan. At 100 TB
    this query is entirely I/O-bound on how much the scan can skip
    (row-group min/max on shipdate/discount/quantity), which is why
    every engine demo uses it; the plan shows PushedFilters with all
    four bounds and a two-column ReadSchema.
    """
    from .sql_surface import _register_views
    _register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q6_SQL)


_Q10_SQL = """
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@register("sql_tpch_q10", oracle=_Q10_SQL, tags=("sql", "join", "topk"))
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting, top-20 lost-revenue
    customers) as RAW SQL — the selective-fact double-slice shape: a
    quarter slice on orders AND a returnflag slice on lineitem both
    push to their scans BEFORE the three-way join, so the join feeds
    on two pre-shrunk sides; nation decodes by broadcast and the
    ORDER BY/LIMIT plans as TakeOrderedAndProject (per-task heaps,
    no global sort). c_custkey in the sort seals the top-20 cut
    against revenue ties in both engines.
    """
    from .sql_surface import _register_views
    _register_views(spark, sf_dir,
                    ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_Q10_SQL)
