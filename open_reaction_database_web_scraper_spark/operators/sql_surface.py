"""Raw-SQL front end (SURVEY.md §2 — API-surface completeness).

Everything else in the engine is DataFrame-built; this module proves
the OTHER entry point users actually run: `spark.sql()` text over
catalog views. The reference has no SQL surface (its "queries" are
crawl-plan dicts, web_scrpaer_2.py:291-334), but an analytics engine
that replaces it must accept SQL verbatim — same Catalyst pipeline,
same plans, zero engine-side translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views as _register_views  # noqa: F401
from ..registry import register

# _register_views is catalog.register_views with an explicit table
# subset — one view-binding code path, re-exported under the name
# the SQL-surface modules import.


# Shared verbatim by Spark and DuckDB: ANSI joins, TIMESTAMP
# literals, and the engine's decimal-accumulator revenue idiom
# (numeric.py) are identical in both dialects.
_Q3_SQL = """
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@register("sql_tpch_q3", oracle=_Q3_SQL, tags=("sql", "join", "topk"))
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority top-10), submitted as RAW SQL text
    — the oracle runs the IDENTICAL string on DuckDB, so this row
    also pins cross-dialect parity of the shared subset the engine
    commits to (ANSI joins, TIMESTAMP literals, decimal casts).

    Catalyst gives the SQL text the same plan the DataFrame build
    would get: segment filter pushed into the customer scan, date
    filters into orders/lineitem scans, fixed dims broadcast by AQE,
    and the ORDER BY ... LIMIT 10 becomes TakeOrderedAndProject
    (per-task top-k heaps — the global sort never materializes).
    Ties at the cut are impossible: the secondary sort key
    l_orderkey is unique per group, so the top-10 selection is
    deterministic in both engines.
    """
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SQL)


_SESSION_SQL = """
    WITH flags AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts > lag(ts) OVER w + INTERVAL '30' MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS session_no
      FROM flags
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             AS session_value
    FROM numbered
    GROUP BY user_id, session_no
"""


@register("sql_sessionize_cte", oracle=_SESSION_SQL,
          tags=("sql", "window"))
def sql_sessionize_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization as RAW SQL — chained CTEs, a
    named WINDOW clause, interval arithmetic, and a framed running
    sum, all in the cross-dialect shared subset (the oracle runs the
    same text). The WINDOW w clause is resolved once; both window
    passes and the session rollup reuse the single (user_id)
    exchange, same plan the DataFrame twin (win_sessionize_gaps)
    pins. SQL-text users get the engine's scale shapes for free.
    """
    _register_views(spark, sf_dir, ("events",))
    return spark.sql(_SESSION_SQL)


# Shared verbatim by both engines (same subset as Q3/Q18).
_Q5_SQL = """
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
"""


@register("sql_tpch_q5", oracle=_Q5_SQL, tags=("sql", "join"))
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) as RAW SQL — the engine's
    widest join tree: all six relational tables in one query, with
    the non-FK residual c_nationkey = s_nationkey that makes Q5 the
    classic join-order stress test.

    Catalyst's plan is the scale shape: region/nation broadcast
    (fixed cardinality), the date filter pushes into the orders
    scan, customer/supplier broadcast while small and degrade to
    shuffled joins at size — nothing in the SQL text pins a
    strategy, which is the point of the raw-SQL front end (the same
    text stays optimal from sf0.001 to 100 TB because the optimizer,
    not the query, picks the physical join order).
    """
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem",
                                    "supplier", "nation", "region"))
    return spark.sql(_Q5_SQL)
