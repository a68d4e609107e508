"""Round-3 time-series operators over the events table [E].

The reference's only temporal structure is crawl pacing (the 1 s
politeness sleep, web_scrpaer_2.py:459); a warehouse engine over an
events stream needs the standard time-series kernels: gap-filled
resampling with interpolation, multi-granularity rollups in one
pass, streak detection, statistical anomaly flagging, changelog
(CDC) application, and variable-length interval joins.

Shared scale posture: every operator keys its shuffles on a column
whose cardinality is either bounded (event_type, calendar buckets)
or cluster-friendly (user_id); window sorts only ever run inside
those partitions; nothing data-sized is broadcast or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.numeric import davg, dsum_sql
from ..registry import register


@register(
    "ts_resample_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(value) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), bounds AS (
      SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
      FROM hourly GROUP BY event_type
    ), spine AS (
      SELECT event_type,
             UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), j AS (
      SELECT s.event_type, s.h, hv.v
      FROM spine s
      LEFT JOIN hourly hv
        ON s.event_type = hv.event_type AND s.h = hv.h
    ), c AS (
      SELECT event_type, h, v,
             LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END
                        IGNORE NULLS) OVER wb AS ph,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END
                         IGNORE NULLS) OVER wf AS nh
      FROM j
      WINDOW wb AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h AS bucket_hour,
           FLOOR((CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv)
                  * (CAST(date_diff('hour', ph, h) AS DOUBLE)
                     / CAST(date_diff('hour', ph, nh) AS DOUBLE))
           END) * 1000000 + 0.5) / 1000000.0 AS v_interp
    FROM c
    """,
    tags=("timeseries", "window"),
)
def ts_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample per-type event values to a 1-hour grid and linearly
    interpolate interior gaps (leading/trailing gaps stay NULL).

    Shape: one hash aggregate to hourly means (decimal-exact AVG so
    both engines agree bitwise), a calendar-bounded spine built from
    per-type MIN/MAX via ``sequence`` + explode (spine size is hours
    x types — calendar-bounded, never data-sized), then ONE
    event_type-partitioned exchange on which BOTH direction windows
    (last-non-null backward, first-non-null forward) and the
    interpolation projection run. The interpolation weight uses
    integer hour differences cast to double, and the surrounding
    values are deterministic decimal AVGs, so the float expression
    evaluates identically in Spark and DuckDB; the scaled-integer
    floor (x*1e6 + 0.5) seals it at 6 dp without either engine's
    ROUND-on-double tie behavior.

    At 100 TB the hourly pre-aggregate is the load-bearing move: the
    windows run over |types| x |hours| rows, independent of raw
    event count.
    """
    ev = load(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(davg("value").alias("v")))
    spine = (hourly.groupBy("event_type")
             .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
             .select("event_type",
                     F.explode(F.sequence(
                         "mn", "mx",
                         F.expr("INTERVAL 1 HOUR"))).alias("h")))
    j = spine.join(hourly, ["event_type", "h"], "left")
    wb = (Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    h_if_v = F.when(F.col("v").isNotNull(), F.col("h"))
    c = j.select(
        "event_type", "h", "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(h_if_v, ignorenulls=True).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(h_if_v, ignorenulls=True).over(wf).alias("nh"))
    frac = (F.expr("timestampdiff(HOUR, ph, h)").cast("double")
            / F.expr("timestampdiff(HOUR, ph, nh)").cast("double"))
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(F.col("pv").isNotNull() & F.col("nv").isNotNull(),
               F.col("pv") + (F.col("nv") - F.col("pv")) * frac))
    # 6-dp seal via scaled-integer floor, not ROUND: both engines'
    # ROUND(double, n) disagree by 1 ulp on binary near-ties (a
    # round-9 sf1 sweep catch — interpolation fractions like k/16
    # are binary-exact and land on .xxxxxx5 boundaries); floor of
    # x*1e6 + 0.5 is pure IEEE arithmetic, bit-identical everywhere.
    return c.select("event_type", F.col("h").alias("bucket_hour"),
                    (F.floor(interp * F.lit(1000000.0) + F.lit(0.5))
                     / F.lit(1000000.0)).alias("v_interp"))


@register(
    "agg_time_bucket_multi",
    oracle=f"""
    SELECT 'day' AS granularity, date_trunc('day', ts) AS bucket_start,
           COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM events GROUP BY date_trunc('day', ts)
    UNION ALL
    SELECT 'week', date_trunc('week', ts),
           COUNT(*), {dsum_sql('value')}
    FROM events GROUP BY date_trunc('week', ts)
    UNION ALL
    SELECT 'month', date_trunc('month', ts),
           COUNT(*), {dsum_sql('value')}
    FROM events GROUP BY date_trunc('month', ts)
    """,
    tags=("timeseries", "agg", "groupingsets"),
)
def agg_time_bucket_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: day, week and
    month buckets of the event stream in ONE pass.

    The oracle states the semantics as three scans UNION ALL'd; the
    engine answers it with a single scan + one Expand (GROUPING
    SETS over the three pre-computed truncations) + one hash
    aggregate — the same plan shape agg_cube pins, so adding a
    granularity adds a 1x row replication, not a rescan of 100 TB.
    GROUPING() disambiguates which truncation each output row
    belongs to; the decimal accumulator keeps the three sums exactly
    mergeable with the single-granularity twins.
    """
    ev = load(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("w"),
        F.date_trunc("month", "ts").alias("m"),
        "value").createOrReplaceTempView("ev_buckets")
    return spark.sql("""
        SELECT CASE WHEN GROUPING(d) = 0 THEN 'day'
                    WHEN GROUPING(w) = 0 THEN 'week'
                    ELSE 'month' END AS granularity,
               COALESCE(d, w, m) AS bucket_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_value
        FROM ev_buckets
        GROUP BY GROUPING SETS ((d), (w), (m))
    """)


@register(
    "win_streak_longest",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), g AS (
      SELECT user_id, d,
             date_diff('day', TIMESTAMP '2024-01-01 00:00:00', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
      FROM days
    ), isl AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id, MAX(len) AS longest_streak
    FROM isl GROUP BY user_id
    """,
    tags=("timeseries", "window", "gaps-islands"),
)
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user (the
    engagement-streak query), by the gaps-and-islands identity:
    day_number - row_number is constant exactly within a run of
    consecutive days.

    Shape: distinct (user, day) first — a map-side-combined hash agg
    that shrinks raw events to at most users x days — then one
    user-partitioned window for the row numbers and two more hash
    aggregates. The island key is pure BIGINT arithmetic (days since
    a fixed epoch minus the rank), so both engines agree exactly.
    Everything after the distinct is bounded by user-days, not
    events.
    """
    ev = load(spark, sf_dir, "events")
    days = (ev.select("user_id",
                      F.date_trunc("day", "ts").alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.select(
        "user_id", "d",
        (F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
         .cast("long")
         - F.row_number().over(w)).alias("grp"))
    return (g.groupBy("user_id", "grp")
            .agg(F.count("*").alias("len"))
            .groupBy("user_id")
            .agg(F.max("len").alias("longest_streak")))


@register(
    "anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT event_type, COUNT(value) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))
                           * CAST(value AS DECIMAL(18,4)))
                       AS DECIMAL(38,4)) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - m.s1 / m.n)
                 / sqrt(GREATEST(
                     m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n), 0.0)),
                 4) AS z
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE ABS((e.value - m.s1 / m.n)
              / sqrt(GREATEST(
                  m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n), 0.0))) > 3
    """,
    tags=("timeseries", "stats"),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score anomaly flags: events whose value sits
    more than 3 standard deviations from their type's mean.

    The moments come from exact DECIMAL power sums (the
    agg_stats_moments technique): s1 at scale 4 and s2 reduced from
    scale 8 to 4 before the double cast — the scale-8 digits of a
    2-decimal value's square are zeros, so the reduction is exact
    and both engines see identical doubles; mean/variance/sqrt then
    evaluate identically (sqrt is IEEE-correctly-rounded in both),
    making even the |z| > 3 boundary deterministic. (The scale-4 sum
    image stays under 2^53 through sf10; beyond that widen to
    DECIMAL(38,*) per functions/numeric.py's rule.)

    Shape: a 5-row moments aggregate broadcast back onto the scan —
    flagging is a second pass over the fact but never a second
    shuffle of it.
    """
    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,4)")
    m = (ev.groupBy("event_type")
         .agg(F.count("value").alias("n"),
              F.sum(dec).cast("double").alias("s1"),
              F.sum(dec * dec).cast("decimal(38,4)").cast("double")
              .alias("s2")))
    mean = F.col("s1") / F.col("n")
    # Constant-group guards: (1) clamp the variance at 0 — exact
    # sums can land a 1-ULP-negative double after s2/n - mean²,
    # where DuckDB's sqrt ERRORS and Spark's returns NaN (and NaN
    # compares greater than 3, emitting every row of the group);
    # (2) divide with try_divide — under ANSI (this session's
    # default) a plain /0 on the zero-variance group kills the job,
    # while try_divide yields NULL, matching DuckDB's NULL, and the
    # filter drops the group.
    z = F.try_divide(
        F.col("value") - mean,
        F.sqrt(F.greatest(
            F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))))
    return (ev.join(F.broadcast(m), "event_type")
            .filter(F.abs(z) > 3)
            .select("event_id", "event_type", "value",
                    F.round(z, 4).alias("z")))


@register(
    "cdc_apply_changelog",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC)
               AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id,
           event_type AS last_event_type,
           value AS last_value, ts AS last_ts
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("timeseries", "cdc", "agg"),
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the event stream as a CDC changelog keyed on user_id:
    the latest record (by ts, tie-broken on event_id) wins, and a
    final 'error' record is a tombstone that deletes the key — the
    materialized current-state table a MERGE-on-read sink maintains.

    The oracle states it as a ROW_NUMBER window; the engine computes
    it as a single MAX_BY hash aggregate on a struct ordering key
    (ts, event_id) — map-side combined, no per-user sort, no window
    state. That is the difference at 100 TB: the aggregate carries
    ONE candidate row per key per partition through the shuffle,
    where the window form must sort every key's full history. The
    tombstone filter runs after the aggregate (on |keys| rows).
    """
    ev = load(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    last = (ev.groupBy("user_id")
            .agg(F.max_by(F.struct("event_id", "event_type",
                                   "value", "ts"),
                          ordkey).alias("s")))
    return (last.filter(F.col("s.event_type") != "error")
            .select("user_id",
                    F.col("s.event_id").alias("last_event_id"),
                    F.col("s.event_type").alias("last_event_type"),
                    F.col("s.value").alias("last_value"),
                    F.col("s.ts").alias("last_ts")))


@register(
    "join_interval_overlap",
    oracle="""
    SELECT v.event_id AS view_id, COUNT(*) AS n_purchases
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND CAST(epoch_us(p.ts) AS DOUBLE)
           >= CAST(epoch_us(v.ts) AS DOUBLE)
     AND CAST(epoch_us(p.ts) AS DOUBLE)
           < CAST(epoch_us(v.ts) AS DOUBLE)
             + LEAST(v.value, 1440.0) * 60000000.0
    GROUP BY v.event_id
    """,
    tags=("join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length interval containment join: each view opens an
    attention window of `value` minutes; count the same user's
    purchases inside it.

    join_range_theta banded FIXED-length (1 h) intervals with a
    2-bucket explode; variable-length intervals need the general
    form — each interval replicates to every hour bucket it covers
    (``sequence`` over its own span), while the instant side keeps
    its single bucket, so every true pair meets in EXACTLY one
    (user, bucket) cell and no dedup is needed. Window length is
    CLAMPED at 24 h in the semantics (oracle too): without the
    clamp, one corrupt duration row would make ``sequence`` build a
    multi-million-element array and OOM its executor — the
    replication bound must be enforced, not assumed (real data here
    tops out ~8 h → ≤9 buckets, unchanged by the clamp); the join
    itself stays a plain shuffled equi-join on (user_id, bucket)
    with the containment predicate as residual.

    Time arithmetic parity: both sides compare exact epoch-microsec
    integers lifted to DOUBLE (all < 2^53, so exact) and the only
    rounding — value x 6e7 — is the same IEEE multiply in both
    engines; no double→int cast whose rounding mode could differ.
    """
    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: derive epoch-µs by wall-clock arithmetic
    # (unix_micros wants TIMESTAMP and would drag session-timezone
    # semantics in; timestampdiff matches DuckDB's epoch_us exactly).
    us = F.expr("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").cast("double")
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_id"),
                     "user_id",
                     us.alias("v_us"),
                     # clamp [0, 1440] min: a negative corrupt value
                     # would otherwise make sequence() DESCEND over
                     # an unbounded bucket range (empty window either
                     # way — the oracle's negative v_end matches no
                     # purchase)
                     (us + F.greatest(
                         F.least(F.col("value"), F.lit(1440.0)),
                         F.lit(0.0)) * 60000000.0).alias("v_end")))
    views = views.withColumn(
        "bkt",
        F.explode(F.sequence(
            F.floor(F.col("v_us") / 3600000000.0),
            F.floor(F.col("v_end") / 3600000000.0))))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", us.alias("p_us"))
                 .withColumn("bkt",
                             F.floor(F.col("p_us") / 3600000000.0)))
    cond = ((F.col("p_us") >= F.col("v_us"))
            & (F.col("p_us") < F.col("v_end")))
    return (views.join(purchases, ["user_id", "bkt"])
            .filter(cond)
            .groupBy("view_id")
            .agg(F.count("*").alias("n_purchases")))


EWMA_TAPS = 8  # FIR truncation depth (alpha = 0.5)


@register(
    "ts_ewma_truncated",
    oracle=f"""
    WITH cents AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ), seq AS (
      SELECT user_id, event_id,
             array_agg(c) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN {EWMA_TAPS - 1} PRECEDING
                                         AND CURRENT ROW) AS vals
      FROM cents
    )
    SELECT user_id, event_id,
           CAST(len(vals) AS INTEGER) AS n_taps,
           CAST(CAST(list_sum(list_transform(vals,
                  (x, i) -> x * (1::BIGINT << (i - 1)))) AS BIGINT)
                AS DOUBLE)
             / CAST(((1::BIGINT << len(vals)) - 1) * 100 AS DOUBLE)
             AS ewma
    FROM seq
    """,
    tags=("timeseries", "window"),
)
def ts_ewma_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{EWMA_TAPS}-tap exponentially-weighted moving average
    (alpha = 1/2) per user — EWMA truncated to a FIR so the window
    state is O(taps) instead of the full history (the recursive form
    is the streaming-stateful job's shape; a batch engine wants the
    bounded frame). With alpha = 1/2 the weights are powers of two,
    which makes the whole computation EXACT INTEGER arithmetic: the
    2-decimal values scale to BIGINT cents, each tap multiplies by
    2^(i-1) (newest tap heaviest), and the normalizer is the integer
    (2^n − 1)·100 — one IEEE double division at the very end, so the
    result is bit-identical cross-engine with no rounding convention
    and no float-summation-order hazard (integer sums commute).

    Scale shape: one window, bounded {EWMA_TAPS}-row frame, integer
    fold inside codegen — the win_sliding_avg regime.
    """
    ev = (load(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .withColumn("c", F.round(F.col("value") * 100).cast("long")))
    w = (Window.partitionBy("user_id")
         .orderBy(F.asc_nulls_last("ts"), "event_id")
         .rowsBetween(-(EWMA_TAPS - 1), Window.currentRow))
    ev = ev.withColumn("vals", F.collect_list("c").over(w))
    num = F.expr("aggregate(transform(vals, (x, i) -> x * shiftleft(1L, i)), "
                 "0L, (a, v) -> a + v)")
    # shiftleft's python wrapper wants a literal bit count; the
    # size(vals)-dependent shift must go through the SQL parser
    den = F.expr("CAST((shiftleft(1L, size(vals)) - 1) * 100 AS DOUBLE)")
    return ev.select(
        "user_id", "event_id",
        F.size("vals").cast("int").alias("n_taps"),
        (num.cast("double") / den).alias("ewma"))
