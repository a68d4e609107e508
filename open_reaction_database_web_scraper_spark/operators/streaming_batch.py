"""Event-time windowed aggregations, batch mode (SURVEY.md §2.9).

``F.window`` / ``F.session_window`` produce identical results in
batch and streaming plans, so these run in batch; the genuinely
stateful behaviors (watermark drops, streaming dedup, rate-limited
ingest, foreachBatch retry, applyInPandasWithState) live in
``streaming/jobs.py`` as true readStream jobs, oracled on their
deterministic converged state.

Reference analogs: the incremental page-by-page crawl
(web_scrpaer_2.py:250-281) and politeness rate limit (:459).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.numeric import dsum, dsum_sql
from ..registry import register


@register(
    "stream_tumbling_count",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR
             AS window_end,
           event_type,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window counts per event type. The same expression under
    ``readStream`` is an incremental stateful aggregation; in batch
    it's a plain hash aggregate on the bucketed timestamp."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "cnt"))


@register(
    "stream_sliding_sum",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts)
             - j * INTERVAL '15 minutes' AS window_start,
           COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(j)
    GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 1-hour windows sliding every 15 minutes. Spark
    assigns each event to window/slide = 4 windows; the oracle
    reproduces that with an explicit offset grid."""
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "cnt", "sum_value"))


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             -- strict '>': Spark's session_window MERGES an event landing
      -- exactly at the current session's end (new start <= end),
      -- so only a gap STRICTLY greater than 30 min splits
      CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            + INTERVAL 30 MINUTE
                       OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30-minute inactivity gap).

    Boundary semantics, verified against the engine: Spark's
    ``session_window`` MERGES an event whose start is <= the current
    session's end — an event landing exactly at last_ts + gap stays
    in the session; only a STRICTLY larger gap splits. The oracle's
    lag-based sessionization therefore opens a new session on
    ``ts > prev + gap`` (an earlier ``>=`` form asserted the
    inverted boundary and only passed because the data had no
    exact-30-minute gaps; pinned by a boundary test now).
    """
    ev = load(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >  p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: every (purchase, click) pair of the
    same user with the click in the hour before the purchase — click
    attribution, the canonical stream-stream join. In Structured
    Streaming the identical join condition plus watermarks on both
    sides bounds the join state (clicks older than max_ts - 1h - wm
    are evicted); tests/test_streaming_equiv.py runs that streaming
    form and pins it to this batch result.

    Batch scale shape: same hour-bucket tightening as
    ``join_range_theta`` — joining on user_id alone would materialize
    the full per-user click×purchase product before the range
    residual; adding an hour-bucket equi key bounds generated pairs
    to ~2× the true matches. A click matching ``(p.ts - 1h, p.ts]``
    lives in the purchase's bucket or the previous one, each
    candidate pair in exactly one."""
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp("ts") / F.lit(3600))
    p = (ev.filter(F.col("event_type") == "purchase")
         .withColumn("bkt", F.explode(F.array(bucket - 1, bucket)))
         .alias("p"))
    c = (ev.filter(F.col("event_type") == "click")
         .withColumn("bkt", bucket).alias("c"))
    cond = ((F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.bkt") == F.col("c.bkt"))
            & (F.col("c.ts") <= F.col("p.ts"))
            & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR")))
    return (p.join(c, cond)
            .select(F.col("p.event_id").alias("purchase_id"),
                    F.col("c.event_id").alias("click_id"),
                    F.col("p.user_id").alias("user_id"),
                    F.col("p.ts").alias("purchase_ts"),
                    F.col("c.ts").alias("click_ts")))
