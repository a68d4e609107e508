"""Statistical aggregates (SURVEY.md §2.4 extension rows).

The reference's only statistics are counts and success ratios
(web_scrpaer_2.py:461-462, web_scraper.py:339-346); exact
percentiles and second-moment statistics are [E] rows the driver
tables exercise. Both are single-shuffle hash aggregates with
map-side partials — the moments are computed from exact decimal
power sums so the final double arithmetic is bit-identical across
engines (same trick as ``functions/numeric.py``: decimal
accumulation is order-insensitive, so neither partition count nor
merge order can flake the oracle hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.numeric import dec, dsum, dsum_sql
from ..registry import register


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group.

    ``F.percentile`` sorts within the aggregation buffer — fine at
    per-group scale; for 100 TB hot paths the engine's scale path is
    ``F.approx_percentile`` (t-digest-style sketch, mergeable
    map-side partials), which trades exactness for a bounded-memory
    one-pass plan. Both share this query's shape; the exact form is
    the oracled baseline.
    """
    li = load(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.lit([0.25, 0.50, 0.75]))
    return (li.groupBy("l_returnflag")
            .agg(pct.alias("pcts"))
            .select("l_returnflag",
                    F.round(F.element_at("pcts", 1), 6).alias("p25"),
                    F.round(F.element_at("pcts", 2), 6).alias("p50"),
                    F.round(F.element_at("pcts", 3), 6).alias("p75")))


# Both engines compute the SAME double expressions over the SAME
# exact decimal power sums; ROUND(…, 6) seals the last digits. The
# scale-8 power sums are reduced to scale 4 before the double cast.
# Honest envelope note: the price sum-of-squares' scale-4 integer
# image exceeds 2^53 from ~sf0.01 up, where DuckDB's
# int128→double→÷10^4 conversion can double-round 1 ULP apart from
# Spark's single BigDecimal rounding — a residual risk ROUND(,6)
# absorbs unless a statistic lands exactly on a 6th-decimal round
# boundary (a scale-0 reduction was tried and REJECTED: the two
# engines disagree on the half-case of the scale-reducing cast
# itself, a bigger divergence than the one being fixed).
# Single-row groups: every (n-1) / zero-variance expression is
# CASE-gated to NULL on BOTH sides — under ANSI, Spark otherwise
# ABORTS on the double /0 while DuckDB returns NULL (and sqrt of a
# negative errors DuckDB) — a crash-vs-result divergence.
_MOMENTS_ORACLE = """
WITH sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_quantity AS DECIMAL(19,4)))
                   AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                       * CAST(l_extendedprice AS DECIMAL(19,4)))
                   AS DECIMAL(38,4)) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                       * CAST(l_extendedprice AS DECIMAL(19,4)))
                   AS DECIMAL(38,4)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(sx / n, 6) AS avg_qty,
       CASE WHEN n > 1 THEN
         ROUND((sxx - sx * sx / n) / (n - 1), 6) END AS var_qty,
       CASE WHEN n > 1 THEN
         ROUND(SQRT(GREATEST((sxx - sx * sx / n) / (n - 1), 0.0)), 6)
       END AS stddev_qty,
       CASE WHEN n > 1 THEN
         ROUND((sxy - sx * sy / n) / (n - 1), 6) END AS covar_qty_price,
       CASE WHEN n > 1 THEN
         ROUND((n * sxy - sx * sy)
               / (SQRT(GREATEST(n * sxx - sx * sx, 0.0))
                  * SQRT(GREATEST(n * syy - sy * sy, 0.0))), 6)
       END AS corr_qty_price
FROM sums
"""


@register("agg_stats_moments", oracle=_MOMENTS_ORACLE, tags=("agg", "stats"))
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / covariance / correlation per group, from
    exact power sums.

    Native ``F.var_samp``/``F.corr`` use streaming (Welford-merge)
    accumulators whose float results depend on partition merge order
    — unreproducible across cluster sizes. Power sums in exact
    DECIMAL are order-insensitive and still map-side combined (six
    decimal partials per group per partition), so the plan is the
    same single shuffle but the answer is deterministic at any
    parallelism — the property that matters when a 100 TB job's
    output feeds a regression test.
    """
    li = load(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("decimal(38,4)").cast("double").alias("sxx"),
        F.sum(y * y).cast("decimal(38,4)").cast("double").alias("syy"),
        F.sum(x * y).cast("decimal(38,4)").cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    multi = F.col("n") > 1
    var_ = (sxx - sx * sx / n) / (n - 1)
    cov_ = (sxy - sx * sy / n) / (n - 1)
    corr_den = (F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
                * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0))))
    return sums.select(
        "l_returnflag",
        F.round(sx / n, 6).alias("avg_qty"),
        F.when(multi, F.round(var_, 6)).alias("var_qty"),
        F.when(multi, F.round(F.sqrt(F.greatest(var_, F.lit(0.0))), 6))
        .alias("stddev_qty"),
        F.when(multi, F.round(cov_, 6)).alias("covar_qty_price"),
        F.when(multi,
               F.round(F.try_divide(n * sxy - sx * sy, corr_den), 6))
        .alias("corr_qty_price"))


@register("agg_approx_percentile", oracle=None, tags=("agg", "stats",
                                                      "approx"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's mergeable quantile sketch
    (Greenwald-Khanna summaries) — the 100 TB path where the exact
    variant's per-group sort buffer is prohibitive: each task builds
    a bounded-size summary, merges are associative, and the shuffle
    carries sketches instead of values. accuracy=10000 bounds rank
    error at 1/10000 of the group. Rows-only (sketch output is
    engine-specific); tests pin each estimate within rank tolerance
    of the exact percentile."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.25), F.lit(10000))
        .alias("p25"),
        F.approx_percentile("l_extendedprice", F.lit(0.50), F.lit(10000))
        .alias("p50"),
        F.approx_percentile("l_extendedprice", F.lit(0.75), F.lit(10000))
        .alias("p75"))


# Both engines bucket with IDENTICAL double arithmetic (no
# width_bucket: DuckDB lacks it, and hand-rolled floor keeps the
# expression bit-identical). Bounds are fixed constants, so the
# histogram is ONE pass — a data-dependent range would force a
# min/max pre-pass or a sampled approximation.
_HIST_LO, _HIST_WIDTH, _HIST_BINS = 0.0, 5000.0, 24

_HIST_ORACLE = f"""
SELECT LEAST(GREATEST(CAST(FLOOR((l_extendedprice - {_HIST_LO})
                                 / {_HIST_WIDTH}) AS BIGINT),
                      0), {_HIST_BINS - 1}) AS bin,
       LEAST(GREATEST(CAST(FLOOR((l_extendedprice - {_HIST_LO})
                                 / {_HIST_WIDTH}) AS BIGINT),
                      0), {_HIST_BINS - 1}) * {_HIST_WIDTH} AS bin_lo,
       COUNT(*) AS n_rows,
       {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem GROUP BY 1, 2
"""


@register("num_histogram_fixed", oracle=_HIST_ORACLE, tags=("agg", "stats"))
def num_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (equi-width bins over a constant range,
    clamped at both ends) — the one-pass distribution profile every
    ingest monitor wants.

    Bin assignment is a per-row scalar expression, so the whole query
    is scan → project → single hash aggregate with map-side partials:
    at 100 TB it reads each value once and shuffles |bins| rows per
    task. Compare ``win_ntile`` (equi-DEPTH bins), which must
    globally sort; equi-width is the cheap, shuffle-light profile.
    """
    li = load(spark, sf_dir, "lineitem")
    raw = F.floor((F.col("l_extendedprice") - F.lit(_HIST_LO))
                  / F.lit(_HIST_WIDTH))
    bin_ = F.least(F.greatest(raw, F.lit(0)),
                   F.lit(_HIST_BINS - 1)).cast("bigint")
    return (li.select(bin_.alias("bin"), "l_extendedprice")
            .withColumn("bin_lo", F.col("bin") * F.lit(_HIST_WIDTH))
            .groupBy("bin", "bin_lo")
            .agg(F.count("*").alias("n_rows"),
                 dsum("l_extendedprice").alias("sum_price")))
