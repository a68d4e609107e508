"""Property tests for the stats operators: the power-sum moment
formulas and interpolated percentiles must agree with an independent
reference implementation (numpy) on random data — not just with the
DuckDB oracle, which shares the formulas by construction.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.functions.numeric import dec

_SETTINGS = settings(max_examples=10, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])

# 2-decimal values like the driver's synthetic numerics — the domain
# the decimal-accumulator idiom is exact for.
val2dp = st.integers(min_value=0, max_value=10_000_000).map(
    lambda c: c / 100.0)

pairs = st.lists(st.tuples(val2dp, val2dp), min_size=3, max_size=200)


def _moments_df(spark, data):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in data], "x double, y double")
    xx, yy = dec("x"), dec("y")
    sums = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xx).cast("double").alias("sx"),
        F.sum(yy).cast("double").alias("sy"),
        F.sum(xx * xx).cast("double").alias("sxx"),
        F.sum(yy * yy).cast("double").alias("syy"),
        F.sum(xx * yy).cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return sums.select(
        (sx / n).alias("mean_x"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_x"),
        ((sxy - sx * sy / n) / (n - 1)).alias("cov_xy"),
    ).collect()[0]


@given(pairs)
@_SETTINGS
def test_power_sum_moments_match_numpy(spark, data):
    """The power-sum var/cov identities (the ones agg_stats_moments
    uses) must agree with numpy's two-pass implementations to float
    tolerance on arbitrary 2-decimal data."""
    row = _moments_df(spark, data)
    xs = np.array([x for x, _ in data])
    ys = np.array([y for _, y in data])
    assert math.isclose(row["mean_x"], xs.mean(), rel_tol=1e-9,
                        abs_tol=1e-9)
    assert math.isclose(row["var_x"], xs.var(ddof=1), rel_tol=1e-6,
                        abs_tol=1e-6)
    assert math.isclose(row["cov_xy"],
                        float(np.cov(xs, ys, ddof=1)[0][1]),
                        rel_tol=1e-6, abs_tol=1e-6)


@given(st.lists(val2dp, min_size=2, max_size=100),
       st.sampled_from([0.25, 0.5, 0.75, 0.9]))
@_SETTINGS
def test_percentile_matches_numpy_linear(spark, values, q):
    """F.percentile's interpolation must equal numpy's 'linear'
    method (the quantile_cont definition agg_percentile_exact's
    oracle relies on)."""
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got = df.agg(F.percentile("v", F.lit(q)).alias("p")).collect()[0]["p"]
    want = float(np.percentile(np.array(values), q * 100,
                               method="linear"))
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9), (got, want)


def test_moments_degenerate_single_value(spark):
    """Constant column: variance 0, correlation undefined (NaN/null)
    — the formula must not produce garbage from negative round-off
    under the sqrt. Exact decimal sums make the radicand exactly 0."""
    data = [(5.0, 7.0)] * 10
    row = _moments_df(spark, data)
    assert row["var_x"] == 0.0
    assert row["cov_xy"] == 0.0


def test_moments_match_sf_data(spark, sf_dir):
    """agg_stats_moments on real driver data agrees with numpy
    computed over a pandas pull of the same rows."""
    from open_reaction_database_web_scraper_spark.registry import (
        REGISTRY,
        load_all_operators,
    )

    load_all_operators()
    out = {r["l_returnflag"]: r
           for r in REGISTRY["agg_stats_moments"].fn(spark, sf_dir).collect()}
    pdf = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
           .select("l_returnflag", "l_quantity", "l_extendedprice")
           .toPandas())
    for flag, g in pdf.groupby("l_returnflag"):
        got = out[flag]
        q = g["l_quantity"].to_numpy()
        p = g["l_extendedprice"].to_numpy()
        assert math.isclose(got["var_qty"], q.var(ddof=1),
                            rel_tol=1e-5, abs_tol=1e-5)
        assert math.isclose(got["corr_qty_price"],
                            float(np.corrcoef(q, p)[0][1]),
                            rel_tol=1e-5, abs_tol=1e-5)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """The sketch estimate must sit within 1% (relative) of the exact
    per-group percentile — far looser than the configured 1e-4 rank
    error, so only a broken sketch merge fails this."""
    import math

    from open_reaction_database_web_scraper_spark.registry import (
        REGISTRY,
        load_all_operators,
    )

    load_all_operators()
    approx = {r["l_returnflag"]: r
              for r in REGISTRY["agg_approx_percentile"]
              .fn(spark, sf_dir).collect()}
    exact = {r["l_returnflag"]: r
             for r in REGISTRY["agg_percentile_exact"]
             .fn(spark, sf_dir).collect()}
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25", "p50", "p75"):
            assert math.isclose(a[col], e[col], rel_tol=0.01), \
                (flag, col, a[col], e[col])
