"""Property tests for the round-3 operators: Spark plan vs a
straight-line Python model under adversarial generated inputs
(duplicate (price, size) points, same-timestamp events, single-day
users, zero-length intervals). One Spark job per example.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()

_SETTINGS = settings(max_examples=15, deadline=None,
                     suppress_health_check=[
                         HealthCheck.too_slow,
                         HealthCheck.function_scoped_fixture])

T0 = datetime(2024, 1, 1)


# (price-cents, size) — tight domains force duplicates and
# band-boundary collisions (bands are 6.25 wide starting at 900)
points = st.lists(
    st.tuples(st.integers(min_value=90000, max_value=94500),
              st.integers(min_value=1, max_value=6)),
    min_size=1, max_size=40)


@given(pts=points)
@_SETTINGS
def test_skyline_matches_model_on_generated_points(
        spark, tmp_path_factory, pts):
    tmp = str(tmp_path_factory.mktemp("sky_prop"))
    df = spark.createDataFrame(
        [(i, f"p{i}", "B", "T", s, c / 100.0)
         for i, (c, s) in enumerate(pts)],
        "p_partkey bigint, p_name string, p_brand string, "
        "p_type string, p_size int, p_retailprice double")
    df.write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    uniq = {(c / 100.0, s) for c, s in pts}

    def dominated(p):
        return any(q[0] <= p[0] and q[1] >= p[1] and q != p
                   for q in uniq if q[0] < p[0] or q[1] > p[1])

    want = {p for p in uniq if not dominated(p)}
    got = {(r.p_retailprice, r.p_size)
           for r in REGISTRY["skyline_pareto"].fn(spark, tmp).collect()}
    assert got == want


# (user, day-offset) with repeats — streaks must ignore multiple
# events on the same day
activity = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),
              st.integers(min_value=0, max_value=15)),
    min_size=1, max_size=40)


@given(rows=activity)
@_SETTINGS
def test_streak_matches_model_on_generated_days(
        spark, tmp_path_factory, rows):
    tmp = str(tmp_path_factory.mktemp("streak_prop"))
    df = spark.createDataFrame(
        [(i, u, T0 + timedelta(days=d, hours=3), "x", 0.0, "{}")
         for i, (u, d) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    per_user = defaultdict(set)
    for u, d in rows:
        per_user[u].add(d)
    want = {}
    for u, ds in per_user.items():
        best = cur = 0
        prev = None
        for d in sorted(ds):
            cur = cur + 1 if prev is not None and d - prev == 1 else 1
            best = max(best, cur)
            prev = d
        want[u] = best
    got = {r.user_id: r.longest_streak
           for r in REGISTRY["win_streak_longest"].fn(spark, tmp)
           .collect()}
    assert got == want


# views: (user, start-minute, length-minutes incl. 0); purchases:
# (user, minute). Zero-length intervals must match nothing; a
# purchase exactly at interval start must match.
intervals = st.tuples(
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 300),
                       st.integers(0, 90)), min_size=0, max_size=15),
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 300)),
             min_size=0, max_size=15))


@given(vp=intervals)
@_SETTINGS
def test_interval_overlap_matches_model(spark, tmp_path_factory, vp):
    views, purchases = vp
    tmp = str(tmp_path_factory.mktemp("ivl_prop"))
    rows = []
    for i, (u, m, ln) in enumerate(views):
        rows.append((i, u, T0 + timedelta(minutes=m), "view",
                     float(ln), "{}"))
    for j, (u, m) in enumerate(purchases):
        rows.append((1000 + j, u, T0 + timedelta(minutes=m),
                     "purchase", 1.0, "{}"))
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    want = {}
    for i, (u, m, ln) in enumerate(views):
        n = sum(1 for (pu, pm) in purchases
                if pu == u and m <= pm < m + ln)
        if n:
            want[i] = n
    got = {r.view_id: r.n_purchases
           for r in REGISTRY["join_interval_overlap"].fn(spark, tmp)
           .collect()}
    assert got == want


# CDC: interleaved upserts and tombstones with duplicate timestamps —
# the (ts, event_id) tiebreak decides the survivor
changelog = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50),
              st.sampled_from(["view", "click", "error"])),
    min_size=1, max_size=30)


@given(rows=changelog)
@_SETTINGS
def test_cdc_matches_model_under_duplicate_ts(
        spark, tmp_path_factory, rows):
    tmp = str(tmp_path_factory.mktemp("cdc_prop"))
    df = spark.createDataFrame(
        [(i, u, T0 + timedelta(minutes=m), t, float(i), "{}")
         for i, (u, m, t) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    last = {}
    for i, (u, m, t) in enumerate(rows):
        k = (m, i)
        if u not in last or k > last[u][0]:
            last[u] = (k, t, i)
    want = {u: i for u, (_, t, i) in last.items() if t != "error"}
    got = {r.user_id: r.last_event_id
           for r in REGISTRY["cdc_apply_changelog"].fn(spark, tmp)
           .collect()}
    assert got == want


# quantization: arbitrary small float vectors incl. negatives and
# all-zero vectors
vectors = st.lists(
    st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False,
                       width=32),
             min_size=2, max_size=6),
    min_size=1, max_size=10)


@given(vecs=vectors)
@_SETTINGS
def test_quantize_roundtrip_error_bound(spark, tmp_path_factory, vecs):
    tmp = str(tmp_path_factory.mktemp("quant_prop"))
    # pad ragged vectors to equal length (parquet array col is fine
    # ragged, but the model is simpler fixed-width)
    width = max(len(v) for v in vecs)
    vecs = [v + [0.0] * (width - len(v)) for v in vecs]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    rows = REGISTRY["embedding_quantize_int8"].fn(spark, tmp).collect()
    import numpy as np
    for r in rows:
        v = float(np.float32(vecs[r.vec_id][r.dim - 1]))
        scale = max(abs(float(np.float32(x)))
                    for x in vecs[r.vec_id]) / 127
        if scale == 0:
            assert r.code is None
            continue
        assert -127 <= r.code <= 127
        assert abs(r.code - v / scale) <= 0.5 + 1e-9
        assert r.err <= scale / 2 + 1e-6
