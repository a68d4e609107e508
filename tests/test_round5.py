"""Round-5 regression pins: de-vacuated coverage (the round-3/4
verdicts' top findings), the vacuous-empty guard itself, the
near-dup edge source in dedup_clusters, and the real PPM/PGM/BMP
codec behind the multimodal seam."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.testing import compare

load_all_operators()


def run(name, spark, d):
    return REGISTRY[name].fn(spark, d)


# ---------------------------------------------------------------
# join_groupwise_max: 1995-Q1 window is non-vacuous on driver data,
# and ties at the max ALL surface (Q15 semantics).

def test_groupwise_max_nonvacuous_on_driver_data(spark, sf_dir):
    """The round-3/4 verdicts flagged the old 1994-Q1 window as
    selecting 0 rows (driver l_shipdate starts 1995-01-02), making
    the green oracle vacuous. Pin the fixed window to real rows."""
    rows = run("join_groupwise_max", spark, sf_dir).collect()
    assert len(rows) >= 1
    assert all(r.total_revenue > 0 for r in rows)


def test_groupwise_max_surfaces_all_tied_suppliers(spark, tmp_path):
    """Two suppliers tied at the quarterly max must BOTH return;
    a higher-revenue supplier outside the window must not leak in
    (the filter really gates the aggregate)."""
    li_rows = [
        # (orderkey, suppkey, extendedprice, discount, shipdate)
        (1, 10, 100.0, 0.0, "1995-02-01"),   # supp 10: 100 in-window
        (2, 20, 50.0, 0.0, "1995-02-02"),    # supp 20: 100 in-window
        (3, 20, 50.0, 0.0, "1995-03-15"),    #   (two items, same total)
        (4, 30, 40.0, 0.0, "1995-01-10"),    # supp 30: below max
        (5, 40, 999.0, 0.0, "1996-06-01"),   # supp 40: out of window
    ]
    li = spark.createDataFrame(
        li_rows, "l_orderkey bigint, l_suppkey bigint, "
                 "l_extendedprice double, l_discount double, sd string"
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
             F.to_timestamp("sd").alias("l_shipdate"))
    sup = spark.createDataFrame(
        [(k, f"Supplier#{k}") for k in (10, 20, 30, 40)],
        "s_suppkey bigint, s_name string")
    d = str(tmp_path / "gm")
    li.write.parquet(f"{d}/lineitem.parquet")
    sup.write.parquet(f"{d}/supplier.parquet")
    out = run("join_groupwise_max", spark, d).collect()
    assert {(r.s_suppkey, r.total_revenue) for r in out} == {
        (10, 100.0), (20, 100.0)}


# ---------------------------------------------------------------
# join_anti: non-vacuous on driver data + planted unmatched-left pin.

def test_join_anti_nonvacuous_on_driver_data(spark, sf_dir):
    """Old form anti-joined against ALL orders — every test customer
    has one, so it was green-by-emptiness. The URGENT-filtered form
    must return real rows."""
    assert run("join_anti", spark, sf_dir).count() > 0


def test_join_anti_planted_customers_without_urgent(spark, tmp_path):
    cust = spark.createDataFrame(
        [(1, "has-urgent"), (2, "has-low-only"), (3, "no-orders")],
        "c_custkey bigint, c_name string")
    orders = spark.createDataFrame(
        [(100, 1, "1-URGENT"), (101, 2, "5-LOW")],
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string")
    d = str(tmp_path / "anti")
    cust.write.parquet(f"{d}/customer.parquet")
    orders.write.parquet(f"{d}/orders.parquet")
    out = {r.c_custkey for r in run("join_anti", spark, d).collect()}
    assert out == {2, 3}


# ---------------------------------------------------------------
# The vacuous-empty guard: both-engines-empty oracled results FAIL
# when the sweep flag is on, still pass when it is off.

def test_compare_flags_vacuous_empty(spark, sf_dir):
    df = run("filter_eq", spark, sf_dir).filter(F.lit(False))
    sql = "SELECT o_orderkey FROM orders WHERE 1 = 0"
    # force identical schema: take the oracle's single column
    df = df.select(F.col(df.columns[0]).alias("o_orderkey")).limit(0)
    ok, msg = compare(df, sql, sf_dir, "t", fail_on_empty=True)
    assert not ok and "VACUOUS" in msg
    ok, _ = compare(df, sql, sf_dir, "t", fail_on_empty=False)
    assert ok


# ---------------------------------------------------------------
# dedup_clusters: near-dup edges are now in the default edge set.

def test_dedup_clusters_merges_neardup_with_exact(spark, tmp_path):
    """An exact-dup pair that is ALSO near-dup-linked to a third doc
    must collapse into one 3-doc cluster — only possible if minhash
    pair edges feed the CC alongside exact star edges."""
    base = "the quick brown fox jumps over the lazy dog again and again " \
           "while the river runs south past the old stone mill each day"
    near = base.replace("stone", "brick")  # high-overlap variant
    rows = [(0, base), (1, base), (2, near), (3, "zz yy xx ww vv uu")]
    d = str(tmp_path / "cc")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.parquet(f"{d}/documents.parquet")
    out = run("dedup_clusters", spark, d).collect()
    by_doc = {r.doc_id: r.cluster_id for r in out}
    assert set(by_doc) == {0, 1, 2}
    assert len({by_doc[0], by_doc[1], by_doc[2]}) == 1
    assert all(r.cluster_size == 3 for r in out)


def test_dedup_clusters_nonvacuous_on_driver_data(spark, sf_dir):
    """Driver corpora contain no exact-dup texts (verdict-verified),
    so the old exact-only edge source made the registered query emit
    0 rows outside unit tests. The union edge source must produce
    real clusters on driver data."""
    assert run("dedup_clusters", spark, sf_dir).count() > 0


# ---------------------------------------------------------------
# Real codec: PPM/PGM/BMP decode, and the Spark feature pass using it.

def _ppm(w, h, pixel):
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + \
        bytes([pixel]) * (w * h * 3)


def _bmp(w, h, pixel):
    row = bytes([pixel]) * (w * 3)
    stride = (w * 3 + 3) & ~3
    raster = b"".join(row + b"\x00" * (stride - len(row))
                      for _ in range(h))
    pix_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", pix_off + len(raster), 0, 0,
                                  pix_off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    return header + raster


def test_decode_real_ppm_pgm_bmp():
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import decode_real
    s, w, h = decode_real(_ppm(4, 3, 7), "ppm")
    assert (w, h) == (4, 3) and s == 4 * 3 * 3 * 7
    pgm = b"P5\n2 2\n255\n" + bytes([9, 9, 9, 9])
    assert decode_real(pgm, "pgm") == (36, 2, 2)
    s, w, h = decode_real(_bmp(3, 2, 5), "bmp")
    # padding bytes excluded from the sum
    assert (w, h) == (3, 2) and s == 3 * 2 * 3 * 5


def test_decode_real_rejects_truncated_and_unknown():
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import CORRUPT_SENTINEL, decode, decode_real, decode_stub
    with pytest.raises(ValueError):
        decode_real(_ppm(4, 3, 7)[:-1], "ppm")
    with pytest.raises(ValueError):
        decode_real(b"P3\n2 2\n255\n0 0 0 0", "ppm")  # ASCII PNM
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff", "jpeg")
    # dispatcher: stub for library-only formats, sentinel (NOT
    # stub-fabricated geometry, NOT an exception) for corrupt
    # payloads of supported formats (jpeg joined REAL_FMTS in r9)
    assert decode(b"abc", "jpeg") == CORRUPT_SENTINEL
    assert decode(b"abc", "mp3") == decode_stub(b"abc", "mp3")
    assert decode(_ppm(4, 3, 7)[:-1], "ppm") == CORRUPT_SENTINEL
    assert decode(b"not a bitmap", "bmp") == CORRUPT_SENTINEL


def test_extract_features_decodes_planted_binaries(spark):
    """The production mapInPandas pass must route PPM/BMP payloads
    through the real codec (exact pixel geometry out) and 'txt'
    payloads through the stub — in one Arrow batch."""
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import ASSET_SCHEMA, decode_stub, extract_features
    ppm, bmp, txt = _ppm(8, 5, 3), _bmp(6, 4, 2), b"hello world"
    rows = [(1, ppm, ("ppm", len(ppm), "unit")),
            (2, bmp, ("bmp", len(bmp), "unit")),
            (3, txt, ("txt", len(txt), "unit"))]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r.asset_id: r for r in
           extract_features(assets).collect()}
    assert (out[1].fake_width, out[1].fake_height) == (8, 5)
    assert out[1].byte_sum == 8 * 5 * 3 * 3
    assert (out[2].fake_width, out[2].fake_height) == (6, 4)
    assert out[2].byte_sum == 6 * 4 * 3 * 2
    assert (out[3].byte_sum, out[3].fake_width, out[3].fake_height) \
        == decode_stub(txt, "txt")


# ---------------------------------------------------------------
# date_arith_interval: exact int64 schema vs the DuckDB oracle.

def test_date_arith_days_since_is_long(spark, sf_dir):
    df = run("date_arith_interval", spark, sf_dir)
    assert dict(df.dtypes)["days_since_95"] == "bigint"


# ---------------------------------------------------------------
# Codec property tests: any well-formed PNM/BMP the generators can
# produce decodes to exact geometry and raster sum.

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 20), h=st.integers(1, 20),
       data=st.data())
def test_ppm_decode_roundtrip_property(w, h, data):
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import decode_real
    raster = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)))
    payload = b"P6 %d %d 255\n" % (w, h) + raster
    assert decode_real(payload, "ppm") == (sum(raster), w, h)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 12), h=st.integers(1, 12),
       data=st.data())
def test_bmp_decode_roundtrip_property(w, h, data):
    import struct as _s
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import decode_real
    rows = [bytes(data.draw(st.lists(st.integers(0, 255),
                                     min_size=w * 3, max_size=w * 3)))
            for _ in range(h)]
    stride = (w * 3 + 3) & ~3
    raster = b"".join(r + b"\xAA" * (stride - len(r)) for r in rows)
    pix_off = 14 + 40
    payload = (b"BM" + _s.pack("<IHHI", pix_off + len(raster), 0, 0,
                               pix_off)
               + _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(raster), 0, 0, 0, 0) + raster)
    s, gw, gh = decode_real(payload, "bmp")
    # padding bytes (0xAA) must NOT leak into the sum
    assert (gw, gh) == (w, h) and s == sum(sum(r) for r in rows)


@settings(max_examples=40, deadline=None)
@given(payload=st.binary(max_size=64),
       fmt=st.sampled_from(["ppm", "pgm", "bmp", "jpeg", "mp3", "txt"]))
def test_decode_dispatch_never_raises_property(payload, fmt):
    """decode() must totalize: malformed/truncated payloads of any
    claimed format fall back to the stub (library-only formats) or
    the corrupt sentinel (supported formats), never crash the
    executor batch (IndexError/struct.error escaping a mapInPandas
    pass kills the whole task, not the row)."""
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import decode, decode_stub
    out = decode(payload, fmt)
    assert isinstance(out, tuple) and len(out) == 3
    if fmt in ("mp3", "txt"):
        assert out == decode_stub(payload, fmt)


# ---------------------------------------------------------------
# Direct pins for the two rows-only queries no test ran by name.

def test_ord_scan_documents_arities(spark, golden_files):
    """Bronze scan: one row per reaction element, arities consistent
    with the raw reader (n_outputs ≥ 0; success flags boolean;
    row count equals the reader's element count)."""
    from open_reaction_database_web_scraper_spark.operators.ord_queries \
        import GOLDEN_GLOB
    from open_reaction_database_web_scraper_spark.sources.ord import (
        read_ord_documents)
    out = run("ord_scan_documents", spark, "unused").collect()
    n_raw = read_ord_documents(spark, GOLDEN_GLOB).count()
    assert len(out) == n_raw > 0
    # empty-dataset placeholder rows carry NULL inputs (the
    # posexplode_outer shape) — every real row has both arities
    assert all(r.n_input_tabs is None or r.n_input_tabs >= 0
               for r in out)
    assert all(r.n_outcomes >= 0 for r in out)
    assert any(r.n_input_tabs is not None and r.n_input_tabs > 0
               for r in out)
    assert all(r.success in (True, False, None) for r in out)


def test_multimodal_columns_query_roundtrip(spark, tmp_path):
    """The registered query end-to-end: planted documents survive the
    parquet round-trip and the stub features match the text bytes
    exactly (fmt 'txt' routes through the stub)."""
    rows = [(1, "abc", "en", "web", 3), (2, "", "en", "web", 0),
            (3, "héllo", "fr", "web", 5)]
    d = str(tmp_path / "mm")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, "
              "source string, n_chars bigint") \
        .write.parquet(f"{d}/documents.parquet")
    out = {r.asset_id: r for r in
           run("multimodal_columns", spark, d).collect()}
    assert set(out) == {1, 2, 3}
    for doc_id, text in ((1, "abc"), (2, ""), (3, "héllo")):
        payload = text.encode("utf-8")
        r = out[doc_id]
        assert r.n_bytes == len(payload)
        assert r.byte_sum == sum(payload)
        assert r.fmt == "txt"


def test_decode_rejects_degenerate_geometry_fast():
    """Zero-area headers are corrupt (sentinel, not fabricated
    geometry), and a forged h=2^31 BMP header must fail in O(1) —
    not spin billions of empty loop iterations inside an executor
    (caught in round-5 self-review by direct execution)."""
    import struct as _s
    import time
    from open_reaction_database_web_scraper_spark.operators.multimodal \
        import CORRUPT_SENTINEL, decode
    assert decode(b"P6 99999999999 0 255\n", "ppm") == CORRUPT_SENTINEL
    assert decode(b"P6 0 5 255\n", "ppm") == CORRUPT_SENTINEL
    forged = (b"BM" + _s.pack("<IHHI", 60, 0, 0, 54)
              + _s.pack("<IiiHHIIiiII", 40, 0, 2**31 - 1, 1, 24, 0,
                        0, 0, 0, 0, 0))
    t0 = time.time()
    assert decode(forged, "bmp") == CORRUPT_SENTINEL
    forged_neg = (b"BM" + _s.pack("<IHHI", 60, 0, 0, 54)
                  + _s.pack("<IiiHHIIiiII", 40, 1, -(2**31), 1, 24, 0,
                            0, 0, 0, 0, 0))
    assert decode(forged_neg, "bmp") == CORRUPT_SENTINEL
    assert time.time() - t0 < 1.0


def test_decode_ppm_query_null_and_empty_text(spark, tmp_path):
    """multimodal_decode_ppm must agree with its oracle even for
    NULL/empty document text (COALESCE both sides): a NULL text
    payload is a VALID empty-string PPM, not the corrupt sentinel."""
    rows = [(1, "real text here"), (2, None), (3, "")]
    d = str(tmp_path / "nulldoc")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("web")) \
        .withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))).cast("long")) \
        .write.parquet(f"{d}/documents.parquet")
    spec = REGISTRY["multimodal_decode_ppm"]
    ok, msg = compare(spec.fn(spark, d), spec.oracle, d,
                      "multimodal_decode_ppm", fail_on_empty=True)
    assert ok, msg


def test_decode_ppm_plan_single_python_stage(spark, sf_dir):
    """multimodal_decode_ppm's payload CONSTRUCTION (sha2/substring/
    concat) must stay JVM-side: exactly ONE Python crossing (the
    Arrow mapInPandas decode), zero row-at-a-time BatchEvalPython,
    no exchange at all (pure per-row pipeline — at 100 TB this runs
    map-only over the scan partitions)."""
    df = REGISTRY["multimodal_decode_ppm"].fn(spark, sf_dir)
    simple = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert simple.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    # codegen'd stages are starred in the simple rendering; the
    # payload-construction Project must be one of them
    import re
    assert re.search(r"\*\(\d+\) Project", simple)


def test_dedup_clusters_plan_has_no_cartesian(spark, sf_dir):
    """The union edge source must not introduce a nested-loop or
    cartesian join: every join in the clustering pipeline is an
    equi-join (LSH band equality, sha-hub equality, label id)."""
    df = REGISTRY["dedup_clusters"].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rolling_wau_matches_python_model(spark, tmp_path):
    """Third-implementation check for the cover-set rolling-WAU
    trick: a planted fixture with exact 7-day boundaries (day 1 is
    inside day 7's trailing window, outside day 8's), multi-day
    users (distinct, not summed), and a gap day (absent from the
    report — the spine only covers ACTIVE days) must match a direct
    python model computed from first principles."""
    import datetime as dt

    events = [  # (user, day-of-jan-2024)
        (1, 1), (2, 1), (1, 1),      # day 1: users {1,2}, dup event
        (1, 2),                      # day 2
        (3, 7),                      # day 7: window [1..7]
        (2, 8),                      # day 8: window [2..8] — day 1 out
        (1, 20),                     # isolated day after a gap
    ]
    rows = [(i, u, f"2024-01-{d:02d} 12:00:00", "e", 0.0, "{}")
            for i, (u, d) in enumerate(events)]
    d = str(tmp_path / "wau")
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string, "
              "event_type string, value double, props string") \
        .select("event_id", "user_id",
                F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value", "props") \
        .write.parquet(f"{d}/events.parquet")

    got = {r.day.date() if hasattr(r.day, "date") else r.day: r.wau
           for r in run("agg_rolling_active_users", spark, d).collect()}

    active = {(u, dt.date(2024, 1, day)) for u, day in events}
    days = sorted({day for _, day in active})
    model = {day: len({u for u, ad in active
                       if 0 <= (day - ad).days <= 6})
             for day in days}
    assert got == model
    # the fixture's load-bearing boundaries, stated explicitly:
    assert model[dt.date(2024, 1, 7)] == 3   # day 1 users still in
    assert model[dt.date(2024, 1, 8)] == 3   # {1 (day 2), 2, 3}; day-1
    #                                          activity aged out, but
    #                                          user 1 re-enters via day 2
    assert model[dt.date(2024, 1, 20)] == 1  # gap isolates the window
    assert dt.date(2024, 1, 9) not in got    # inactive days absent
