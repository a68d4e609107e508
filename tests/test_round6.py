"""Round-6 additions: stdlib PNG codec behind the production decode
path, the portable polynomial text fingerprint, and the two
newly-oracled queries (``ord_scan_documents``,
``multimodal_decode_png``)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.operators.multimodal import (
    PNG_SIG,
    _png_decode,
    decode,
    encode_png,
    extract_features,
)
from open_reaction_database_web_scraper_spark.operators.text import FP_WINDOW
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


# ---------------------------------------------------------------------------
# PNG codec


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def test_png_roundtrip_every_filter_type():
    for channels, w, h in [(3, 4, 2), (1, 8, 3), (3, 1, 5), (1, 1, 1)]:
        n = w * h * channels
        raster = bytes((i * 37 + 11) % 256 for i in range(n))
        for f in range(5):
            png = encode_png(raster, w, h, channels, [f] * h)
            assert _png_decode(png) == (sum(raster), w, h), (channels, f)
        # mixed filters: every branch in one image
        png = encode_png(raster, w, h, channels, [r % 5 for r in range(h)])
        assert _png_decode(png) == (sum(raster), w, h)


def test_png_corrupt_payloads_hit_sentinel_not_exception():
    raster = bytes(range(24))
    good = encode_png(raster, 4, 2, 3, [1, 4])
    assert decode(good, "png") == (sum(raster), 4, 2)
    # every corruption class must map to the sentinel, never raise
    assert decode(b"JFIF" + good, "png") == (-1, 0, 0)      # bad magic
    assert decode(good[:25], "png") == (-1, 0, 0)           # truncated chunk
    assert decode(b"", "png") == (-1, 0, 0)                 # empty
    flipped = bytearray(good)
    flipped[45] ^= 0xFF                                     # damage IDAT
    assert decode(bytes(flipped), "png") == (-1, 0, 0)      # adler mismatch


def test_png_unsupported_variants_rejected():
    # RGBA (color type 6) and interlaced images are the pillow seam
    for ctype, interlace in [(6, 0), (3, 0), (2, 1)]:
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, ctype, 0, 0, interlace)
        payload = (PNG_SIG + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(b"\x00" + bytes(8)))
                   + _chunk(b"IEND", b""))
        assert decode(payload, "png") == (-1, 0, 0), (ctype, interlace)
    # missing IEND (e.g. a partially-written file) is corrupt
    no_end = encode_png(bytes(24), 4, 2, 3)
    assert decode(no_end[:-12], "png") == (-1, 0, 0)


def test_png_wrong_raster_length_rejected():
    # geometry says 4x2 RGB but the zlib stream carries one scanline
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    short = (PNG_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", zlib.compress(b"\x00" + bytes(12)))
             + _chunk(b"IEND", b""))
    assert decode(short, "png") == (-1, 0, 0)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 8), h=st.integers(1, 8),
       data=st.data(), gray=st.booleans())
def test_png_roundtrip_property(w, h, data, gray):
    ch = 1 if gray else 3
    raster = bytes(data.draw(st.binary(min_size=w * h * ch,
                                       max_size=w * h * ch)))
    filters = data.draw(st.lists(st.integers(0, 4),
                                 min_size=h, max_size=h))
    png = encode_png(raster, w, h, ch, filters)
    assert _png_decode(png) == (sum(raster), w, h)


def test_extract_features_routes_png_through_real_codec(spark):
    raster = bytes((i * 7 + 3) % 256 for i in range(4 * 2 * 3))
    png = encode_png(raster, 4, 2, 3, [4, 3])
    corrupt = png[:-20]
    rows = [(1, png, {"fmt": "png", "n_bytes": len(png), "source": "t"}),
            (2, corrupt, {"fmt": "png", "n_bytes": len(corrupt),
                          "source": "t"})]
    assets = spark.createDataFrame(
        rows, "asset_id bigint, payload binary, "
              "meta struct<fmt: string, n_bytes: long, source: string>")
    out = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert (out[1]["byte_sum"], out[1]["fake_width"],
            out[1]["fake_height"]) == (sum(raster), 4, 2)
    assert out[2]["byte_sum"] == -1  # corrupt sentinel, task survived


def test_decode_png_query_matches_oracle(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.testing import compare
    spec = REGISTRY["multimodal_decode_png"]
    ok, msg = compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir,
                      "multimodal_decode_png", fail_on_empty=True)
    assert ok, msg


# ---------------------------------------------------------------------------
# Portable polynomial fingerprint


def _py_fingerprint(text: str) -> tuple[int, int]:
    """Independent python model of the text_fingerprint hash: first
    32 bits of md5 over each space-joined 8-token shingle."""
    import hashlib
    toks = text.split(" ")
    n = max(len(toks) - (FP_WINDOW - 1), 1)
    sh = [int(hashlib.md5(
        " ".join(toks[i:i + FP_WINDOW]).encode("utf-8")).hexdigest()[:8], 16)
        for i in range(n)]
    return min(sh), len(set(sh))


def test_text_fingerprint_matches_python_model(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short",
        "",
        "a  b",                     # double space -> empty token
        "exactly eight tokens in this sentence right here",
        "unicode café 字 tokens mixed in the stream today ok",
    ]
    rows = [(i, t, "src", "en") for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: (r["fingerprint"], r["n_shingles"])
           for r in REGISTRY["text_fingerprint"]
           .fn(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts):
        assert out[i] == _py_fingerprint(t), (i, t)


def test_text_fingerprint_oracle_parity(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.testing import compare
    spec = REGISTRY["text_fingerprint"]
    ok, msg = compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir,
                      "text_fingerprint", fail_on_empty=True)
    assert ok, msg


def test_decode_bmp_query_matches_oracle(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.testing import compare
    spec = REGISTRY["multimodal_decode_bmp"]
    ok, msg = compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir,
                      "multimodal_decode_bmp", fail_on_empty=True)
    assert ok, msg


def test_decode_bmp_query_is_jvm_constructed(spark, sf_dir):
    """BMP construction must stay JVM-side: exactly ONE Python
    (Arrow) stage in the plan — the decode itself — and no
    shuffles."""
    plan = (REGISTRY["multimodal_decode_bmp"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_multimodal_columns_oracle_handles_non_ascii(spark, tmp_path):
    """The UTF-8 byte-sum oracle must agree with the stub codec on
    2-, 3- and 4-byte code points, not just ASCII (driver data is
    ASCII; this planted fixture is what actually proves the CASE
    arithmetic)."""
    from open_reaction_database_web_scraper_spark.testing import compare
    texts = ["plain ascii", "héllo wörld", "字符串测试", "emoji 🎉🚀 mix",
             "", "mixed é字🎉x"]
    rows = [(i, t, "src", "xx") for i, t in enumerate(texts)]
    d = str(tmp_path / "mmo")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string") \
        .write.parquet(f"{d}/documents.parquet")
    spec = REGISTRY["multimodal_columns"]
    ok, msg = compare(spec.fn(spark, d), spec.oracle, d,
                      "multimodal_columns", fail_on_empty=True)
    assert ok, msg
    # independent python check of one non-trivial row
    out = {r.asset_id: r for r in spec.fn(spark, d).collect()}
    for i, t in enumerate(texts):
        assert out[i].byte_sum == sum(t.encode("utf-8")), t


def test_multimodal_resize_oracle_boundary_lengths(spark, tmp_path):
    """Stride boundaries: len 0, 1, 4095, 4096, 4097, 8192, 8193 —
    the ceil-division edges where an off-by-one over- or
    under-shoots the byte budget."""
    from open_reaction_database_web_scraper_spark.testing import compare
    rows = [(i, "x" * n, "src", "xx")
            for i, n in enumerate([0, 1, 4095, 4096, 4097, 8192, 8193])]
    d = str(tmp_path / "rsz")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string") \
        .write.parquet(f"{d}/documents.parquet")
    spec = REGISTRY["multimodal_resize_stub"]
    ok, msg = compare(spec.fn(spark, d), spec.oracle, d,
                      "multimodal_resize_stub", fail_on_empty=True)
    assert ok, msg
    out = {r.asset_id: r for r in spec.fn(spark, d).collect()}
    for i, n in enumerate([0, 1, 4095, 4096, 4097, 8192, 8193]):
        expect = len(("x" * n).encode()[::max(1, -(-n // 4096))]) if n else 0
        assert out[i].resized_bytes == expect, (n, out[i].resized_bytes)


# ---------------------------------------------------------------------------
# ord_scan_documents oracle


def test_ord_scan_documents_oracle_parity(spark, golden_files):
    from open_reaction_database_web_scraper_spark.testing import compare
    spec = REGISTRY["ord_scan_documents"]
    # golden corpus path is baked into the query; sf_dir is ignored
    ok, msg = compare(spec.fn(spark, "/root/testdata/sf0.001"),
                      spec.oracle, "/root/testdata/sf0.001",
                      "ord_scan_documents", fail_on_empty=True)
    assert ok, msg


# ---------------------------------------------------------------------------
# bench hygiene


def test_bench_sessions_disable_console_progress():
    from open_reaction_database_web_scraper_spark.session import DEFAULT_CONFS
    assert DEFAULT_CONFS["spark.ui.showConsoleProgress"] == "false"


def test_decode_png_query_single_python_boundary(spark, sf_dir):
    """The PNG query may cross to Python for construct+decode, but
    must not add shuffles: scan -> (Arrow stages) -> project only."""
    plan = (REGISTRY["multimodal_decode_png"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# text_zipf_slope


def test_zipf_slope_on_planted_zipf_corpus(spark, tmp_path):
    """A corpus built to follow Zipf's law exactly (word i appears
    floor(3000/i) times) must fit a slope near -1; a uniform corpus
    (every word equally frequent) must fit ~0."""
    words = []
    for i in range(1, 201):
        words += [f"w{i:03d}"] * (3000 // i)
    zipf_text = " ".join(words)
    uni_text = " ".join([f"u{i:03d}" for i in range(1, 201)] * 15)
    d1, d2 = str(tmp_path / "zipf"), str(tmp_path / "uni")
    for d, t in ((d1, zipf_text), (d2, uni_text)):
        spark.createDataFrame(
            [(1, t, "src", "en")],
            "doc_id long, text string, source string, lang string") \
            .write.parquet(f"{d}/documents.parquet")
    slope_z = (REGISTRY["text_zipf_slope"].fn(spark, d1)
               .collect()[0]["zipf_slope"])
    slope_u = (REGISTRY["text_zipf_slope"].fn(spark, d2)
               .collect()[0]["zipf_slope"])
    assert -1.15 < slope_z < -0.85, slope_z
    assert abs(slope_u) < 0.05, slope_u


def test_zipf_slope_oracle_parity_on_planted(spark, tmp_path):
    from open_reaction_database_web_scraper_spark.testing import compare
    words = []
    for i in range(1, 101):
        words += [f"w{i:03d}"] * (1200 // i)
    d = str(tmp_path / "zo")
    spark.createDataFrame(
        [(1, " ".join(words), "src", "en")],
        "doc_id long, text string, source string, lang string") \
        .write.parquet(f"{d}/documents.parquet")
    spec = REGISTRY["text_zipf_slope"]
    ok, msg = compare(spec.fn(spark, d), spec.oracle, d,
                      "text_zipf_slope", fail_on_empty=True)
    assert ok, msg


def test_zipf_topk_cut_uses_take_ordered(spark, sf_dir):
    """The top-K vocabulary cut must compile to TakeOrderedAndProject
    (never a full global sort of the vocabulary)."""
    plan = (REGISTRY["text_zipf_slope"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# scan_schema_merge


def test_schema_merge_backfills_null_only_on_old_generation(spark, sf_dir):
    out = {r.o_orderkey: r for r in
           REGISTRY["scan_schema_merge"].fn(spark, sf_dir).collect()}
    assert out, "no rows survived the filter"
    for k, r in out.items():
        if k % 2 == 0:
            assert r.o_orderpriority is None, r
        else:
            assert r.o_orderpriority is not None, r


def test_schema_merge_pushes_filter_into_scan(spark, sf_dir):
    plan = (REGISTRY["scan_schema_merge"].fn(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(o_totalprice), " \
           "GreaterThan(o_totalprice," in plan, plan


# ---------------------------------------------------------------------------
# ord_python_datasource (Spark 4 Python Data Source API)


def test_ord_datasource_partition_per_file(golden_files):
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdDataSourceReader
    reader = OrdDataSourceReader(
        {"path": "/root/reference/ord_formatted_data*.json"})
    parts = reader.partitions()
    assert len(parts) == len(golden_files)
    assert sorted(p.path for p in parts) == golden_files


def test_ord_datasource_permissive_on_malformed_file(tmp_path):
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdDataSourceReader, OrdFilePartition
    (tmp_path / "bad.json").write_text("{not valid json")
    (tmp_path / "scalar.json").write_text("42")
    reader = OrdDataSourceReader({"path": f"{tmp_path}/*.json"})
    for p in reader.partitions():
        assert list(reader.read(OrdFilePartition(p.path))) == []


def test_ord_datasource_matches_relational_scan(spark, golden_files):
    """The connector and the DataFrame-path bronze scan must agree
    row-for-row on their shared columns."""
    via_ds = (REGISTRY["ord_python_datasource"]
              .fn(spark, "/root/testdata/sf0.001")
              .select("dataset_id", "reaction_id", "success",
                      "n_input_tabs", "n_outcomes"))
    via_df = REGISTRY["ord_scan_documents"].fn(spark, "/root/testdata/sf0.001")
    assert via_ds.exceptAll(via_df).count() == 0
    assert via_df.exceptAll(via_ds).count() == 0


def test_ord_datasource_pushfilters_split():
    """EqualTo on pushable columns is absorbed; everything else is
    returned by reference for Spark to evaluate."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdDataSourceReader
    reader = OrdDataSourceReader({"path": "/root/reference/*.json"})
    eq = EqualTo(("success",), True)
    gt = GreaterThanOrEqual(("n_outcomes",), 1)
    eq_other = EqualTo(("n_outcomes",), 1)  # pushable op, unpushable col
    leftover = list(reader.pushFilters([eq, gt, eq_other]))
    assert leftover == [gt, eq_other]
    assert reader.pushed == [eq]


def test_ord_datasource_pushed_filter_applied_in_read(golden_files):
    from pyspark.sql.datasource import EqualTo
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdDataSourceReader, OrdFilePartition
    glob_ = "/root/reference/ord_formatted_data*.json"
    plain = OrdDataSourceReader({"path": glob_})
    pushed = OrdDataSourceReader({"path": glob_})
    list(pushed.pushFilters([EqualTo(("success",), True)]))
    all_rows = [r for p in plain.partitions()
                for r in plain.read(OrdFilePartition(p.path))]
    kept = [r for p in pushed.partitions()
            for r in pushed.read(OrdFilePartition(p.path))]
    assert kept == [r for r in all_rows if r[4] is True]
    assert len(kept) < len(all_rows)  # the corpus has failures/placeholders


def test_ord_datasource_pushdown_query_plan(spark):
    """The pushed success-equality must vanish from the post-scan
    Filter; the unpushable n_outcomes predicate must remain."""
    plan = (REGISTRY["ord_python_datasource_pushdown"]
            .fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert " AND success#" not in plan, plan
    assert "n_outcomes#" in plan.split("BatchScan")[0], plan


def test_ord_stream_reader_offsets_and_replay():
    """Offset math and deterministic replay: read() drains all
    files and advances to a SEEN-SET offset (processed basenames,
    not a list position or watermark); readBetweenOffsets re-yields
    exactly the set difference; an empty range is empty."""
    import glob as _glob
    import os
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdStreamReader
    pattern = "/root/reference/ord_formatted_data*.json"
    names = sorted(os.path.basename(p) for p in _glob.glob(pattern))
    r = OrdStreamReader({"path": pattern})
    assert r.initialOffset() == {"seen": []}
    rows, nxt = r.read({"seen": []})
    rows = list(rows)
    assert nxt == {"seen": names} and rows
    # replay of the full range is byte-identical
    assert list(r.readBetweenOffsets({"seen": []}, nxt)) == rows
    # replay of a sub-range equals the matching file's rows
    sub = list(r.readBetweenOffsets({"seen": []}, {"seen": names[:1]}))
    assert rows[:len(sub)] == sub and 0 < len(sub) < len(rows)
    # caught-up read: no new rows, offset unchanged
    rows2, nxt2 = r.read(nxt)
    assert list(rows2) == [] and nxt2 == nxt


def test_ord_sink_manifest_and_no_temp_leaks(spark, sf_dir, tmp_path):
    """Commit must rename every non-empty shard, record exact row
    counts in the manifest, and leave no _tmp files behind."""
    import json as _json
    import os
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdSinkDataSource
    spark.dataSource.register(OrdSinkDataSource)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string")
    df.repartition(8).write.format("ord_sink") \
        .option("path", out).mode("append").save()
    manifest = _json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    files = set(os.listdir(out))
    assert not [f for f in files if f.startswith("_tmp-")], files
    assert set(manifest["shards"]) == files - {"_MANIFEST.json"}
    n = sum(1 for s in manifest["shards"]
            for _ in open(os.path.join(out, s)))
    assert n == 100


def test_ord_sink_abort_removes_temp_shards(tmp_path):
    from open_reaction_database_web_scraper_spark.sources.ord_datasource \
        import OrdShardCommit, OrdSinkWriter
    import os
    out = str(tmp_path / "ab")
    w = OrdSinkWriter({"path": out})
    os.makedirs(out)
    tmp = os.path.join(out, "_tmp-deadbeef.jsonl")
    open(tmp, "w").write("{}\n")
    w.abort([OrdShardCommit(tmp, 1), None, OrdShardCommit(None, 0)])
    assert os.listdir(out) == []
