"""Targeted tests for the LLM-pipeline hygiene ops (redaction,
decontamination, sub-document dedup, sketch merge).

The sf tables contain no planted contamination or shared blocks —
zero-hit outputs there are correct — so these tests plant their own
fixtures, mirroring the planted-near-dup style of
test_streaming_equiv.py.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="ordspark_pipetest_")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_pii_redact_planted(spark):
    """Email, long digit run, and denylist terms are all replaced;
    clean text passes through untouched with a zero count."""
    rows = [(0, "mail bob@example.com and phone 5551234567 end",
             "en", "src1", 46),
            (1, "the customer met a supplier yesterday", "en", "src1", 37),
            (2, "nothing sensitive here", "en", "src1", 22)]
    d = _write_docs(spark, rows)
    out = {r.doc_id: r for r in REGISTRY["text_pii_redact"]
           .fn(spark, d).collect()}
    assert out[0].redacted == "mail [REDACTED] and phone [REDACTED] end"
    assert out[0].n_redactions == 2
    assert out[1].redacted == "the [REDACTED] met a [REDACTED] yesterday"
    assert out[1].n_redactions == 2
    assert out[2].redacted == "nothing sensitive here"
    assert out[2].n_redactions == 0


def test_decontaminate_planted(spark):
    """A corpus doc sharing a 5-gram with the benchmark slice is
    flagged; a doc sharing only shorter runs is not; benchmark docs
    themselves are excluded from the output."""
    leak = "alpha beta gamma delta epsilon"          # the shared 5-gram
    rows = [(0, f"bench doc says {leak} end", "en", "src0", 40),
            (1, f"training doc repeats {leak} verbatim", "en", "src1", 45),
            (2, "training doc with alpha beta only", "en", "src1", 33),
            (3, "totally unrelated text body here", "en", "src2", 32)]
    d = _write_docs(spark, rows)
    out = {r.doc_id: r for r in REGISTRY["text_decontaminate_ngram"]
           .fn(spark, d).collect()}
    assert set(out) == {1, 2, 3}          # src0 rows excluded
    assert out[1].contaminated and out[1].n_overlap >= 1
    assert not out[2].contaminated and out[2].n_overlap == 0
    assert not out[3].contaminated


def test_subdoc_blocks_planted(spark):
    """Two docs sharing one exact 8-token block are both flagged on
    exactly that block; the unique doc reports zero shared blocks."""
    blk = "one two three four five six seven eight"   # 8 tokens
    uniq_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    uniq_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    uniq_c = "c1 c2 c3 c4 c5 c6 c7 c8"
    rows = [(0, f"{blk} {uniq_a}", "en", "src1", 0),
            (1, f"{blk} {uniq_b}", "en", "src1", 0),
            (2, f"{uniq_c}", "en", "src1", 0)]
    d = _write_docs(spark, rows)
    out = {r.doc_id: r for r in REGISTRY["dedup_subdoc_blocks"]
           .fn(spark, d).collect()}
    # only the leading block is shared; each unique half is not
    assert out[0].n_blocks == 2 and out[0].n_shared_blocks == 1
    assert out[1].n_blocks == 2 and out[1].n_shared_blocks == 1
    assert out[2].n_blocks == 1 and out[2].n_shared_blocks == 0


def test_subdoc_blocks_truly_unique(spark):
    rows = [(0, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "src1", 0),
            (1, "d1 d2 d3 d4 d5 d6 d7 d8", "en", "src1", 0),
            (2, "short", "en", "src1", 0)]  # < 8 tokens → 0 blocks
    d = _write_docs(spark, rows)
    out = {r.doc_id: r for r in REGISTRY["dedup_subdoc_blocks"]
           .fn(spark, d).collect()}
    assert all(r.n_shared_blocks == 0 for r in out.values())
    assert out[2].n_blocks == 0


def test_hll_sketch_within_tolerance(spark, sf_dir):
    """Per-language estimates and the sketch-merged ALL row must land
    within HLL tolerance (~3× the default ~2.6% rsd at lgK=12) of
    the exact distinct counts computed natively."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    exact = {r.lang: r.n for r in
             tok.groupBy("lang").agg(
                 F.countDistinct("word").alias("n")).collect()}
    exact["ALL"] = tok.select("word").distinct().count()
    est = {r.lang: r.est_distinct for r in
           REGISTRY["agg_hll_sketch_merge"].fn(spark, sf_dir).collect()}
    assert set(est) == set(exact)
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(1, 0.08 * ex), (k, est[k], ex)


def test_sample_stratified_is_reproducible(spark, sf_dir):
    """Same filter, any partitioning → identical sample (the property
    RNG sampling lacks)."""
    a = REGISTRY["sample_stratified"].fn(spark, sf_dir)
    b = REGISTRY["sample_stratified"].fn(spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
