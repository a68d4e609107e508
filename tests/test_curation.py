"""Targeted tests for the training-mix curation ops (weighted
interleave, sequence packing) and the maintenance family
(merge, profile, mode, date spine)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.operators.curation import (
    PACK_BUDGET,
    PACK_SHARDS,
    pack_sequences,
)
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="ordspark_curtest_")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


# ---------------------------------------------------------------- packing

def test_pack_every_doc_exactly_once(spark, sf_dir):
    """Packed doc count equals corpus doc count — nothing dropped,
    nothing duplicated by the grouped-map packer."""
    from open_reaction_database_web_scraper_spark.catalog import load
    n_docs = load(spark, sf_dir, "documents").count()
    bins = pack_sequences(spark, sf_dir)
    assert bins.agg(F.sum("n_docs")).first()[0] == n_docs


def test_pack_budget_respected_unless_single_oversized(spark, sf_dir):
    """Every bin holds ≤ PACK_BUDGET chars, except bins holding one
    single document that is itself over budget (never split)."""
    bins = pack_sequences(spark, sf_dir)
    bad = bins.filter(
        (F.col("seq_chars") > PACK_BUDGET) & (F.col("n_docs") > 1))
    assert bad.count() == 0


def test_pack_deterministic(spark, sf_dir):
    """Two invocations produce identical bin rollups."""
    a = pack_sequences(spark, sf_dir).orderBy("lang", "shard", "bin_id")
    b = pack_sequences(spark, sf_dir).orderBy("lang", "shard", "bin_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_pack_greedy_boundary_planted(spark):
    """Planted docs of sizes [1000, 1000, 100, 2048, 3000]: shard
    assignment hashes doc_ids apart, so assert the global packing
    invariants (all docs placed, no multi-doc bin over budget)
    rather than exact bin boundaries — those are per-shard and
    covered by test_pack_single_shard_exact_boundaries."""
    sizes = [1000, 1000, 100, 2048, 3000]
    rows = [(i, "x", "en", "src0", s) for i, s in enumerate(sizes)]
    d = _write_docs(spark, rows)
    bins = (pack_sequences(spark, d)
            .orderBy("bin_id")
            .select("bin_id", "n_docs", "seq_chars").collect())
    # shard split depends on xxhash64(doc_id); regroup by summing
    # across shards: validate global invariants instead of exact
    # bin boundaries (those are per-shard).
    assert sum(r.n_docs for r in bins) == len(sizes)
    for r in bins:
        assert r.n_docs == 1 or r.seq_chars <= PACK_BUDGET


def test_pack_single_shard_exact_boundaries(spark):
    """Force every doc into one shard by using doc_ids that hash to
    the same shard, then assert the exact greedy bin layout."""
    # find doc_ids 0..N hashing to shard 0 (portable md5 die — the
    # same function pack_sequences shards with since round 9)
    import hashlib
    ids = [i for i in range(200)
           if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
           % PACK_SHARDS == 0][:4]
    assert len(ids) == 4
    sizes = dict(zip(sorted(ids), [1500, 600, 500, 2100]))
    rows = [(i, "x", "en", "src0", sizes[i]) for i in sorted(ids)]
    d = _write_docs(spark, rows)
    out = (pack_sequences(spark, d).orderBy("bin_id")
           .select("bin_id", "n_docs", "seq_chars").collect())
    # greedy over sizes [1500, 600, 500, 2100]:
    #   bin0: 1500 (600 would overflow) ... 1500+600=2100 > 2048
    #   bin1: 600+500=1100 (2100 would overflow)
    #   bin2: 2100 (oversized alone)
    assert [(r.bin_id, r.n_docs, r.seq_chars) for r in out] == [
        (0, 1, 1500), (1, 2, 1100), (2, 1, 2100)]


# ------------------------------------------------------------- interleave

def test_interleave_rates_approximate(spark, sf_dir):
    """Observed keep-rate per weighted source tracks its configured
    percentage (multiplicative-hash die is uniform); exactness is
    already pinned by the DuckDB oracle, this checks the rates are
    actually applied per-source."""
    from open_reaction_database_web_scraper_spark.catalog import load
    from open_reaction_database_web_scraper_spark.operators.curation import (
        MIX_WEIGHTS, interleave_sources_weighted)
    totals = {r.source: r.n for r in (
        load(spark, sf_dir, "documents").groupBy("source")
        .agg(F.count("*").alias("n")).collect())}
    kept = {r.source: r.n_docs for r in
            interleave_sources_weighted(spark, sf_dir).collect()}
    for src, pct in MIX_WEIGHTS.items():
        if totals.get(src, 0) >= 20:
            rate = kept.get(src, 0) / totals[src]
            assert abs(rate - pct / 100) < 0.35, (src, rate, pct)


# ------------------------------------------------------------ maintenance

def test_merge_upsert_semantics(spark, sf_dir):
    """Update keys carry status U and +10 price; insert keys exist
    only in the merged output; untouched keys pass through."""
    from open_reaction_database_web_scraper_spark.catalog import load
    base = {r.o_orderkey: r for r in
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .collect()}
    merged = {r.o_orderkey: r for r in
              REGISTRY["merge_upsert_scd1"].fn(spark, sf_dir).collect()}
    n_inserts = sum(1 for k in base if k % 97 == 0)
    assert len(merged) == len(base) + n_inserts
    for k, row in merged.items():
        if row.change_type == "insert":
            assert k not in base and row.o_orderstatus == "N"
        elif row.change_type == "update":
            assert row.o_orderstatus == "U"
            assert abs(row.o_totalprice - (base[k].o_totalprice + 10.0)) < 1e-9
        else:
            assert row.o_totalprice == base[k].o_totalprice


def test_profile_matches_direct_aggregates(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.catalog import load
    li = load(spark, sf_dir, "lineitem")
    prof = {r.col_name: r for r in
            REGISTRY["profile_table_stats"].fn(spark, sf_dir).collect()}
    direct = li.agg(
        F.count("*").alias("n"),
        F.countDistinct("l_quantity").alias("nd"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx")).first()
    p = prof["l_quantity"]
    assert (p.n_rows, p.n_distinct) == (direct.n, direct.nd)
    assert p.min_val == direct.mn and p.max_val == direct.mx


def test_date_spine_gap_free(spark, sf_dir):
    """Spine has exactly (max-min)+1 consecutive days and zero-filled
    days really have no orders."""
    rows = REGISTRY["date_spine_fill_gaps"].fn(spark, sf_dir) \
        .orderBy("day").collect()
    days = [r.day for r in rows]
    assert len(days) == (days[-1] - days[0]).days + 1
    for a, b in zip(days, days[1:]):
        assert (b - a).days == 1
    assert all(r.revenue == 0.0 for r in rows if r.n_orders == 0)
