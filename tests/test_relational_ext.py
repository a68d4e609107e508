"""Semantic pins for the round-2 relational/corpus extensions.

The differential oracle already checks value parity with DuckDB;
these tests pin the SEMANTIC claims each operator's docstring makes
(argmax really is the max row, bitmaps really equal COUNT DISTINCT,
sessions really break on >30 min gaps, entropy really is log2(k) on
uniform text) so a refactor can't silently keep hash-parity while
changing meaning.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.catalog import load
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


def run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_min_max_by_matches_window_rank(spark, sf_dir):
    got = {r.o_orderpriority: r for r in
           run("agg_min_max_by", spark, sf_dir).collect()}
    od = load(spark, sf_dir, "orders")
    for prio, row in got.items():
        grp = od.filter(F.col("o_orderpriority") == prio)
        top = grp.orderBy(F.desc("o_totalprice"),
                          F.desc("o_orderkey")).first()
        bot = grp.orderBy(F.asc("o_totalprice"),
                          F.asc("o_orderkey")).first()
        assert (row.top_orderkey, row.top_price) == \
            (top.o_orderkey, top.o_totalprice)
        assert (row.bottom_orderkey, row.bottom_price) == \
            (bot.o_orderkey, bot.o_totalprice)


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    got = {r.event_type: r.n_users for r in
           run("agg_bitmap_distinct", spark, sf_dir).collect()}
    exact = {r.event_type: r.n for r in
             load(spark, sf_dir, "events").groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert got == exact


def test_histogram_partitions_the_table(spark, sf_dir):
    rows = run("num_histogram_fixed", spark, sf_dir).collect()
    assert sum(r.n_rows for r in rows) == \
        load(spark, sf_dir, "lineitem").count()
    assert all(0 <= r.bin <= 23 for r in rows)
    assert all(r.bin_lo == r.bin * 5000.0 for r in rows)


def test_fill_forward_carries_last_purchase(spark, tmp_path):
    rows = [  # user 1: purchases at t2 and t4; views elsewhere
        (0, 1, "2024-01-01 10:00:00", "view", 1.0),
        (1, 1, "2024-01-01 10:05:00", "purchase", 42.0),
        (2, 1, "2024-01-01 10:10:00", "view", 2.0),
        (3, 1, "2024-01-01 10:15:00", "purchase", 7.0),
        (4, 1, "2024-01-01 10:20:00", "click", 3.0),
        (5, 2, "2024-01-01 09:00:00", "view", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_s string, "
              "event_type string, value double") \
        .select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value", F.lit("{}").alias("props"))
    d = str(tmp_path / "ff")
    df.write.parquet(f"{d}/events.parquet")
    got = {r.event_id: r.last_purchase_value for r in
           run("win_fill_forward", spark, d).collect()}
    assert got == {0: None, 1: 42.0, 2: 42.0, 3: 7.0, 4: 7.0, 5: None}


def test_sessionize_breaks_on_gap(spark, tmp_path):
    ts = [  # user 1: two sessions (90 min gap); user 2: one session
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:20:00"),
        (1, "2024-01-01 11:50:00"), (2, "2024-01-01 09:00:00"),
        (2, "2024-01-01 09:29:59"),
    ]
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(ts)],
        "event_id bigint, user_id bigint, ts_s string") \
        .select("event_id", "user_id",
                F.to_timestamp("ts_s").alias("ts"),
                F.lit("x").alias("event_type"),
                F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
    d = str(tmp_path / "sess")
    df.write.parquet(f"{d}/events.parquet")
    out = run("win_sessionize_gaps", spark, d).collect()
    per_user = {(r.user_id, r.session_no): r.n_events for r in out}
    assert per_user == {(1, 1): 2, (1, 2): 1, (2, 1): 2}


def test_scd2_versions_and_currency(spark, sf_dir):
    df = run("merge_upsert_scd2", spark, sf_dir)
    base = load(spark, sf_dir, "orders")
    n_changed = base.filter(F.col("o_orderkey") % 7 == 0).count()
    n_keys = base.count()
    # every key has exactly one current row; changed keys carry a
    # retired v1 plus a current v2 with price + 10
    assert df.filter("is_current").count() == n_keys
    assert df.count() == n_keys + n_changed
    two = (df.groupBy("o_orderkey").agg(
        F.count("*").alias("n"),
        F.max(F.when(F.col("version") == 2, F.col("o_totalprice")))
        .alias("p2"),
        F.max(F.when(F.col("version") == 1, F.col("o_totalprice")))
        .alias("p1"))
        .filter(F.col("n") == 2))
    assert two.count() == n_changed
    assert two.filter(F.col("p2") != F.col("p1") + 10.0).count() == 0


def test_fuzzy_levenshtein_matches_brute_force(spark, sf_dir):
    rows = run("dedup_fuzzy_levenshtein", spark, sf_dir).collect()
    assert rows, "sf0.001 customer names must yield distance-1 pairs"
    got = {(r.name_a, r.name_b) for r in rows}
    assert len(got) == len(rows), "pairs must be unique"
    for r in rows:
        assert 1 <= r.edit_dist <= 1  # distinct names, one substitution
        assert len(r.name_a) == len(r.name_b)
    # exact recall: wildcard blocking finds every brute-force pair
    names = [(r.c_custkey, r.c_name) for r in
             load(spark, sf_dir, "customer")
             .select("c_custkey", "c_name").collect()]
    brute = {(na, nb) for ka, na in names for kb, nb in names
             if ka < kb and len(na) == len(nb)
             and sum(x != y for x, y in zip(na, nb)) <= 1}
    assert got == brute


def test_vocab_topk_ranks_are_dense_and_sorted(spark, sf_dir):
    rows = (run("text_vocab_topk", spark, sf_dir)
            .orderBy("vocab_id").collect())
    assert [r.vocab_id for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_entropy_known_values(spark, tmp_path):
    docs = [
        (0, "aaaa", 0.0),                 # single symbol -> 0 bits
        (1, "abab", 1.0),                 # uniform over 2 -> 1 bit
        (2, "abcdabcd", 2.0),             # uniform over 4 -> 2 bits
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in docs], "doc_id bigint, text string") \
        .select("doc_id", "text", F.lit("en").alias("lang"),
                F.lit("s").alias("source"),
                F.length("text").cast("bigint").alias("n_chars"))
    d = str(tmp_path / "ent")
    df.write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r.char_entropy for r in
           run("text_entropy_quality", spark, d).collect()}
    for i, _, want in docs:
        assert got[i] == pytest.approx(want, abs=1e-6)


def test_centroid_agg_is_the_mean(spark, tmp_path):
    vecs = [(0, [1.0, 3.0], 7), (1, [3.0, 5.0], 7), (2, [10.0, 0.0], 8)]
    df = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<float>, label int")
    d = str(tmp_path / "cent")
    df.write.parquet(f"{d}/embeddings.parquet")
    got = {(r.label, r.dim): r.centroid_v for r in
           run("vector_centroid_agg", spark, d).collect()}
    assert got == {(7, 1): 2.0, (7, 2): 4.0, (8, 1): 10.0, (8, 2): 0.0}


def test_entropy_is_shuffle_free(spark, sf_dir):
    plan = (run("text_entropy_quality", spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    # fanout's input-spreading round-robin is the only allowed
    # exchange; no aggregation/join shuffle may appear
    assert "hashpartitioning" not in plan.lower()
