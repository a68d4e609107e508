"""Semantic pins for the behavioral-analytics / runtime-filter /
knn-join / compaction operators (round 2, second tranche).

The differential oracle checks value parity with DuckDB; these pin
the semantic claims: funnels are ordered and monotone, cohorts
partition exactly the distinct user-weeks, the incremental merge
equals the flat aggregate, the bloom prefilter passes every true
match (no false negatives by construction), the knn join returns
exact same-label top-k, and compaction preserves every row while
actually shrinking the file count.
"""

from __future__ import annotations

import glob

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


def test_funnel_is_monotone_and_ordered(spark, sf_dir):
    row = run("event_funnel", spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_viewed >= row.n_clicked >= row.n_purchased
    assert row.n_users == (load(spark, sf_dir, "events")
                           .select("user_id").distinct().count())
    # ordered semantics: stage counts can only shrink vs the
    # unordered "did the user ever emit this event type" counts
    ever = (load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(*[F.max(F.when(F.col("event_type") == t, 1))
                   .alias(t) for t in ("view", "click", "purchase")])
            .agg(F.count("view").alias("v"), F.count("click").alias("c"),
                 F.count("purchase").alias("p")).collect()[0])
    assert row.n_viewed == ever.v          # first stage has no order clause
    assert row.n_clicked <= ever.c
    assert row.n_purchased <= ever.p


def test_funnel_ordered_stage_on_tiny_case(spark, tmp_path):
    """Drives the REGISTERED event_funnel operator on a tiny planted
    events table (not an inline re-implementation — a regression in
    the operator itself must fail this test). u1 completes the funnel
    in order; u2 purchases BEFORE clicking, so the ordered semantics
    must not count u2's purchase."""
    rows = [(1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 11:00:00"),
            (1, "purchase", "2024-01-01 12:00:00"),
            (2, "purchase", "2024-01-01 09:00:00"),
            (2, "view", "2024-01-01 10:00:00"),
            (2, "click", "2024-01-01 11:00:00")]
    (spark.createDataFrame(rows, "user_id long, event_type string, "
                           "ts_s string")
     .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
     .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet"))
    got = REGISTRY["event_funnel"].fn(spark, str(tmp_path)).collect()[0]
    assert (got.n_users, got.n_viewed, got.n_clicked, got.n_purchased) \
        == (2, 2, 2, 1)


def test_retention_cohort_cells_cover_user_weeks(spark, sf_dir):
    cells = run("retention_cohorts", spark, sf_dir)
    total = cells.agg(F.sum("n_active")).collect()[0][0]
    user_weeks = (load(spark, sf_dir, "events")
                  .select("user_id", F.date_trunc("week", "ts").alias("w"))
                  .distinct().count())
    assert total == user_weeks
    assert cells.filter(F.col("week_offset") < 0).count() == 0


def test_incremental_merge_equals_flat_aggregate(spark, sf_dir):
    got = {r.o_orderstatus: (r.n_orders, r.total_price, r.min_price,
                             r.max_price)
           for r in run("agg_incremental_merge", spark, sf_dir).collect()}
    flat = {r.o_orderstatus: (r.n, r.s, r.mn, r.mx)
            for r in (load(spark, sf_dir, "orders")
                      .groupBy("o_orderstatus")
                      .agg(F.count("*").alias("n"),
                           F.sum(F.col("o_totalprice")
                                 .cast("decimal(18,4)"))
                           .cast("double").alias("s"),
                           F.min("o_totalprice").alias("mn"),
                           F.max("o_totalprice").alias("mx"))).collect()}
    assert got == flat


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    # exact vs plain-join result: identical rows (FPs removed by join)
    got = run("join_bloom_prefilter", spark, sf_dir)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    plain = (load(spark, sf_dir, "lineitem")
             .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy(F.date_trunc("month", "o_orderdate")
                      .alias("order_month"))
             .agg(F.count("*").alias("n_items")))
    g = {r.order_month: r.n_items for r in got.collect()}
    p = {r.order_month: r.n_items for r in plain.collect()}
    assert g == p


def test_knn_join_exact_per_probe(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.operators.vectors import (
        KNN_K, KNN_Q_MOD)
    got = run("vector_knn_join", spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    emb = {r.vec_id: (r.label, r.e) for r in
           load(spark, sf_dir, "embeddings").select(
               "vec_id", "label",
               F.col("embedding").cast("array<double>").alias("e"))
           .collect()}

    def cos(a, b):
        import math
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))

    for qid, rows in by_q.items():
        assert len(rows) <= KNN_K
        qlab, qe = emb[qid]
        cand = sorted(
            ((cos(qe, e), -vid) for vid, (lab, e) in emb.items()
             if lab == qlab and vid % KNN_Q_MOD != 0),
            reverse=True)[:KNN_K]
        want = {-c[1] for c in cand}
        assert {r.neighbor_id for r in rows} == want


def test_compaction_preserves_rows_and_shrinks_files(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.operators import scans
    got = run("sink_compact_small_files", spark, sf_dir)
    n = got.agg(F.sum("n_docs")).collect()[0][0]
    assert n == load(spark, sf_dir, "documents").count()
    frag = glob.glob(scans._sink_dir("sink_compact_fragmented")
                     + "/*.parquet")
    comp = glob.glob(scans._sink_dir("sink_compact_compacted")
                     + "/*.parquet")
    assert len(frag) == 64
    assert 0 < len(comp) <= 4


def test_lm_perplexity_orders_common_vs_rare(spark, tmp_path):
    # doc 0 repeats corpus-head tokens; doc 1 is all hapaxes ->
    # OOV-floored, so its avg NLL must be strictly higher
    rows = [(0, "the the the cat cat", "en", "s", 19),
            (1, "zq wvx plk mnb qaz", "en", "s", 18)] + \
           [(i, "the cat sat", "en", "s", 11) for i in range(2, 12)]
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r.avg_nll for r in
           REGISTRY["text_lm_perplexity"].fn(spark, str(d)).collect()}
    assert got[1] > got[0]
    assert all(v > 0 for v in got.values())


def test_rolling_wau_matches_naive_window(spark, sf_dir):
    import datetime
    got = {r.day: r.wau for r in
           run("agg_rolling_active_users", spark, sf_dir).collect()}
    active = (load(spark, sf_dir, "events")
              .select("user_id", F.date_trunc("day", "ts").alias("day"))
              .distinct().collect())
    days = sorted({r.day for r in active})
    assert set(got) == set(days)
    for d in days:
        lo = d - datetime.timedelta(days=6)
        naive = len({r.user_id for r in active if lo <= r.day <= d})
        assert got[d] == naive
