"""Degenerate-input behavior: empty tables and single-row tables.

A 100 TB pipeline hits empty partitions, empty date windows, and
filtered-to-nothing inputs constantly; operators must return empty
(or identity) results with the SAME schema, never throw. One shared
empty/tiny corpus per module run keeps session time sane.
"""

from __future__ import annotations

import pytest

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()

# Ops that read only the documents table (the empty fixture provides
# every column the ops touch).
DOC_OPS = ["dedup_exact_hash", "dedup_minhash_lsh", "dedup_simhash",
           "dedup_subdoc_blocks", "text_pii_redact",
           "text_decontaminate_ngram", "text_tokenize_stats",
           "text_quality_score", "text_token_count", "text_fingerprint",
           "text_repetition_ratio", "text_tfidf", "text_lm_perplexity",
           "sample_stratified",
           "pipeline_training_data", "pipeline_corpus_curation",
           "agg_hll_sketch_merge", "agg_heavy_hitters"]


@pytest.fixture(scope="module")
def empty_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_docs")
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def one_doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("one_doc")
    spark.createDataFrame(
        [(0, "one single document", "en", "src1", 19)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", DOC_OPS)
def test_empty_documents_no_throw(spark, empty_docs_dir, name):
    df = REGISTRY[name].fn(spark, empty_docs_dir)
    rows = df.collect()
    # aggregations without groupBy may legitimately return one
    # null/zero row; everything else must be empty
    assert len(rows) <= 1
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", DOC_OPS)
def test_single_document_no_throw(spark, one_doc_dir, name):
    df = REGISTRY[name].fn(spark, one_doc_dir)
    rows = df.collect()
    # one doc can never be a duplicate / contaminated pair
    if name in ("dedup_minhash_lsh", "dedup_simhash"):
        assert rows == []
    assert len(df.columns) > 0


@pytest.fixture(scope="module")
def empty_events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_events")
    spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string") \
        .write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


def test_stream_stream_join_empty_events(spark, empty_events_dir):
    """No clicks, no purchases → empty pair set, stable schema."""
    df = REGISTRY["stream_stream_join"].fn(spark, empty_events_dir)
    assert df.collect() == []
    assert df.columns == ["purchase_id", "click_id", "user_id",
                          "purchase_ts", "click_ts"]


def test_stream_stream_join_click_without_purchase(spark, tmp_path):
    """A click with no purchase in range must produce nothing; a
    purchase exactly 1h after a click is OUTSIDE the (p-1h, p] bound's
    open edge... (strictly greater than p-1h keeps it: boundary is
    inclusive at p.ts, exclusive at p.ts - 1h)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        # exactly 1h later: c.ts == p.ts - 1h -> excluded (strict >)
        (2, t0 + datetime.timedelta(hours=1), 7, "purchase", 1.0, "{}"),
        # 59 min later: included
        (3, t0 + datetime.timedelta(minutes=59), 7, "purchase", 1.0,
         "{}"),
        # other user: never joined
        (4, t0 + datetime.timedelta(minutes=5), 8, "purchase", 1.0,
         "{}"),
    ]
    d = tmp_path / "ev"
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string") \
        .write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {(r.purchase_id, r.click_id)
           for r in REGISTRY["stream_stream_join"].fn(spark, str(d))
           .collect()}
    assert got == {(3, 1)}


# Round-2 extension ops reading documents
DOC_OPS_R2 = ["text_vocab_topk", "text_entropy_quality"]


@pytest.mark.parametrize("name", DOC_OPS_R2)
def test_empty_documents_no_throw_r2(spark, empty_docs_dir, name):
    df = REGISTRY[name].fn(spark, empty_docs_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", DOC_OPS_R2)
def test_single_document_no_throw_r2(spark, one_doc_dir, name):
    df = REGISTRY[name].fn(spark, one_doc_dir)
    assert len(df.collect()) >= 1
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", ["agg_bitmap_distinct",
                                  "win_sessionize_gaps",
                                  "win_fill_forward"])
def test_empty_events_no_throw_r2(spark, empty_events_dir, name):
    df = REGISTRY[name].fn(spark, empty_events_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


@pytest.fixture(scope="module")
def empty_customer_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_cust")
    spark.createDataFrame(
        [], "c_custkey bigint, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string") \
        .write.mode("overwrite").parquet(f"{d}/customer.parquet")
    return str(d)


def test_fuzzy_levenshtein_empty_customer(spark, empty_customer_dir):
    df = REGISTRY["dedup_fuzzy_levenshtein"].fn(spark, empty_customer_dir)
    assert df.collect() == []
    assert df.columns == ["name_a", "name_b", "edit_dist"]


@pytest.fixture(scope="module")
def empty_embeddings_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_emb")
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_centroid_agg_empty_embeddings(spark, empty_embeddings_dir):
    df = REGISTRY["vector_centroid_agg"].fn(spark, empty_embeddings_dir)
    assert df.collect() == []
    assert df.columns == ["label", "dim", "centroid_v"]


# Round-2 tranche-2 ops: events / orders+lineitem / embeddings edges

def test_funnel_and_cohorts_empty_events(spark, empty_events_dir):
    row = REGISTRY["event_funnel"].fn(spark, empty_events_dir).collect()
    assert len(row) == 1 and row[0].n_users == 0
    assert REGISTRY["retention_cohorts"].fn(
        spark, empty_events_dir).collect() == []


def test_funnel_single_user_single_event(spark, tmp_path):
    import datetime
    rows = [(1, datetime.datetime(2024, 1, 1), 7, "view", 1.0, "{}")]
    d = tmp_path / "ev"
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string") \
        .write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = REGISTRY["event_funnel"].fn(spark, str(d)).collect()[0]
    assert (got.n_users, got.n_viewed, got.n_clicked,
            got.n_purchased) == (1, 1, 0, 0)
    coh = REGISTRY["retention_cohorts"].fn(spark, str(d)).collect()
    assert len(coh) == 1 and coh[0].week_offset == 0 \
        and coh[0].n_active == 1


@pytest.fixture(scope="module")
def empty_orders_li_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_oli")
    spark.createDataFrame(
        [], "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string") \
        .write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [], "l_orderkey bigint, l_extendedprice double") \
        .write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return str(d)


def test_incremental_merge_and_bloom_empty(spark, empty_orders_li_dir):
    assert REGISTRY["agg_incremental_merge"].fn(
        spark, empty_orders_li_dir).collect() == []
    # empty dim -> empty bloom image -> every fact row filtered; the
    # sizing/count path must survive n_keys == 0
    assert REGISTRY["join_bloom_prefilter"].fn(
        spark, empty_orders_li_dir).collect() == []


def test_knn_join_single_vector(spark, tmp_path):
    # one probe (vec_id=0), no candidates in its label -> no rows
    d = tmp_path / "emb"
    spark.createDataFrame(
        [(0, [1.0] * 4, 3)],
        "vec_id bigint, embedding array<float>, label int") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    assert REGISTRY["vector_knn_join"].fn(spark, str(d)).collect() == []


# Round-3 extension ops reading events
EVENT_OPS_R3 = ["join_asof_forward", "assoc_pair_lift",
                "ts_resample_interpolate", "agg_time_bucket_multi",
                "win_streak_longest", "anomaly_zscore",
                "cdc_apply_changelog", "join_interval_overlap"]


@pytest.mark.parametrize("name", EVENT_OPS_R3)
def test_empty_events_no_throw_r3(spark, empty_events_dir, name):
    df = REGISTRY[name].fn(spark, empty_events_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


# Round-3 extension ops reading documents
DOC_OPS_R3 = ["text_boilerplate_strip", "split_train_test",
              "corpus_mix_report", "text_keyword_topk"]


@pytest.mark.parametrize("name", DOC_OPS_R3)
def test_empty_documents_no_throw_r3(spark, empty_docs_dir, name):
    df = REGISTRY[name].fn(spark, empty_docs_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", DOC_OPS_R3)
def test_single_document_no_throw_r3(spark, one_doc_dir, name):
    df = REGISTRY[name].fn(spark, one_doc_dir)
    rows = df.collect()
    # a single doc has no cross-doc shared blocks: full text survives
    if name == "text_boilerplate_strip":
        assert rows[0].clean_text == "one single document"
    # its only keyword candidates need df >= 5 docs -> empty
    if name == "text_keyword_topk":
        assert rows == []
    assert len(df.columns) > 0


@pytest.fixture(scope="module")
def empty_part_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_part")
    spark.createDataFrame(
        [], "p_partkey bigint, p_name string, p_brand string, "
            "p_type string, p_size int, p_retailprice double") \
        .write.mode("overwrite").parquet(f"{d}/part.parquet")
    return str(d)


def test_skyline_empty_part(spark, empty_part_dir):
    df = REGISTRY["skyline_pareto"].fn(spark, empty_part_dir)
    assert df.collect() == []
    assert df.columns == ["p_retailprice", "p_size"]


def test_skyline_single_point_is_frontier(spark, tmp_path):
    spark.createDataFrame(
        [(0, "p", "B", "T", 3, 999.5)],
        "p_partkey bigint, p_name string, p_brand string, "
        "p_type string, p_size int, p_retailprice double") \
        .write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    rows = REGISTRY["skyline_pareto"].fn(spark, str(tmp_path)).collect()
    assert [(r.p_retailprice, r.p_size) for r in rows] == [(999.5, 3)]


@pytest.fixture(scope="module")
def empty_embeddings_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_emb")
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def test_quantize_empty_embeddings(spark, empty_embeddings_dir):
    df = REGISTRY["embedding_quantize_int8"].fn(
        spark, empty_embeddings_dir)
    assert df.collect() == []
    assert df.columns == ["vec_id", "dim", "code", "err"]


# Round-3 tranche-2 ops: empty graphs / corpora / event logs

@pytest.fixture(scope="module")
def empty_graph_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_graph")
    spark.createDataFrame(
        [], "l_orderkey bigint, l_partkey bigint, l_suppkey bigint") \
        .write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [], "s_suppkey bigint, s_name string, s_nationkey int, "
            "s_acctbal double") \
        .write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    return str(d)


@pytest.mark.parametrize("name", ["graph_pagerank", "graph_bfs_levels"])
def test_empty_graph_no_throw(spark, empty_graph_dir, name):
    df = REGISTRY[name].fn(spark, empty_graph_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


def test_empty_graph_triangle_census_zeros(spark, empty_graph_dir):
    """The census aggregates an empty edge set: one row of
    zeros/nulls rather than a throw."""
    rows = REGISTRY["graph_triangle_count"].fn(
        spark, empty_graph_dir).collect()
    assert len(rows) <= 1
    if rows:
        assert (rows[0].n_nodes or 0) == 0
        assert (rows[0].n_triangles or 0) == 0


def test_single_edge_graph(spark, tmp_path):
    """One lineitem row: a 2-node graph. PageRank conserves mass,
    census sees 1 node-pair table with no co-purchase edge."""
    spark.createDataFrame(
        [(1, 7, 3)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint") \
        .write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    pr = {r.node: r.rank_fp for r in
          REGISTRY["graph_pagerank"].fn(spark, str(tmp_path)).collect()}
    assert set(pr) == {"p:7", "s:3"}
    # Symmetric 2-cycle: both nodes keep exactly 1/2 (minus floor dust).
    assert pr["p:7"] == pr["s:3"]
    tri = REGISTRY["graph_triangle_count"].fn(
        spark, str(tmp_path)).collect()
    # single-part orders induce NO co-purchase edges
    assert len(tri) <= 1
    if tri:
        assert (tri[0].n_edges or 0) == 0


@pytest.mark.parametrize("name", ["event_markov_transitions"])
def test_empty_events_no_throw_r3b(spark, empty_events_dir, name):
    df = REGISTRY[name].fn(spark, empty_events_dir)
    assert df.collect() == []
    assert len(df.columns) > 0


DOC_OPS_R3B = ["export_jsonl_sharded", "quality_gate_reasons",
               "sample_weighted_bernoulli"]


@pytest.mark.parametrize("name", DOC_OPS_R3B)
def test_empty_documents_no_throw_r3b(spark, empty_docs_dir, name):
    df = REGISTRY[name].fn(spark, empty_docs_dir)
    rows = df.collect()
    assert len(rows) <= 1
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", DOC_OPS_R3B)
def test_single_document_no_throw_r3b(spark, one_doc_dir, name):
    rows = REGISTRY[name].fn(spark, one_doc_dir).collect()
    assert len(rows) == 1
    if name == "export_jsonl_sharded":
        assert rows[0].n_docs == 1
    if name == "quality_gate_reasons":
        assert rows[0].reasons == "too_short"


def test_semdedup_empty_embeddings(spark, empty_embeddings_dir):
    df = REGISTRY["dedup_semdedup"].fn(spark, empty_embeddings_dir)
    assert df.collect() == []


def test_embed_cosine_audit_empty_embeddings(spark, empty_embeddings_dir):
    """The round-8 per-vector audit form: an empty corpus yields an
    empty audit (the count-derived bits formula clamps at the floor
    instead of dividing by zero or logging zero)."""
    df = REGISTRY["dedup_embed_cosine"].fn(spark, empty_embeddings_dir)
    assert df.collect() == []


def test_ann_ivf_empty_embeddings(spark, empty_embeddings_dir):
    """Empty corpus: no seeds, no cells, no probes — empty result,
    no crash in the eager localCheckpoint."""
    df = REGISTRY["vector_ann_ivf"].fn(spark, empty_embeddings_dir)
    assert df.collect() == []


@pytest.fixture(scope="module")
def empty_orders_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_ord")
    spark.createDataFrame(
        [], "o_orderkey bigint, o_custkey bigint, o_totalprice double, "
            "o_orderdate timestamp, o_orderstatus string") \
        .write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return str(d)


def test_observed_metrics_empty_orders(spark, empty_orders_dir):
    rows = REGISTRY["scan_observed_metrics"].fn(
        spark, empty_orders_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_scanned == 0
