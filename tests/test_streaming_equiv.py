"""Streaming equivalence (SURVEY.md §5): the streamed result of a
windowed aggregation over the file-replayed events table equals the
batch result of the same query — micro-batching must not change
semantics when no rows are late.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.catalog import load
from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.streaming.jobs import (
    _chunked_events_dir,
    _EVENTS_SCHEMA,
    _run_to_memory,
)

load_all_operators()


def _batch_tumbling(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "cnt"))


def test_stream_tumbling_equals_batch(spark, sf_dir):
    """Replay events in 4 time-ordered micro-batches with a watermark;
    in-order replay means nothing is late, so every finalized window
    matches the batch aggregation exactly."""
    src = _chunked_events_dir(spark, sf_dir)
    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("cnt"))
           .select(F.col("w.start").alias("window_start"),
                   "event_type", "cnt"))
    streamed = {(r.window_start, r.event_type): r.cnt
                for r in _run_to_memory(agg, "append").collect()}
    batch = {(r.window_start, r.event_type): r.cnt
             for r in _batch_tumbling(spark, sf_dir).collect()}
    # Append mode emits a window only once the watermark passes its
    # end; windows newer than (max_ts - 10 min) are still open when
    # the availableNow replay drains, so they are legitimately absent.
    import datetime

    max_ts = (load(spark, sf_dir, "events")
              .agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0])
    wm = max_ts - datetime.timedelta(minutes=10)
    finalized = {k: v for k, v in batch.items()
                 if k[0] + datetime.timedelta(hours=1) <= wm}
    assert streamed == finalized
    assert len(finalized) > 0.5 * len(batch)  # replay covers most windows


def test_watermark_drops_late_rows(spark, sf_dir):
    """Out-of-order replay: appending a chunk of the OLDEST events
    after the watermark has advanced past them must not resurrect
    closed windows — the late rows are dropped, so the result is the
    batch aggregation of the on-time subset only."""
    import os
    import time

    src = _chunked_events_dir(spark, sf_dir)
    # Chunk order is mtime order (filenames are parquet UUIDs).
    files = sorted((f for f in os.listdir(src) if f.endswith(".parquet")),
                   key=lambda f: os.path.getmtime(os.path.join(src, f)))
    # Replay order: chunks 2,3,4 then chunk 1 (oldest quartile last).
    now = time.time()
    for i, f in enumerate(files[1:]):
        os.utime(os.path.join(src, f), (now + i, now + i))
    os.utime(os.path.join(src, files[0]), (now + 10, now + 10))

    stream = (spark.readStream.schema(_EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("cnt"))
           .select(F.col("w.start").alias("window_start"),
                   "event_type", "cnt"))
    streamed = {(r.window_start, r.event_type): r.cnt
                for r in _run_to_memory(agg, "append").collect()}
    full_batch = {(r.window_start, r.event_type): r.cnt
                  for r in _batch_tumbling(spark, sf_dir).collect()}
    # The late chunk's windows are strictly before the advanced
    # watermark: its rows must be missing or partial, never counted
    # beyond the batch truth.
    assert streamed != full_batch
    assert all(cnt <= full_batch[k] for k, cnt in streamed.items())


def test_embed_cosine_flags_planted_near_dups(spark):
    """dedup_embed_cosine's candidate+verify machinery on planted
    duplicates: identical and ε-perturbed vectors are flagged as
    near-dups of each other, an orthogonal vector is not. (The sf
    tables are random vectors with no true near-dups — all-false
    is_dup there is correct — so this test plants its own.)"""
    import tempfile

    base = [1.0, 0.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5]
    near = [x * 1.001 + (0.0001 if i == 0 else 0) for i, x in enumerate(base)]
    ortho = [0.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [(0, base), (1, near), (2, ortho)]
    d = tempfile.mkdtemp(prefix="ordspark_embtest_")
    spark.createDataFrame(rows, "vec_id bigint, embedding array<double>") \
        .write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = REGISTRY["dedup_embed_cosine"].fn(spark, d).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 3  # one audit row per vector, never empty
    assert by_id[0].is_dup and by_id[0].best_mate == 1
    assert by_id[1].is_dup and by_id[1].best_mate == 0
    assert by_id[0].best_cosine >= 0.95
    assert not by_id[2].is_dup


def test_dedup_clusters_planted(spark):
    """Label propagation must merge a planted 3-doc duplicate chain
    into one cluster and leave the unique doc out."""
    import tempfile

    rows = [(0, "aaa bbb ccc"), (1, "aaa bbb ccc"), (2, "aaa bbb ccc"),
            (3, "zzz yyy xxx")]
    d = tempfile.mkdtemp(prefix="ordspark_cctest_")
    spark.createDataFrame(rows, "doc_id bigint, text string") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = REGISTRY["dedup_clusters"].fn(spark, d).collect()
    got = {(r.doc_id, r.cluster_id, r.cluster_size) for r in out}
    assert got == {(0, 0, 3), (1, 0, 3), (2, 0, 3)}


def test_dedup_clusters_star_edges_linear(spark):
    """A k-copy duplicate group must emit exactly k-1 star edges (not
    k·(k-1)/2 pair edges — the round-2 quadratic flag) and resolve to
    ONE cluster of size k with hub = min doc_id."""
    import tempfile

    k = 100
    rows = [(i, "dup dup dup") for i in range(k)] + [(k, "uniq one two")]
    d = tempfile.mkdtemp(prefix="ordspark_startest_")
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    from open_reaction_database_web_scraper_spark.operators.dedup import (
        exact_dup_star_edges)
    edges = exact_dup_star_edges(spark.read.parquet(f"{d}/documents.parquet"))
    assert edges.count() == k - 1

    out = REGISTRY["dedup_clusters"].fn(spark, d).collect()
    assert {r.cluster_id for r in out} == {0}
    assert {r.cluster_size for r in out} == {k}
    assert {r.doc_id for r in out} == set(range(k))


def test_connected_components_chain_converges(spark):
    """A 7-node chain (diameter 6) must collapse to one component —
    the case a fixed 5-round propagation gets WRONG. Pins the
    convergence loop that dedup_clusters_neardup relies on for
    near-dup chains (A≈B≈C… without A≈Z)."""
    from open_reaction_database_web_scraper_spark.operators.dedup import (
        connected_components)

    chain = spark.createDataFrame(
        [(i + 1, i + 2) for i in range(6)] + [(20, 21)],
        "src bigint, dst bigint")
    labels = {r.doc_id: r.label for r in
              connected_components(chain).collect()}
    assert all(labels[i] == 1 for i in range(1, 8))
    assert labels[20] == labels[21] == 20


def test_dedup_clusters_neardup_planted_chain(spark):
    """Near-dup clustering end-to-end: a chain of documents where
    each neighbor pair shares most shingles (est-Jaccard ≥ 0.5) but
    the two ends share none must still merge into ONE cluster via
    the LSH-pair edge graph + convergence-looped CC."""
    import tempfile

    base = ["w%d" % i for i in range(40)]
    # 20-token windows shifted by 2: neighbors share 18/22 tokens
    # (shingle Jaccard ≈ 0.8, well over the 0.5 gate); the two ends
    # share only 8 tokens (Jaccard ≈ 0.2, well under it).
    docs = [(step, " ".join(base[step * 2: step * 2 + 20]))
            for step in range(7)]
    docs.append((99, " ".join("z%d" % i for i in range(22))))
    d = tempfile.mkdtemp(prefix="ordspark_chaintest_")
    spark.createDataFrame(docs, "doc_id bigint, text string") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")

    pairs = REGISTRY["dedup_minhash_lsh"].fn(spark, d).collect()
    adjacent = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 6) not in adjacent  # ends are NOT directly similar
    assert all((s, s + 1) in adjacent for s in range(6))  # chain links

    out = REGISTRY["dedup_clusters_neardup"].fn(spark, d).collect()
    chain_rows = [r for r in out if r.doc_id < 10]
    assert {r.doc_id for r in chain_rows} == set(range(7))
    assert len({r.cluster_id for r in chain_rows}) == 1
    assert {r.cluster_size for r in chain_rows} == {7}
    assert all(r.doc_id != 99 for r in out)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """True stream-stream inner join (clicks ⋈ purchases, same user,
    click within the hour before the purchase) with watermarks on
    BOTH sides — the form whose join state Spark can bound and evict.
    Inner joins emit a pair as soon as both rows have arrived, so the
    in-order file replay must reproduce the batch interval join
    exactly (nothing is late → nothing is dropped)."""
    src = _chunked_events_dir(spark, sf_dir)

    def side(event_type):
        return (spark.readStream.schema(_EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .filter(F.col("event_type") == event_type))

    clicks = (side("click")
              .select(F.col("event_id").alias("click_id"),
                      "user_id", F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", "10 minutes"))
    purchases = (side("purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user_id"),
                         F.col("ts").alias("purchase_ts"))
                 .withWatermark("purchase_ts", "10 minutes"))
    joined = purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts")
           - F.expr("INTERVAL 1 HOUR")))
    streamed = {(r.purchase_id, r.click_id)
                for r in _run_to_memory(joined, "append").collect()}
    batch = {(r.purchase_id, r.click_id)
             for r in REGISTRY["stream_stream_join"]
             .fn(spark, sf_dir).collect()}
    assert streamed == batch
    assert len(batch) > 0


def test_stream_funnel_fold_spans_arrow_chunks():
    """One group's micro-batch can span several Arrow chunks
    (spark.sql.execution.arrow.maxRecordsPerBatch). The state fold
    must sort GLOBALLY before folding: per-chunk sorting loses a
    click that is chunk-delivered before an earlier-in-time view.
    Adversarial chunk split [click,purchase] then [view] — only a
    global sort reaches stage 3."""
    import pandas as pd

    from open_reaction_database_web_scraper_spark.streaming.jobs import (
        fold_funnel_state)

    def chunk(rows):
        return pd.DataFrame(
            {"event_id": [r[0] for r in rows],
             "ts": [pd.Timestamp(r[1]) for r in rows],
             "event_type": [r[2] for r in rows]})

    pdfs = iter([
        chunk([(2, "2024-01-01 02:01:00", "click"),
               (3, "2024-01-01 02:02:00", "purchase")]),
        pd.DataFrame({"event_id": [], "ts": [], "event_type": []}),
        chunk([(1, "2024-01-01 02:00:00", "view")])])
    t_view, t_click, t_purch = fold_funnel_state((None, None, None), pdfs)
    assert t_view is not None and t_click is not None \
        and t_purch is not None

    # tie-break: equal ts resolved by event_id, and state carries
    # across calls (micro-batches)
    state = fold_funnel_state(
        (None, None, None),
        iter([chunk([(5, "2024-01-01 03:00:00", "view")])]))
    state = fold_funnel_state(
        state, iter([chunk([(6, "2024-01-01 03:10:00", "click")])]))
    assert state[1] is not None and state[2] is None


def test_stream_funnel_converges_to_batch(spark, sf_dir):
    """The stateful streaming funnel must converge to exactly the
    batch event_funnel row — same stage machine, replayed in
    micro-batches with O(1)-per-user state."""
    from open_reaction_database_web_scraper_spark.registry import REGISTRY
    got = REGISTRY["stream_funnel_stateful"].fn(spark, sf_dir).collect()[0]
    want = REGISTRY["event_funnel"].fn(spark, sf_dir).collect()[0]
    assert (got.n_users, got.n_viewed, got.n_clicked, got.n_purchased) \
        == (want.n_users, want.n_viewed, want.n_clicked, want.n_purchased)
