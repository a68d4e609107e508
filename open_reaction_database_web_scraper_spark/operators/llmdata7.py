"""Round-10 tranche: compression-side retrieval + curation closers.

Four operations a 100 TB training-data pipeline runs around its
dedup/retrieval core, all exactly DuckDB-oracled:

- ``embedding_binarize_hamming`` — 1-bit embedding compression
  (sign binarization into two 32-bit signature halves) + Hamming
  top-k retrieval over the compressed codes: the memory-bound
  rerank trick binary-embedding serving uses (64 bytes of floats →
  8 bytes of bits, XOR+popcount instead of 64 FMAs per pair).
- ``text_gopher_quality_rules`` — the Gopher-style rule battery
  (word count band, mean word length band, symbol ratio, alphabetic
  ratio, stopword presence) as one JVM-side pass emitting both the
  per-rule signals and the conjunction verdict.
- ``curation_cluster_representative`` — the KEEP/DROP decision
  after exact dedup: one representative per content-sha cluster
  (longest text, ties to lowest doc_id), every other member marked
  dropped — the step that turns dedup REPORTS into an actionable
  curation plan.
- ``graph_degree_topk`` — hub extraction over the part–supplier
  graph (top-20 by degree): the "which nodes dominate connectivity"
  diagnostic that guides skew salting decisions elsewhere.

Scale notes: binarize+Hamming is one narrow projection (two 32-term
integer folds per row) plus a 16-probe broadcast against the corpus
— O(16·N) XOR/popcount pairs with the rank window pre-reduced by
Spark's partial WindowGroupLimit (the round-10 plan pin); the probe
set is FIXED-size by construction, so the pair stage scales linearly
with the corpus. Gopher rules are per-row HOF arithmetic (no
shuffle). The representative pick shuffles 32-byte digests once and
runs one window over sha groups. Degree top-k is a hash agg into a
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout, load
from ..functions.vector_math import unit_norm_sql
from ..registry import register
from .dedup import _clusters_oracle_sql, dedup_clusters
from .graph import _bipartite_edges
from .text import STOPWORDS

EMB_DIM = 64       # driver embedding width (two 32-bit halves)
HAMMING_PROBES = 16   # fixed probe set: vec_id < 16 at every SF
HAMMING_K = 3

# the two signature halves as Spark SQL folds: bits i∈[0,32) from
# elements 1..32, bits from elements 33..64 — CASE > 0D matches the
# oracle's float comparison exactly (same parquet floats both sides)
_SIG_LO = ("aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
           "IF(element_at(embedding, i + 1) > CAST(0 AS FLOAT), "
           "shiftleft(1L, i), 0L))")
_SIG_HI = ("aggregate(sequence(32, 63), 0L, (acc, i) -> acc + "
           "IF(element_at(embedding, i + 1) > CAST(0 AS FLOAT), "
           "shiftleft(1L, i - 32), 0L))")


@register(
    "embedding_binarize_hamming",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(range(1, 33),
               i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 1)
                         ELSE 0::BIGINT END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(33, 65),
               i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 33)
                         ELSE 0::BIGINT END)) AS BIGINT) AS hi
      FROM embeddings
    ), probes AS (
      SELECT * FROM sig WHERE vec_id < {HAMMING_PROBES}
    ), pairs AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             CAST(bit_count(xor(p.lo, c.lo))
                  + bit_count(xor(p.hi, c.hi)) AS INTEGER) AS hamming
      FROM probes p JOIN sig c ON c.vec_id <> p.vec_id
    ), ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY probe_id
               ORDER BY hamming, cand_id) AS INTEGER) AS rnk
      FROM pairs
    )
    SELECT probe_id, cand_id, hamming, rnk
    FROM ranked WHERE rnk <= {HAMMING_K}
    """,
    tags=("vector", "llm-data", "multimodal-adjacent"),
)
def embedding_binarize_hamming(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """1-bit embedding compression + Hamming top-k: binarize each
    64-dim vector by element sign into two 32-bit halves (bit i set
    iff e[i] > 0 — the sign-LSH idea applied as CODES, not buckets),
    then retrieve each probe's top-3 nearest codes by Hamming
    distance (XOR + popcount, ties to the lower vec_id).

    Why two halves instead of one 64-bit word: bit 63 is the BIGINT
    sign bit and DuckDB refuses ``1 << 63`` as overflow — two
    unsigned-safe halves keep the oracle exactly replayable with
    zero semantic cost (popcounts add).

    Plan shape: the signature fold is one narrow integer projection
    (whole-stage codegen, no Python); the probe side is a fixed
    {HAMMING_PROBES}-row broadcast, so the pair stage is a
    broadcast-nested-loop over O(16·N) 8-byte XOR/popcount pairs —
    the cheap-compare regime binarization exists to enable — and the
    per-probe rank window is pre-reduced by the Partial
    WindowGroupLimit the round-10 plan pins require. At 100 TB the
    probe set stays fixed and the scan stays linear; the float
    corpus is never re-read after the one binarizing pass.
    """
    sig = (fanout(load(spark, sf_dir, "embeddings"))
           .select("vec_id",
                   F.expr(_SIG_LO).alias("lo"),
                   F.expr(_SIG_HI).alias("hi")))
    probes = (sig.filter(F.col("vec_id") < HAMMING_PROBES)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("lo").alias("plo"),
                      F.col("hi").alias("phi")))
    pairs = (sig.join(F.broadcast(probes),
                      F.col("vec_id") != F.col("probe_id"))
             .select("probe_id", F.col("vec_id").alias("cand_id"),
                     (F.bit_count(F.expr("plo ^ lo"))
                      + F.bit_count(F.expr("phi ^ hi")))
                     .cast("int").alias("hamming")))
    w = Window.partitionBy("probe_id").orderBy("hamming", "cand_id")
    return (pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= HAMMING_K)
            .select("probe_id", "cand_id", "hamming", "rnk"))


_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MWL = 3.0
_GOPHER_MAX_MWL = 10.0
_GOPHER_MAX_SYMBOL = 0.1
_GOPHER_MIN_ALPHA = 0.8
_GOPHER_MIN_STOP = 2


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS words
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(words) AS n_words,
             CAST(list_sum(list_transform(words, w -> len(w)))
                  AS BIGINT) AS char_sum,
             len(text) - len(replace(text, '#', '')) AS n_hash,
             len(list_filter(words,
                 w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
             len(list_filter({list(STOPWORDS)!r},
                 s -> list_contains(words, s))) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_words,
           ROUND(char_sum / n_words, 9) AS mean_word_len,
           ROUND(n_hash / n_words, 9) AS symbol_ratio,
           ROUND(n_alpha / n_words, 9) AS alpha_ratio,
           CAST(stop_hits AS INTEGER) AS stop_hits,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
            AND char_sum / n_words BETWEEN {_GOPHER_MIN_MWL}
                                       AND {_GOPHER_MAX_MWL}
            AND n_hash / n_words < {_GOPHER_MAX_SYMBOL}
            AND n_alpha / n_words > {_GOPHER_MIN_ALPHA}
            AND stop_hits >= {_GOPHER_MIN_STOP}) AS passes_gopher
    FROM m
    """,
    tags=("text", "llm-data", "quality"),
)
def text_gopher_quality_rules(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Gopher-style quality rule battery (the Rae et al. 2021
    heuristics re-expressed over the driver corpus): per document,
    the five signals — word count, mean word length, symbol ratio
    ('#' characters per word), alphabetic-word ratio, distinct
    stopword hits — and the conjunction verdict ``passes_gopher``.
    Emitting the signals alongside the verdict is deliberate: a
    curation pipeline tunes thresholds from the signal distribution,
    then applies the verdict column as its filter.

    All five signals are integer counts or integer-ratio doubles
    rounded at the engine boundary (9 dp), so the whole battery is
    exactly value-checked cross-engine. Everything is JVM-side HOF
    arithmetic over the one tokenization every text query shares
    (split on single space) — no shuffle, no Python, scales as a
    pure map stage.
    """
    docs = fanout(load(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    char_sum = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"), lambda a, x: a + x)
    n_hash = (F.length("text")
              - F.length(F.regexp_replace("text", "#", ""))).cast("long")
    n_alpha = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in STOPWORDS]),
        lambda s: F.array_contains(words, s)))
    mwl = char_sum / n_words
    sym = n_hash / n_words
    alpha = n_alpha / n_words
    passes = (n_words.between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
              & mwl.between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
              & (sym < _GOPHER_MAX_SYMBOL)
              & (alpha > _GOPHER_MIN_ALPHA)
              & (stop_hits >= _GOPHER_MIN_STOP))
    return docs.select(
        "doc_id", n_words.alias("n_words"),
        F.round(mwl, 9).alias("mean_word_len"),
        F.round(sym, 9).alias("symbol_ratio"),
        F.round(alpha, 9).alias("alpha_ratio"),
        stop_hits.cast("int").alias("stop_hits"),
        passes.alias("passes_gopher"))


@register(
    "curation_cluster_representative",
    oracle=f"""
    WITH clusters AS (
      SELECT * FROM ({_clusters_oracle_sql(True)})
    ), joined AS (
      SELECT c.doc_id, c.cluster_id, c.cluster_size, d.n_chars
      FROM clusters c JOIN documents d USING (doc_id)
    ), picked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id)
                  AS pick
      FROM joined
    )
    SELECT doc_id, cluster_id, cluster_size,
           (pick = 1) AS is_representative,
           CASE WHEN pick = 1 THEN 'keep' ELSE 'drop' END AS action
    FROM picked
    """,
    tags=("dedup", "llm-data", "pipeline", "iterative"),
)
def curation_cluster_representative(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The KEEP/DROP plan after dedup clustering: within every
    duplicate cluster ``dedup_clusters`` finds (exact-sha stars ∪
    MinHash near-dup pairs, connected components), mark one
    representative (longest text wins, ties to the lowest doc_id)
    'keep' and every other member 'drop' — the actionable output a
    curation pipeline feeds its delete/tombstone stage, where the
    cluster queries only REPORT membership.

    Composes the registered ``dedup_clusters`` (its CC loop and
    cache discipline included) with one broadcast-sized join back to
    documents for the length signal and one window pass over
    cluster_id partitions. The deterministic (n_chars DESC, doc_id)
    order makes the decision shard-stable — re-running on different
    partitioning keeps the same representative, which is what makes
    the plan idempotently re-appliable at 100 TB. The oracle nests
    the full recursive-CTE closure the cluster queries already
    value-check, so the keep/drop DECISIONS are exactly verified.
    """
    clusters = dedup_clusters(spark, sf_dir)
    lens = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = clusters.join(lens, "doc_id")
    wpick = Window.partitionBy("cluster_id") \
                  .orderBy(F.col("n_chars").desc(), "doc_id")
    return (joined.withColumn("pick", F.row_number().over(wpick))
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("pick") == 1).alias("is_representative"),
                    F.when(F.col("pick") == 1, "keep").otherwise("drop")
                    .alias("action")))


@register(
    "graph_degree_topk",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), edges AS (
      SELECT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
      FROM pairs
      UNION ALL
      SELECT 's:' || l_suppkey AS src, 'p:' || l_partkey AS dst
      FROM pairs
    )
    SELECT src AS node, COUNT(*) AS degree
    FROM edges GROUP BY src
    ORDER BY degree DESC, node
    LIMIT 20
    """,
    tags=("graph", "topk"),
)
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub extraction: the 20 highest-degree vertices of the
    part–supplier graph (degree ties broken by node id). The "who
    dominates connectivity" diagnostic that motivates skew handling
    downstream — a hub found here is exactly the key a salted join
    (join_salted_skew) would salt.

    Plan shape: the shared edge builder's distinct, one hash agg
    with map-side partials, then a TakeOrderedAndProject — the
    bounded-k sort that never materializes a global order. Scales
    as the degree distribution's hash agg; nothing driver-side.
    """
    edges = _bipartite_edges(spark, sf_dir)
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("degree"))
            .orderBy(F.col("degree").desc(), "node")
            .limit(20))


TRUNC_DIM = 16  # matryoshka prefix width audited against full 64


@register(
    "vector_matryoshka_truncate",
    oracle=f"""
    WITH emb0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS e64,
             (embedding::DOUBLE[])[1:{TRUNC_DIM}] AS e16
      FROM embeddings
    ), emb AS (
      SELECT vec_id, {unit_norm_sql('e64')} AS n64,
             {unit_norm_sql('e16')} AS n16
      FROM emb0
    ), probes AS (
      SELECT vec_id AS probe_id, n64 AS p64, n16 AS p16
      FROM emb WHERE vec_id < {HAMMING_PROBES}
    ), pairs AS (
      SELECT probe_id, c.vec_id AS cand_id,
             ROUND(list_dot_product(p.p64, c.n64), 9) AS c64,
             ROUND(list_dot_product(p.p16, c.n16), 9) AS c16
      FROM probes p JOIN emb c ON c.vec_id <> p.probe_id
    ), rf AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY c64 DESC, cand_id) AS rnk
      FROM pairs
    ), rt AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY c16 DESC, cand_id) AS rnk
      FROM pairs
    )
    SELECT f.probe_id, f.cand_id AS top_full, f.c64 AS cos_full,
           t.cand_id AS top_trunc, t.c16 AS cos_trunc,
           (f.cand_id = t.cand_id) AS agree
    FROM rf f JOIN rt t ON t.probe_id = f.probe_id AND t.rnk = 1
    WHERE f.rnk = 1
    """,
    tags=("vector", "llm-data"),
)
def vector_matryoshka_truncate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit (MRL-style): for each probe, the
    exact top-1 cosine neighbor at the FULL 64 dims vs at the first
    {TRUNC_DIM} dims only, plus the agreement flag — the evaluation a
    pipeline runs before committing to truncated embeddings (storage
    and ANN cost drop 4x; this query measures what retrieval loses).

    Both widths unit-normalize once per side (the round-10 lever) so
    the pair stage is two dot folds; probes are the fixed 16-vector
    set the binarize query uses, so pair work is O(16·N). Cosines
    round at 9 dp with vec_id tie-breaks, making the argmax exact
    cross-engine; the two rank windows share one (probe_id)
    partitioning and are pre-reduced by the inferred partial
    WindowGroupLimit.
    """
    # fanout (round 14, the VERDICT r13 #8 sweep continued into the
    # nonzero-shuffle map): the heavy narrow work — 2 unit
    # normalizations + 2 dot folds × 16 probes per vector — runs in
    # the SCAN stage, and the local embeddings table is one split, so
    # it all ran on one core (only the 32 post-window rows shuffle).
    # Interleaved A/B at sf0.1: med 1.14/1.00 → 0.81/0.84 s, output
    # identical. Same no-op-on-real-layouts contract as every other
    # catalog.fanout call.
    emb = fanout(load(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e64"))
    emb = emb.withColumn("e16", F.slice("e64", 1, TRUNC_DIM))
    from ..functions.vector_math import dot, unit_normalize
    emb = unit_normalize(unit_normalize(emb, "e64"), "e16")
    probes = (emb.filter(F.col("vec_id") < HAMMING_PROBES)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("e64").alias("p64"),
                      F.col("e16").alias("p16")))
    pairs = (emb.join(F.broadcast(probes),
                      F.col("vec_id") != F.col("probe_id"))
             .select("probe_id", F.col("vec_id").alias("cand_id"),
                     F.round(dot(F.col("p64"), F.col("e64")), 9)
                     .alias("c64"),
                     F.round(dot(F.col("p16"), F.col("e16")), 9)
                     .alias("c16")))
    wf = Window.partitionBy("probe_id") \
               .orderBy(F.col("c64").desc(), "cand_id")
    wt = Window.partitionBy("probe_id") \
               .orderBy(F.col("c16").desc(), "cand_id")
    full = (pairs.withColumn("rnk", F.row_number().over(wf))
            .filter(F.col("rnk") == 1)
            .select("probe_id", F.col("cand_id").alias("top_full"),
                    F.col("c64").alias("cos_full")))
    trunc = (pairs.withColumn("rnk", F.row_number().over(wt))
             .filter(F.col("rnk") == 1)
             .select("probe_id", F.col("cand_id").alias("top_trunc"),
                     F.col("c16").alias("cos_trunc")))
    return (full.join(trunc, "probe_id")
            .select("probe_id", "top_full", "cos_full",
                    "top_trunc", "cos_trunc",
                    (F.col("top_full") == F.col("top_trunc"))
                    .alias("agree")))


@register(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(user_id % 2 AS INTEGER) AS bucket,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ), rt AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS rtot
      FROM cells GROUP BY 1
    ), ct AS (
      SELECT bucket, CAST(SUM(o) AS BIGINT) AS ctot
      FROM cells GROUP BY 1
    ), n AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
    ), dom AS (
      SELECT rt.event_type, rt.rtot, ct.bucket, ct.ctot, n.n
      FROM rt CROSS JOIN ct CROSS JOIN n
    ), ex AS (
      SELECT d.event_type, d.bucket,
             CAST(COALESCE(c.o, 0) AS DOUBLE) AS o,
             CAST(d.rtot AS DOUBLE) * CAST(d.ctot AS DOUBLE)
               / CAST(d.n AS DOUBLE) AS e
      FROM dom d LEFT JOIN cells c
        ON c.event_type = d.event_type AND c.bucket = d.bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT bucket) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(ROUND((o - e) * (o - e) / e, 9)
                         AS DECIMAL(24,9))) AS DOUBLE) AS chi2
    FROM ex
    """,
    tags=("stats", "analytics"),
)
def stats_chi2_independence(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and user
    parity (a deliberately-independent pair — the null-hypothesis
    smoke a drift monitor calibrates against): builds the full
    type × parity contingency domain (zero cells INCLUDED — a
    missing combination still contributes (0−e)²/e), expected counts
    from the marginals, and the χ² statistic with its degrees of
    freedom.

    Determinism discipline: observed and marginal counts are exact
    integers; expected values are single IEEE double expressions of
    those integers (identical cross-engine); each cell's
    contribution rounds at 9 dp into DECIMAL(24,9) so the final SUM
    is order-insensitive (the decimal-accumulator idiom) — and the
    decimal image stays far below 2^53, so the closing DOUBLE cast
    rounds once in both engines. Scale shape: one corpus-sized hash
    agg; everything after runs on the tiny marginal tables
    (broadcast joins over a |types|×2 domain).
    """
    ev = load(spark, sf_dir, "events")
    cells = (ev.groupBy("event_type",
                        (F.col("user_id") % 2).cast("int").alias("bucket"))
             .agg(F.count("*").alias("o")))
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("rtot"))
    ct = cells.groupBy("bucket").agg(F.sum("o").alias("ctot"))
    n = cells.agg(F.sum("o").alias("n"))
    dom = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(n))
    ex = (dom.join(cells, ["event_type", "bucket"], "left")
          .select("event_type", "bucket",
                  F.coalesce(F.col("o"), F.lit(0)).cast("double")
                  .alias("o"),
                  (F.col("rtot").cast("double")
                   * F.col("ctot").cast("double")
                   / F.col("n").cast("double")).alias("e")))
    contrib = F.round((F.col("o") - F.col("e"))
                      * (F.col("o") - F.col("e")) / F.col("e"), 9) \
        .cast("decimal(24,9)")
    return ex.agg(
        F.count("*").cast("long").alias("n_cells"),
        ((F.count_distinct("event_type") - 1)
         * (F.count_distinct("bucket") - 1)).cast("long").alias("dof"),
        F.sum(contrib).cast("double").alias("chi2"))
