"""Round-8 tranche: corpus diagnostics (§2.12c).

Three curation-side diagnostics a 100 TB training-data pipeline runs
between dedup and sampling: per-document n-gram NOVELTY (how much of
a doc is first-seen here — the dedup-adjacent keep signal),
distribution DRIFT between corpus segments (two-sample
Kolmogorov-Smirnov over a fixed histogram — the scale-right KS), and
the VOCABULARY GROWTH curve (Heaps-law diagnostic: is the corpus
still contributing new tokens, or has collection saturated?).

All three are exactly DuckDB-oracled: hashes are the portable md5
family, ratios are rounded at the engine boundary, and every
cumulative runs over a FIXED tiny domain (10 deciles / 256 buckets),
never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout, load
from ..functions.vector_math import dot, unit_norm_sql, unit_normalize
from ..registry import register
from .vectors import _lsh_tables, plane_weights_lit
from .dedup import (
    _shingles,
    _tokens,
    portable_hash32,
    shingle_hash_unnest_sql,
)

_NOVELTY_SHINGLE_SQL = f"""
      SELECT DISTINCT doc_id, {shingle_hash_unnest_sql("t")} AS h
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS ({_NOVELTY_SHINGLE_SQL}
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
    ), per_doc AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_ngrams,
             CAST(SUM(CASE WHEN f.first_doc = sh.doc_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM sh JOIN firsts f ON f.h = sh.h
      GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_ngrams, 0) AS n_ngrams,
           COALESCE(p.n_novel, 0) AS n_novel,
           ROUND(COALESCE(p.n_novel / p.n_ngrams, 0.0), 9) AS novelty
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
    tags=("text", "dedup", "llm-data", "quality"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    3-word shingles whose first corpus occurrence (minimum doc_id) is
    this doc — ~1.0 for fresh content, →0 for recombinations of
    already-seen text. The keep-score complement to pair-based dedup
    (a doc can be 60% recycled without being anyone's near-dup).

    Scale shape: shingles hash to the portable 8-byte md5 family at
    the source, so the distinct, the first-occurrence min-aggregate
    (map-side combined) and the join back all shuffle (hash, doc_id)
    pairs — never shingle text. First-occurrence is an aggregate, not
    a window: no global sort anywhere. Ratio rounds to 9 dp on both
    sides (engine-boundary convention).
    """
    docs = fanout(load(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = (docs.select(
        "doc_id", F.explode(_shingles(_tokens())).alias("shingle"))
        .select("doc_id", portable_hash32(F.col("shingle")).alias("h"))
        .distinct())
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (sh.join(firsts, "h")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_ngrams"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                          .otherwise(0)).cast("bigint").alias("n_novel")))
    return (load(spark, sf_dir, "documents").select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
                F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
                F.round(F.coalesce(
                    F.col("n_novel") / F.col("n_ngrams"), F.lit(0.0)),
                    9).alias("novelty")))


KS_BUCKETS = 256


@register(
    "stats_ks_drift",
    oracle=f"""
    WITH pts AS (
      SELECT o_totalprice AS x, o_orderstatus = 'F' AS seg_a
      FROM orders
    ), rng AS (
      SELECT MIN(x) AS lo, MAX(x) AS hi FROM pts
    ), bucketed AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE LEAST(CAST(FLOOR({KS_BUCKETS} * (x - lo)
                                        / (hi - lo)) AS INTEGER),
                             {KS_BUCKETS - 1}) END AS bucket,
             seg_a
      FROM pts, rng
    ), counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN seg_a THEN 1 ELSE 0 END) AS BIGINT)
               AS ca,
             CAST(SUM(CASE WHEN seg_a THEN 0 ELSE 1 END) AS BIGINT)
               AS cb
      FROM bucketed GROUP BY bucket
    ), cum AS (
      SELECT bucket,
             SUM(ca) OVER (ORDER BY bucket) AS cum_a,
             SUM(cb) OVER (ORDER BY bucket) AS cum_b,
             SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
      FROM counts
    ), scored AS (
      SELECT bucket, n_a, n_b,
             ROUND(COALESCE(ABS(cum_a / NULLIF(n_a, 0)
                                - cum_b / NULLIF(n_b, 0)), 0.0), 9)
               AS gap
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           gap AS d_stat, CAST(bucket AS INTEGER) AS at_bucket
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gap DESC, bucket) AS rn
          FROM scored) WHERE rn = 1
    """,
    tags=("stats", "quality", "llm-data"),
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between corpus
    segments (here: finalized vs in-flight orders over o_totalprice —
    the stand-in for "last month's crawl vs this month's" feature
    drift). D = max over histogram buckets of |F_A - F_B|.

    The textbook KS sorts the pooled sample — a global sort, the
    anti-pattern at 100 TB. This is the fixed-histogram form: one
    (min, max) aggregate broadcast, one hash-aggregate into
    {KS_BUCKETS} buckets (map-side combined), then the cumulative
    CDFs run over the FIXED {KS_BUCKETS}-row domain — bounded state
    regardless of corpus size, the same trick num_histogram_fixed
    uses. Histogram granularity bounds the D estimate error at
    max-bucket-mass, the standard trade (a production drift monitor
    uses KLL/t-digest sketches, same contract). Bucket math is pure
    double arithmetic identical in both engines; the gap rounds to
    9 dp before the argmax so the reported bucket matches too.

    Degenerate inputs are pinned explicitly (round-8 review): a
    constant-price corpus (hi == lo) maps every row to bucket 0 by
    CASE on both engines — without the guard Spark's 0.0/0.0 = NaN
    and DuckDB's NULL diverge — and an empty segment coalesces the
    gap to 0.0 (D is undefined with an empty sample; 0.0 is the
    deterministic sentinel both engines agree on, vs NaN-sorts-first
    in Spark against NULL-sorts-last in DuckDB)."""
    pts = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderstatus") == "F").alias("seg_a"))
    rng = pts.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(KS_BUCKETS * (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))).cast("int"),
            F.lit(KS_BUCKETS - 1)))
    counts = (pts.crossJoin(F.broadcast(rng))
              .select(bucket.alias("bucket"), "seg_a")
              .groupBy("bucket")
              .agg(F.sum(F.when(F.col("seg_a"), 1).otherwise(0))
                   .cast("bigint").alias("ca"),
                   F.sum(F.when(F.col("seg_a"), 0).otherwise(1))
                   .cast("bigint").alias("cb")))
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    cum = counts.select(
        "bucket",
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"))
    scored = cum.select(
        "bucket", "n_a", "n_b",
        F.round(F.coalesce(
            F.abs(F.col("cum_a") / F.nullif(F.col("n_a"), F.lit(0))
                  - F.col("cum_b") / F.nullif(F.col("n_b"), F.lit(0))),
            F.lit(0.0)), 9).alias("gap"))
    wtop = Window.orderBy(F.desc("gap"), F.asc("bucket"))
    return (scored.withColumn("rn", F.row_number().over(wtop))
            .filter(F.col("rn") == 1)
            .select(F.col("n_a").cast("bigint").alias("n_a"),
                    F.col("n_b").cast("bigint").alias("n_b"),
                    F.col("gap").alias("d_stat"),
                    F.col("bucket").cast("int").alias("at_bucket")))


VOCAB_DECILES = 10


@register(
    "corpus_vocab_growth",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(doc_id) + 1 AS n FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id,
             CAST(('0x' || substr(md5(UNNEST(string_split(text, ' '))),
                   1, 8)) AS BIGINT) AS h
      FROM documents
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_doc FROM tok GROUP BY h
    ), decs AS (
      SELECT LEAST(CAST(FLOOR({VOCAB_DECILES} * first_doc / n)
                   AS INTEGER), {VOCAB_DECILES - 1}) AS decile
      FROM firsts, mx
    ), counts AS (
      SELECT decile, COUNT(*) AS new_tokens FROM decs GROUP BY decile
    ), spine AS (
      SELECT UNNEST(range({VOCAB_DECILES})) AS decile
    )
    SELECT CAST(s.decile AS INTEGER) AS decile,
           COALESCE(c.new_tokens, 0) AS new_tokens,
           CAST(SUM(COALESCE(c.new_tokens, 0))
                OVER (ORDER BY s.decile) AS BIGINT) AS cum_vocab
    FROM spine s LEFT JOIN counts c ON c.decile = s.decile
    """,
    tags=("text", "stats", "llm-data"),
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps-law diagnostic): the corpus is
    split into {VOCAB_DECILES} doc_id deciles and each distinct token
    is credited to the decile of its FIRST occurrence; the cumulative
    curve shows whether more data still buys new vocabulary (healthy
    sublinear growth) or the collection has saturated/duplicated
    (flat tail) — the collection-level complement to per-doc novelty.

    Scale shape: tokens hash to 8 bytes at the source, first
    occurrence is one min-aggregate on the hash (map-side combined,
    no window, no sort over data), decile assignment is row-local
    integer math off a 1-row MAX broadcast, and the cumulative runs
    over a fixed {VOCAB_DECILES}-row spine generated on both engines
    — so empty deciles still appear with new_tokens = 0."""
    docs = fanout(load(spark, sf_dir, "documents").select("doc_id", "text"))
    mx = load(spark, sf_dir, "documents").agg(
        (F.max("doc_id") + 1).alias("n"))
    tok = (docs.select(
        "doc_id", F.explode(_tokens()).alias("token"))
        .select("doc_id", portable_hash32(F.col("token")).alias("h"))
        .distinct())
    firsts = tok.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    decile = F.least(
        F.floor(F.lit(VOCAB_DECILES) * F.col("first_doc") / F.col("n"))
        .cast("int"),
        F.lit(VOCAB_DECILES - 1))
    counts = (firsts.crossJoin(F.broadcast(mx))
              .select(decile.alias("decile"))
              .groupBy("decile").agg(F.count("*").alias("new_tokens")))
    spine = spark.range(VOCAB_DECILES).select(
        F.col("id").cast("int").alias("decile"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (spine.join(counts, "decile", "left")
            .select("decile",
                    F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"))
            .withColumn("cum_vocab",
                        F.sum("new_tokens").over(wcum).cast("bigint")))


BPE_TOP_K = 20


@register(
    "text_bpe_pair_merge",
    oracle=f"""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
    ), wf AS (
      SELECT word, COUNT(*) AS freq FROM words
      WHERE length(word) >= 2 GROUP BY word
    ), exploded AS (
      SELECT UNNEST(list_transform(range(1, length(word)),
                    i -> substr(word, CAST(i AS INTEGER), 2))) AS pair,
             freq
      FROM wf
    ), pairs AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM exploded GROUP BY pair
    )
    SELECT pair, pair_count, CAST(rn AS INTEGER) AS rank
    FROM (SELECT pair, pair_count,
                 ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rn
          FROM pairs) WHERE rn <= {BPE_TOP_K}
    """,
    tags=("text", "tokenizer", "llm-data"),
)
def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training step over the corpus: count adjacent
    character pairs inside words, weighted by word frequency, and
    emit the top-{BPE_TOP_K} merge candidates — the inner loop of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016)
    expressed as two hash aggregates.

    Scale shape — the reason BPE training is feasible on a 100 TB
    corpus at all: the corpus collapses to its WORD-FREQUENCY table
    first (one hash agg, map-side combined — the vocabulary is
    millions of rows regardless of corpus size), and pair counting
    then runs over the vocab × word-length, never the corpus. The
    pair domain is bounded by alphabet² per step, so the second agg
    is tiny; top-k is a TakeOrderedAndProject. Iterating merges
    would loop this plan with a vocab rewrite per round — this
    registers the single auditable step (count parity is what
    tokenizer reproducibility rests on), exactly oracled with ties
    broken on the pair string."""
    docs = load(spark, sf_dir, "documents")
    words = fanout(docs.select(
        F.explode(F.split("text", " ")).alias("word")))
    wf = (words.filter(F.length("word") >= 2)
          .groupBy("word").agg(F.count("*").alias("freq")))
    pairs = (wf.select(
        F.explode(F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> substring(word, i, 2))")).alias("pair"),
        "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count")))
    wtop = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (pairs.withColumn("rank", F.row_number().over(wtop))
            .filter(F.col("rank") <= BPE_TOP_K)
            .select("pair", "pair_count", F.col("rank").cast("int")))


HARDNEG_K = 3       # hard negatives mined per probe vector
HARDNEG_SALT = 16   # label-key salt width (see the salting note)


@register(
    "sample_hard_negative_mine",
    oracle=f"""
    WITH emb0 AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), emb AS (
      SELECT vec_id, label, {unit_norm_sql('e')} AS e FROM emb0
    ), q AS (
      SELECT * FROM emb WHERE vec_id % 25 = 0
    ), c AS (
      SELECT * FROM emb WHERE vec_id % 25 <> 0
    ), scored AS (
      SELECT q.vec_id AS query_id, q.label AS label,
             c.vec_id AS negative_id, c.label AS neg_label,
             ROUND(list_dot_product(q.e, c.e), 9) AS cosine
      FROM q JOIN c ON q.label <> c.label
    ), ranked AS (
      SELECT query_id, label, negative_id, neg_label, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, negative_id) AS rn
      FROM scored
    )
    SELECT query_id, label, negative_id, neg_label, cosine
    FROM ranked WHERE rn <= {HARDNEG_K}
    """,
    tags=("vector", "sample", "llm-data"),
)
def sample_hard_negative_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training data: for every
    probe vector (the 1/25 deterministic slice vector_knn_join also
    uses), the {HARDNEG_K} highest-cosine vectors with a DIFFERENT
    label — the near-miss negatives that make embedding training
    converge (random negatives are trivially separable).

    The mirror image of vector_knn_join — but label INEQUALITY is
    not a blocking key, and a naive ``q.join(c, label != label)``
    plans as a nested-loop broadcast of the probe side, which GROWS
    with the corpus. Instead each probe fans out across the BOUNDED
    label domain minus its own (the only inequality join left is
    probe × |labels| rows — the same constant-small-side class as
    the engine's scalar-subquery broadcasts), and the corpus-sized
    join is then a plain hash EQUI-join on neg_label. This form is
    EXHAUSTIVE by spec — O(N²/100) pair work — and serves as the
    ground truth for sample_hard_negative_mine_ann, the celled
    composition that scales to 100 TB (probe pool narrowed to the
    probe's LSH candidate cells minus its own label; recall-floor
    tested against this query). Cosines are elementwise-exact
    cross-engine
    (double cast before the sequential fold) and rounded to 9 dp
    before ranking, tie-broken on negative_id — the round-8
    boundary convention.

    Round-10 pair-stage lever (the round-9 verdict's #1, resolved by
    measurement): vectors are unit-normalized ONCE per side
    (functions/vector_math.unit_normalize, mirrored in the oracle),
    so the O(pairs) stage evaluates ONE interpreted dot fold instead
    of dot + two norms — 13.69 s → 8.67 s at the 10× decade. The
    pre-window top-k the verdict hypothesized was already present:
    Spark's InferWindowGroupLimit plants a Partial WindowGroupLimit
    below the final window's exchange (pinned in
    tests/test_plans.py::test_rank_windows_partial_group_limit), and
    the measured on/off delta was noise because the fold volume, not
    the sort, dominates — full decomposition in SCALING.md round
    10."""
    emb = unit_normalize(
        load(spark, sf_dir, "embeddings").select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("e")),
        "e")
    is_probe = F.pmod(F.col("vec_id"), F.lit(25)) == 0
    q = emb.filter(is_probe).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("e").alias("qe"))
    lab = emb.select(F.col("label").alias("neg_label")).distinct()
    # SALTED equi-join (the round-8c probe's finding): neg_label has
    # only |labels| distinct keys, so however many executors exist,
    # at most |labels| tasks score pairs - the 100x probe measured
    # the host stuck ~4-wide on a 1.2B-pair stage. Salting the key
    # to (neg_label, query_id % SALT) with the pool side replicated
    # xSALT restores SALT*|labels|-way parallelism for a xSALT
    # pool-shuffle cost - join_salted_skew's trade, applied here
    # because a bounded key domain is a PERMANENT skew. Output
    # values are identical (salting only re-partitions the pairs).
    qx = (q.join(F.broadcast(lab), F.col("label") != F.col("neg_label"))
          .withColumn("salt",
                      F.pmod(F.col("query_id"), F.lit(HARDNEG_SALT))
                      .cast("int")))
    c = (emb.filter(~is_probe)
         .select(F.col("vec_id").alias("negative_id"),
                 F.col("label").alias("neg_label"),
                 F.col("e").alias("ce"))
         .withColumn("salt", F.explode(F.sequence(
             F.lit(0), F.lit(HARDNEG_SALT - 1)))))
    scored = (qx.join(c, ["neg_label", "salt"])
              .withColumn("cosine",
                          F.round(dot(F.col("qe"), F.col("ce")), 9)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("negative_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= HARDNEG_K)
            .select("query_id", "label", "negative_id", "neg_label",
                    "cosine"))


HARDNEG_TABLES = 8        # OR-amplification buys the recall floor
HARDNEG_TARGET_BUCKET = 64  # target pool vectors per bucket per table
HARDNEG_MIN_BITS, HARDNEG_MAX_BITS = 3, 24
HARDNEG_PLANE_BASE = 2000  # plane namespace: ANN=0, dedup=1000, miner=2000


def _hardneg_ann_oracle_sql() -> str:
    """DuckDB SQL recomputing the celled miner EXACTLY: the same
    driver-side plane weights interpolate as a DOUBLE[][] literal
    (plane_weights_lit — the vector_ann_lsh/dedup_embed_cosine
    contract), bits is re-derived from COUNT(*) with the same
    clamped-ceil-log2 formula, so both engines fold identical sign
    bits into identical buckets, build the identical cross-label
    candidate set, and rerank with the 9-dp-rounded exact cosine
    (vectors unit-normalized in the emb CTE exactly as the Spark
    side's unit_normalize — round-10 pair-stage lever — so the
    rerank is one dot fold and the plane dots fold the same
    normalized elements).

    Near-zero plane-dot assumption (round-9 advice, documented): the
    sign bit compares a float dot against 0 on both engines; the two
    folds are elementwise-identical by the dot convention, so a flip
    would need an accumulation-order divergence, which the sequential
    fold contract rules out — but the assumption that no plane dot
    sits within float error of 0 is additionally MEASURED:
    tests/test_round10.py::test_hardneg_ann_plane_dot_margin pins
    the minimum |plane·e| at both driver SFs orders of magnitude
    above 1-ulp territory. Approximate vs the exhaustive miner,
    exact vs this plan — fully value-checked."""
    w_lit = plane_weights_lit(HARDNEG_TABLES * HARDNEG_MAX_BITS,
                              HARDNEG_PLANE_BASE)
    return f"""
    WITH emb0 AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), emb AS (
      SELECT vec_id, label, {unit_norm_sql('e')} AS e FROM emb0
    ), params AS (
      SELECT LEAST(GREATEST(CAST(CEIL(LOG2(GREATEST(COUNT(*), 2)
                 / {HARDNEG_TARGET_BUCKET}.0)) AS INTEGER),
                 {HARDNEG_MIN_BITS}), {HARDNEG_MAX_BITS}) AS bits
      FROM embeddings
    ), w AS (SELECT {w_lit} AS w),
    bitv AS (
      SELECT e.vec_id, e.label, t.t AS tbl,
             CASE WHEN list_dot_product(e.e,
                    (w.w)[p.bits * t.t + i.i + 1][1:len(e.e)]) > 0
                  THEN (CAST(1 AS BIGINT) << (p.bits - 1 - i.i))
                  ELSE 0 END AS bv
      FROM emb e, params p, w,
           range(0, {HARDNEG_TABLES}) AS t(t),
           range(0, {HARDNEG_MAX_BITS}) AS i(i)
      WHERE i.i < p.bits
    ), sigs AS (
      SELECT vec_id, label, tbl, SUM(bv) AS bucket FROM bitv
      GROUP BY vec_id, label, tbl
    ), cand AS (
      SELECT DISTINCT s.vec_id AS query_id, s.label AS label,
             c.vec_id AS negative_id, c.label AS neg_label
      FROM sigs s JOIN sigs c
        ON s.tbl = c.tbl AND s.bucket = c.bucket
       AND s.label <> c.label
      WHERE s.vec_id % 25 = 0 AND c.vec_id % 25 <> 0
    ), scored AS (
      SELECT cand.query_id, cand.label, cand.negative_id,
             cand.neg_label,
             ROUND(list_dot_product(q.e, c.e), 9) AS cosine
      FROM cand
      JOIN emb q ON q.vec_id = cand.query_id
      JOIN emb c ON c.vec_id = cand.negative_id
    ), ranked AS (
      SELECT query_id, label, negative_id, neg_label, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, negative_id) AS rn
      FROM scored
    )
    SELECT query_id, label, negative_id, neg_label, cosine
    FROM ranked WHERE rn <= {HARDNEG_K}
    """


@register(
    "sample_hard_negative_mine_ann",
    oracle=_hardneg_ann_oracle_sql(),
    tags=("vector", "sample", "approx", "llm-data"),
)
def sample_hard_negative_mine_ann(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Hard-negative mining composed with the ANN index — the 100 TB
    form of sample_hard_negative_mine (the round-8 verdict's one
    `weak`). Each probe's negative pool is narrowed from "every
    other-label vector" (O(N²/100) pair work — the exhaustive spec)
    to the probe's multi-table sign-LSH candidate CELLS minus its
    own label, then exact cosine top-{HARDNEG_K} within the pool.

    Scale shape — why this survives where the exhaustive form
    can't: vectors shuffle once as (table, bucket) keys and the
    candidate join is a plain hash join whose per-probe fan-out is
    BUCKET OCCUPANCY, not corpus size. The signature width ADAPTS
    like dedup_embed_cosine's — bits = log2(N / {HARDNEG_TARGET_BUCKET}),
    clamped to [{HARDNEG_MIN_BITS}, {HARDNEG_MAX_BITS}] — so buckets
    hold ~{HARDNEG_TARGET_BUCKET} pool vectors each at ANY corpus
    size and candidate work grows ∝ N (per-probe candidates ≈
    {HARDNEG_TABLES} tables × {HARDNEG_TARGET_BUCKET}, constant),
    while OR-ing {HARDNEG_TABLES} independent tables buys back the
    recall narrower buckets alone would lose (measured 0.80 of the
    exhaustive top-{HARDNEG_K} at sf0.001/sf0.01; floor-pinned ≥0.6
    in tests/test_round9.py like the vector_ann_* family). The
    output itself is exactly DuckDB-value-checked because the oracle
    replays the same plane weights and the same count-derived bits.
    Probed 1x/10x/100x in SCALING.md round 9 — subquadratic decades
    where the exhaustive form's are quadratic."""
    import math

    raw = load(spark, sf_dir, "embeddings")
    n = raw.count()  # sizes the signature (table statistics at scale)
    bits = min(max(int(math.ceil(math.log2(max(n, 2)
                                           / HARDNEG_TARGET_BUCKET))),
                   HARDNEG_MIN_BITS), HARDNEG_MAX_BITS)
    # unit-normalize once (round-10 lever, see the exhaustive twin):
    # the rerank becomes one dot fold per candidate, and bucket signs
    # are preserved — dividing by a positive norm cannot flip
    # sign(plane·e) beyond the float margin the plane-dot margin test
    # pins, and the oracle folds the SAME normalized elements.
    emb = unit_normalize(
        fanout(raw).select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("e")),
        "e")
    is_probe = F.pmod(F.col("vec_id"), F.lit(25)) == 0
    q = emb.filter(is_probe).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("e").alias("qe"))
    pool = emb.filter(~is_probe).select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("neg_label"),
        F.col("e").alias("ce"))
    tables = lambda col: _lsh_tables(  # noqa: E731
        spark, col, n_tables=HARDNEG_TABLES, bits=bits,
        plane_base=HARDNEG_PLANE_BASE)
    qb = q.select(
        "query_id", "label", "qe",
        F.posexplode(tables(F.col("qe"))).alias("table_id", "bucket"))
    cb = pool.select(
        "negative_id", "neg_label",
        F.posexplode(tables(F.col("ce"))).alias("table_id", "bucket"))
    # candidate exchange carries ids + one query vector, never both
    # embeddings; the pool vector re-joins by id after the dedup.
    cand = (qb.join(cb, ["table_id", "bucket"])
            .filter(F.col("label") != F.col("neg_label"))
            .select("query_id", "label", "qe",
                    "negative_id", "neg_label")
            .dropDuplicates(["query_id", "negative_id"]))
    scored = (cand.join(pool.select("negative_id", "ce"),
                        "negative_id")
              .withColumn("cosine",
                          F.round(dot(F.col("qe"), F.col("ce")), 9)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("negative_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= HARDNEG_K)
            .select("query_id", "label", "negative_id", "neg_label",
                    "cosine"))
