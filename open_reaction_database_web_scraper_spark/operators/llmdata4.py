"""Round-3 tranche 2: corpus export + semantic dedup [E].

The reference ends every run by serializing its accumulated corpus
to a single JSON file (web_scrpaer_2.py:545-548) — fine for 241
documents, lethal for 100 TB (one writer, one file, no parallel
read downstream). `export_jsonl_sharded` is the production version:
size-targeted JSONL shards with a verified manifest.
`dedup_semdedup` adds the embedding-space dedup (SemDeDup,
Abbas et al. 2023: cluster, then drop near-identical members per
cluster) that text-hash dedup cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.vector_math import cosine_similarity
from ..registry import register
from .scans import _sink_dir
from .vectors import _lsh_tables

# Target shard payload in characters — tiny here so the sf0.01
# fixture exercises multi-shard layout; production would use ~256 MB.
_SHARD_TARGET_CHARS = 32_768


@register(
    "export_jsonl_sharded",
    oracle=f"""
    WITH t AS (
      SELECT GREATEST(1, CAST(CEIL(SUM(n_chars) / {_SHARD_TARGET_CHARS}.0)
                              AS BIGINT)) AS n_shards
      FROM documents
    )
    SELECT CAST(doc_id % n_shards AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM documents, t
    GROUP BY CAST(doc_id % n_shards AS BIGINT)
    """,
    tags=("sink", "llm-data"),
)
def export_jsonl_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-targeted sharded JSONL export — the training-data hand-off
    format (one `{{"doc_id":…,"text":…}}` object per line, shard files
    sized for the data-loader). Returns the manifest of the RE-READ
    shards, so a sink bug (lost docs, mis-assigned shard) breaks the
    oracle hash.

    Scale shape: the shard count derives from one global SUM —
    carried as a 1-row broadcast join, never collected — and shard
    assignment is `doc_id % n_shards`, a pure row-local function:
    any re-run over the same corpus re-derives the identical layout
    with no coordination table, and GIVEN a shard count, any worker
    re-derives any doc's shard locally (a strict subset run would
    derive a smaller n_shards — pin the count when exporting
    incrementally). `repartition(shard)`
    makes each output task own exactly one shard directory: file
    count == shard count, no small-file spray. The JSONL re-read is
    schema-pinned (no sampling inference pass over 100 TB).
    """
    docs = load(spark, sf_dir, "documents")
    n_shards = docs.agg(
        F.greatest(
            F.lit(1),
            F.ceil(F.sum("n_chars") / float(_SHARD_TARGET_CHARS))
            .cast("bigint")).alias("n_shards"))
    sharded = (docs.crossJoin(F.broadcast(n_shards))
               .select("doc_id", "text", "lang", "n_chars",
                       (F.col("doc_id") % F.col("n_shards"))
                       .cast("bigint").alias("shard")))
    out = _sink_dir("export_jsonl_sharded")
    (sharded.repartition(F.col("shard"))
     .write.mode("overwrite").partitionBy("shard").json(out))
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, n_chars bigint, "
        "shard bigint").json(out)
    return back.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"))


@register(
    "quality_gate_reasons",
    oracle="""
    WITH sig AS (
      SELECT doc_id, lang,
             CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_nonspace,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '',
                                                       'g')) AS BIGINT)
               AS n_digits,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_t
      FROM documents
    ), gated AS (
      SELECT doc_id, lang, n_tokens,
             CONCAT_WS('|',
               CASE WHEN n_tokens IS NULL THEN 'null_text' END,
               CASE WHEN n_tokens < 20 THEN 'too_short' END,
               CASE WHEN n_tokens > 1000 THEN 'too_long' END,
               CASE WHEN n_tokens >= 20 AND n_nonspace > n_tokens * 12
                 THEN 'long_words' END,
               CASE WHEN n_digits * 5 > n_chars_t THEN 'digit_heavy' END)
               AS reasons
      FROM sig
    )
    SELECT doc_id, lang, n_tokens, reasons,
           reasons = '' AS keep
    FROM gated
    """,
    tags=("text", "llm-data", "quality"),
)
def quality_gate_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble quality gate with an audit trail: every document
    gets a keep/drop decision plus the pipe-joined list of WHICH
    rules fired (too_short / too_long / long_words / digit_heavy) —
    the reason column is what makes a 100 TB filter debuggable
    (per-rule kill counts, rule-overlap analysis, appeals) instead
    of a black-box boolean.

    All signals are integer counts compared with cross-multiplied
    integer thresholds (mean token length > 12 is
    `n_nonspace > n_tokens*12`; digit ratio > 20% is
    `n_digits*5 > n_chars`), so no float ever forms and both
    engines agree bit-for-bit. One map-only pass — no shuffle at
    all; CONCAT_WS skips the NULLs of rules that did not fire in
    both engines, and `keep` is simply "no reason fired".
    """
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    n_nonspace = F.length(F.expr("replace(text, ' ', '')")).cast("bigint")
    n_digits = (F.length("text")
                - F.length(F.regexp_replace("text", "[0-9]", ""))
                ).cast("bigint")
    n_chars_t = F.length("text").cast("bigint")
    sig = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"),
        n_nonspace.alias("n_nonspace"), n_digits.alias("n_digits"),
        n_chars_t.alias("n_chars_t"))
    reasons = F.concat_ws(
        "|",
        # NULL text nulls every count, so no other rule can fire —
        # without an explicit rule a contentless row would sail
        # through with keep = true
        F.when(F.col("n_tokens").isNull(), "null_text"),
        F.when(F.col("n_tokens") < 20, "too_short"),
        F.when(F.col("n_tokens") > 1000, "too_long"),
        F.when((F.col("n_tokens") >= 20)
               & (F.col("n_nonspace") > F.col("n_tokens") * 12),
               "long_words"),
        F.when(F.col("n_digits") * 5 > F.col("n_chars_t"), "digit_heavy"))
    return sig.select(
        "doc_id", "lang", "n_tokens", reasons.alias("reasons"),
        (reasons == "").alias("keep"))


@register(
    "sample_weighted_bernoulli",
    oracle="""
    WITH t AS (
      SELECT GREATEST(1, CAST(SUM(n_chars) // COUNT(*) AS BIGINT))
        AS avg_chars
      FROM documents
    ), marked AS (
      SELECT lang, n_chars,
             ((doc_id % 65536) * 2654435761
              + ((doc_id // 65536) % 65536) * 2041643008) % 4294967296 <
               (n_chars * 4294967296) // (10 * avg_chars) AS picked
      FROM documents, t
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN picked THEN n_chars ELSE 0 END) AS BIGINT)
             AS sampled_chars
    FROM marked GROUP BY lang
    """,
    tags=("sample", "llm-data"),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic length-weighted Bernoulli sample at an expected
    10% char-mass rate: doc i is kept iff
    hash(doc_id) < M·(n_chars_i / avg_chars)·0.10, i.e. inclusion
    probability proportional to document length — the standard way
    to sample a fixed token budget rather than a fixed doc count.

    Determinism is the whole design: the coin is the Knuth
    multiplicative hash (doc_id·2654435761 mod 2³²) evaluated by
    SPLIT MULTIPLY — lo16·C + hi16·(C·2¹⁶ mod 2³²), identical by
    modular arithmetic — so the biggest coin intermediate is
    ~1.7e14 and the hash stays exact past doc_id 2³² (the direct
    product overflows int64 at doc_id ≈ 3.5e9, which ANSI mode
    turns into a job-killing error and non-ANSI into a silently
    biased sample). The threshold cross-multiplies into one integer
    floor-division with the mean doc length pre-divided (biggest
    intermediate n_chars·2³²) and clamped to ≥1, so an all-empty
    corpus divides by 1, not 0. No float ever forms: any engine,
    any shard, any re-run picks the identical sample. Totals ride a
    1-row broadcast join; the audit output (per-language sampled
    share) is one map-side-combined hash agg.
    """
    docs = load(spark, sf_dir, "documents")
    t = docs.agg(F.expr(
        "GREATEST(1, CAST(SUM(n_chars) DIV COUNT(*) AS BIGINT))")
        .alias("avg_chars"))
    # 2041643008 == (2654435761 * 65536) % 2^32
    picked = (F.expr("((doc_id % 65536) * 2654435761"
                     " + ((doc_id DIV 65536) % 65536) * 2041643008)"
                     " % 4294967296")
              < F.expr("(n_chars * 4294967296) DIV (10 * avg_chars)"))
    return (docs.crossJoin(F.broadcast(t))
            .select("lang", "n_chars", picked.alias("picked"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("picked"), 1).otherwise(0))
                 .cast("bigint").alias("n_sampled"),
                 F.sum(F.when(F.col("picked"), F.col("n_chars"))
                       .otherwise(0)).cast("bigint")
                 .alias("sampled_chars")))


SEMDEDUP_TAU = 0.95   # cosine threshold: drop members this close to rep
_SEM_PLANE_BASE = 4000  # plane namespace disjoint from the ANN tables
_SEM_BITS = 10


def _semdedup_oracle_sql() -> str:
    """DuckDB SQL recomputing the EXACT semdedup pipeline — the same
    10 md5-derived plane weights (interpolated as a DOUBLE literal)
    rebuild the identical sign-LSH cluster ids, rep election is the
    same MIN(vec_id), and the member↔rep cosine reuses the proven
    normalize-free exact-cosine idiom rounded to 6 dp before the
    threshold test, exactly as the Spark side rounds. Flips the op
    from rows-only to fully value-checked (round-8 plan item 1)."""
    from .vectors import _PLANE_W, _plane_weights

    planes = [_SEM_PLANE_BASE + i for i in range(_SEM_BITS)]
    _plane_weights(None, planes)
    w_lit = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in _PLANE_W[p]) + "]"
        for p in planes) + "]::DOUBLE[][]"
    # MSB-first fold parity with _lsh_tables: bit i carries 2^(bits-1-i)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, (w.w)[{i + 1}][1:len(v)]) > 0"
        f" THEN {1 << (_SEM_BITS - 1 - i)} ELSE 0 END)"
        for i in range(_SEM_BITS))
    cos = ("ROUND(list_dot_product(s.v, e.v)"
           " / (sqrt(list_dot_product(s.v, s.v))"
           " * sqrt(list_dot_product(e.v, e.v))), 6)")
    return f"""
    WITH emb AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), w AS (SELECT {w_lit} AS w),
    sig AS (
      SELECT vec_id, label, v, CAST({bucket} AS INTEGER) AS cluster
      FROM emb, w
    ), reps AS (
      SELECT cluster, MIN(vec_id) AS rep_id FROM sig GROUP BY cluster
    ), scored AS (
      SELECT s.cluster, s.vec_id, s.label, r.rep_id,
             {cos} AS cos_to_rep
      FROM sig s
      JOIN reps r ON r.cluster = s.cluster
      JOIN emb e ON e.vec_id = r.rep_id
    )
    SELECT cluster, vec_id, label, rep_id, cos_to_rep,
           (vec_id <> rep_id AND cos_to_rep >= {SEMDEDUP_TAU})
             AS dropped
    FROM scored
    """


@register("dedup_semdedup", oracle=_semdedup_oracle_sql(),
          tags=("dedup", "vector"))
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-duplicate removal in embedding space.
    Vectors are clustered by a 10-bit sign-LSH signature (the cheap
    stand-in for the paper's k-means cells — same plumbing, no
    iterative fit), each cluster elects its minimum-vec_id member as
    representative, and any other member with cosine ≥ 0.95 to the
    representative is dropped. Returns per-cluster audit rows.

    Why representative-only comparison: the paper's within-cluster
    pairwise pass is O(k²) per cluster — the same trap as
    dedup_clusters' old sha self-join. Comparing members to ONE
    representative is O(k), catches the dominant case (piles of
    near-identical boilerplate embeddings land in one cell), and
    composes: survivors can be re-bucketed with shifted planes for a
    second sweep (same recall argument as multi-table LSH).

    Scale shape: signature is a codegen'd fold over a plane-weight
    literal (no Python, no shuffle); cluster assembly is ONE
    hash-agg on the 8-byte signature; the member↔rep comparison is
    an equi-join on cluster id whose small side (one rep per
    cluster) is corpus/cluster-count sized — broadcast only because
    cluster count is bounded by 2^bits here; at 100 TB it stays a
    shuffle join and still touches each vector once.

    Oracled since round 8 via the vector_ann_lsh plane-literal
    recipe (the round-7 objection that a DuckDB oracle would
    "re-implement the operator" dissolved once the plane weights
    became shared driver-side constants rather than engine-private
    hashes): DuckDB rebuilds the identical clusters, reps and
    rounded cosines, so the audit rows are value-hashed. The
    planted-duplicate tests (tests/test_round3b.py) stay as the
    semantic safety net.
    """
    # fanout (round 14 sweep): the per-vector kernel — a 10-plane
    # sign-LSH fold plus a 64-dim cosine against the broadcast rep —
    # runs in the scan stage of a one-split local table, i.e. on one
    # core. Interleaved A/B at sf0.1: med 1.63/1.34 → 1.48/1.23 s,
    # output identical; no-op on any ≥-cores-splits layout.
    from ..catalog import fanout
    emb = fanout(load(spark, sf_dir, "embeddings")).select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("v"))
    sig = _lsh_tables(spark, F.col("v"), n_tables=1, bits=_SEM_BITS,
                      plane_base=_SEM_PLANE_BASE)
    clustered = emb.withColumn("cluster", F.element_at(sig, 1))
    reps = (clustered.groupBy("cluster")
            .agg(F.min("vec_id").alias("rep_id"),
                 F.min_by("v", "vec_id").alias("rep_v")))
    # round BEFORE the threshold test so the emitted cos_to_rep and
    # the dropped flag agree at the boundary (a consumer recomputing
    # `cos_to_rep >= tau` from the audit row must reach the same
    # verdict)
    scored = (clustered.join(reps, "cluster")
              .withColumn("cos_to_rep",
                          F.round(cosine_similarity(
                              F.col("v"), F.col("rep_v")), 6)))
    return (scored.select(
        "cluster", "vec_id", "label", "rep_id", "cos_to_rep",
        ((F.col("vec_id") != F.col("rep_id"))
         & (F.col("cos_to_rep") >= SEMDEDUP_TAU)).alias("dropped")))
