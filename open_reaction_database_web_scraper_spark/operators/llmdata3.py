"""Round-3 LLM-training-data operators [E].

Four pipeline stages the first two tranches stopped short of:
actually REWRITING documents after boilerplate detection (the CCNet
move — dedup_subdoc_blocks only counts shared blocks), compressing
an embedding column to int8 codes (the storage/serving step after
the ANN family), deterministic stratified train/test splitting, and
the corpus-composition report a curation run ends with.

All four are registered with full DuckDB oracles — including the
rewrite, whose reconstruction is exact string algebra both engines
agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fanout, load
from ..registry import register

_BW = 8  # tokens per block, matching dedup_subdoc_blocks' BLOCK_W


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), chunks AS (
      SELECT doc_id, b AS pos,
             list_aggregate(toks[b*{_BW}+1 : b*{_BW}+{_BW}],
                            'string_agg', ' ') AS chunk
      FROM toks, UNNEST(range((len(toks) + {_BW} - 1) // {_BW}))
                   AS u(b)
    ), shared AS (
      SELECT chunk FROM chunks GROUP BY chunk
      HAVING COUNT(DISTINCT doc_id) > 1
    ), kept AS (
      SELECT c.doc_id, c.pos, c.chunk
      FROM chunks c LEFT JOIN shared s ON c.chunk = s.chunk
      WHERE s.chunk IS NULL
    ), clean AS (
      SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(cl.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN clean cl ON d.doc_id = cl.doc_id
    """,
    tags=("text", "dedup", "rewrite"),
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate REMOVAL with document reconstruction: cut every
    8-token block that appears in more than one document (both
    copies — CCNet-style shared-block stripping) and re-join each
    doc's surviving blocks in order.

    Where dedup_subdoc_blocks stops at counting shared blocks, this
    emits the cleaned corpus. Scale shape, in three exchanges none
    of which carries more text than the output:
    1. blocks are built row-locally (split → slice over a sequence →
       posexplode) and COUNTED by their xxhash64 — the counting
       shuffle moves (8-byte hash, doc_id) only;
    2. the >1-doc hash set joins back to the block stream as a plain
       equi-join on the hash (an anti-join shape — no broadcast of
       anything corpus-sized);
    3. reassembly groups by doc_id collecting (pos, chunk) structs,
       array_sort restores order inside the row (no window, no
       secondary sort), array_join rebuilds the text.
    Hash collisions can only over-strip a block (two distinct chunks
    sharing an xxhash64) — the same accepted 2⁻⁶⁴ trade
    dedup_subdoc_blocks documents; the oracle groups the block
    strings themselves.
    """
    docs = fanout(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return (load(spark, sf_dir, "documents").select("doc_id")
            .join(strip_shared_blocks(docs), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))


def strip_shared_blocks(docs: DataFrame) -> DataFrame:
    """Core of the boilerplate strip (shared with the
    pipeline_clean_corpus capstone): (doc_id, text) in →
    (doc_id, clean_text) out for docs with ≥1 surviving block —
    callers left-join and COALESCE('') for fully-stripped docs.

    Known cost: the chunk stream feeds BOTH the shared-count
    aggregate and the anti-join probe side, and the two branches
    project differently, so Catalyst cannot reuse the exchange —
    tokenize/slice/hash runs twice per query. At the 100 TB posture
    a production run would persist (or checkpoint) the hashed chunk
    stream between the two uses; kept un-materialized here so the
    registered query stays a single pipelined job."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    n_blocks = F.expr(f"(size(toks) + {_BW} - 1) DIV {_BW}").cast("int")
    chunks = (toks.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.array_join(
                F.slice("toks", i * _BW + 1, _BW), " "))))
        .withColumnRenamed("col", "chunk")
        .withColumn("h", F.xxhash64("chunk")))
    shared = (chunks.groupBy("h")
              .agg(F.count_distinct("doc_id").alias("nd"))
              .filter(F.col("nd") > 1)
              .select("h"))
    kept = chunks.join(shared, "h", "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("pos", "chunk"))),
                    lambda s: s["chunk"]),
                " ").alias("clean_text")))


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding,
             NULLIF(list_max(list_transform(
                      embedding, x -> abs(CAST(x AS DOUBLE)))) / 127,
                    0) AS scale
      FROM embeddings
    )
    SELECT vec_id, CAST(gs AS BIGINT) AS dim,
           CAST(ROUND(CAST(embedding[gs] AS DOUBLE) / scale)
                AS BIGINT) AS code,
           ROUND(ABS(ROUND(CAST(embedding[gs] AS DOUBLE) / scale)
                     * scale
                     - CAST(embedding[gs] AS DOUBLE)), 6) AS err
    FROM base, UNNEST(range(1, len(embedding) + 1)) AS u(gs)
    """,
    tags=("vector", "quantize"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per
    vector, scale = max|x| / 127, code = round(x / scale) — the
    ~4x (float32) / 8x (float64) memory shrink a serving index
    applies before vector_ann_pq-style search — reported long-form
    as (vec_id, dim, code, reconstruction error).

    Everything is row-local: the per-vector scale comes from
    array_max(transform(|x|)) INSIDE the row (no shuffle, no join
    back), then one posexplode emits the code stream — scan →
    project → generate, zero exchanges, so the operator is pure
    map-side work at any corpus size. Float parity with the oracle:
    float32 inputs lift exactly to double, max/division/round are
    the same IEEE ops in both engines, and the only derived float —
    the dequantization error — is ROUND(.,6)-sealed. Zero vectors
    quantize to NULL codes via the NULLIF(scale, 0) guard rather
    than dividing by zero.
    """
    emb = load(spark, sf_dir, "embeddings")
    scale = F.nullif(
        F.array_max(F.transform(
            "embedding", lambda x: F.abs(x.cast("double")))) / 127,
        F.lit(0.0))
    base = emb.select("vec_id", "embedding", scale.alias("scale"))
    exploded = base.select(
        "vec_id", "scale",
        F.posexplode(F.col("embedding")))
    x = F.col("col").cast("double")
    code = F.round(x / F.col("scale"), 0)
    return exploded.select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        code.cast("long").alias("code"),
        F.round(F.abs(code * F.col("scale") - x), 6).alias("err"))


@register(
    "split_train_test",
    oracle="""
    WITH tagged AS (
      SELECT lang, n_chars,
             CASE WHEN ((doc_id % 65536) * 2654435761
                        + ((doc_id // 65536) % 65536) * 2041643008)
                       % 4294967296 % 10 < 9
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY lang, split
    """,
    tags=("curation", "sample"),
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test assignment audited per
    language stratum — the split step every training-data pipeline
    runs before packing.

    The assignment is a Knuth multiplicative hash of the doc id
    (doc_id x 2654435761 mod 2³², then mod 10) — decorrelated from
    any id-ordering pattern, unlike the raw ``doc_id % 10``
    sample_deterministic_mod uses. The product is evaluated by
    SPLIT MULTIPLY (lo16·C + hi16·(C·2¹⁶ mod 2³²) — identical by
    modular arithmetic, same trick as sample_weighted_bernoulli):
    the direct doc_id·C form overflows int64 at doc_id ≈ 3.5e9,
    where DuckDB hard-errors and non-ANSI Spark silently wraps
    negative — and a negative % lands every overflowed id in
    'train', quietly destroying the 90/10 ratio at exactly the
    corpus scale this docstring targets. Split-multiplied, the
    arithmetic is exact 64-bit integer both engines reproduce
    bit-for-bit at any id. Re-running the split on a 100 TB corpus
    — or on one shard of it — lands every doc on the same side, so
    train/test never leak across runs and the split needs no
    persisted assignment table. One map-side-combined hash
    aggregate; nothing shuffles but (lang, split) partials.
    """
    docs = load(spark, sf_dir, "documents")
    # 2041643008 == (2654435761 * 65536) % 2^32
    split = F.when(
        F.expr("((doc_id % 65536) * 2654435761"
               " + ((doc_id DIV 65536) % 65536) * 2041643008)"
               " % 4294967296") % 10 < 9, "train").otherwise("test")
    return (docs.select("lang", "n_chars", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


@register(
    "corpus_mix_report",
    oracle="""
    WITH d AS (
      SELECT lang, source, sha256(text) AS sha,
             len(string_split(text, ' ')) AS n_toks
      FROM documents
    ), per AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             COUNT(DISTINCT sha) AS n_unique,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM d GROUP BY lang, source
    ), tot AS (
      SELECT CAST(SUM(n_toks) AS DOUBLE) AS total_tokens FROM d
    )
    SELECT lang, source, n_docs, n_unique,
           ROUND(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6)
             AS dup_rate,
           n_tokens,
           ROUND(n_tokens / t.total_tokens, 6) AS token_share
    FROM per CROSS JOIN tot t
    """,
    tags=("curation", "agg", "report"),
)
def corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report per (lang, source) cell: doc count,
    exact-unique count (sha256), duplicate rate, token count, and
    share of the total token budget — the summary table a curation
    run publishes (the engine's analog of the reference's printed
    run report, web_scraper.py:339-346, grown to corpus scale).

    One pass computes sha and token count row-locally; ONE hash
    aggregate keyed on the tiny (lang, source) domain carries
    (count, distinct-sha partials, token sum); the grand total is a
    1-row aggregate broadcast back for the share division. The
    exact COUNT(DISTINCT sha) expands to (lang, source, sha)
    partials — bounded by unique docs, map-side combined, the same
    posture retention_cohorts pins. Shares and rates are
    ROUND(.,6)-sealed doubles of exact integers.
    """
    d = load(spark, sf_dir, "documents").select(
        "lang", "source",
        F.sha2("text", 256).alias("sha"),
        F.size(F.split("text", " ")).alias("n_toks"))
    per = (d.groupBy("lang", "source")
           .agg(F.count("*").alias("n_docs"),
                F.count_distinct("sha").alias("n_unique"),
                F.sum("n_toks").cast("long").alias("n_tokens")))
    # 1-row token total: the scalar-subquery broadcast shape
    # (allow-listed in scripts/explain_all.py like text_tfidf's).
    tot = d.agg(F.sum("n_toks").cast("double").alias("total_tokens"))
    return (per.crossJoin(F.broadcast(tot))
            .select("lang", "source", "n_docs", "n_unique",
                    F.round((F.col("n_docs") - F.col("n_unique"))
                            .cast("double") / F.col("n_docs"), 6)
                    .alias("dup_rate"),
                    "n_tokens",
                    F.round(F.col("n_tokens") / F.col("total_tokens"), 6)
                    .alias("token_share")))


@register(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH uniq AS (
      SELECT doc_id, text, lang FROM (
        SELECT doc_id, text, lang,
               ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM uniq
    ), chunks AS (
      SELECT doc_id, b AS pos,
             list_aggregate(toks[b*{_BW}+1 : b*{_BW}+{_BW}],
                            'string_agg', ' ') AS chunk
      FROM toks, UNNEST(range((len(toks) + {_BW} - 1) // {_BW}))
                   AS u(b)
    ), shared AS (
      SELECT chunk FROM chunks GROUP BY chunk
      HAVING COUNT(DISTINCT doc_id) > 1
    ), kept AS (
      SELECT c.doc_id, c.pos, c.chunk
      FROM chunks c LEFT JOIN shared s ON c.chunk = s.chunk
      WHERE s.chunk IS NULL
    ), clean AS (
      SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    ), final AS (
      SELECT u.lang, COALESCE(cl.clean_text, '') AS clean_text
      FROM uniq u LEFT JOIN clean cl ON u.doc_id = cl.doc_id
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN clean_text = '' THEN 0
                    ELSE len(string_split(clean_text, ' ')) END)
                AS BIGINT) AS total_tokens
    FROM final GROUP BY lang
    """,
    tags=("pipeline", "dedup", "text"),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #3 — the cleaning half of a corpus build, fused:
    exact dedup (keep min doc_id per sha256) → cross-doc boilerplate
    strip over the SURVIVORS → per-language clean-token budget.
    Complements pipeline_training_data (filter+rollup) and
    pipeline_corpus_curation (sample+decontaminate): this one
    REWRITES the corpus before counting.

    Fusion notes: the dedup is one min_by hash aggregate keyed on
    the 32-byte sha (no window, no sort of texts); only surviving
    docs enter the block machinery (strip_shared_blocks — hash-only
    counting shuffle), so shared-block counts are computed on the
    deduped corpus, where they mean boilerplate rather than
    wholesale duplication; the final rollup is a tiny hash agg on
    lang. Catalyst pipelines the three stages into one job — no
    materialization between them.
    """
    docs = fanout(load(spark, sf_dir, "documents")
                  .select("doc_id", "text", "lang"))
    uniq = (docs.groupBy(F.sha2("text", 256).alias("sha"))
            .agg(F.min_by(F.struct("doc_id", "text", "lang"),
                          F.col("doc_id")).alias("s"))
            .select(F.col("s.doc_id").alias("doc_id"),
                    F.col("s.text").alias("text"),
                    F.col("s.lang").alias("lang")))
    clean = strip_shared_blocks(uniq.select("doc_id", "text"))
    final = (uniq.select("doc_id", "lang")
             .join(clean, "doc_id", "left")
             .select("lang",
                     F.coalesce("clean_text", F.lit(""))
                     .alias("clean_text")))
    n_toks = F.when(F.col("clean_text") == "", F.lit(0)).otherwise(
        F.size(F.split("clean_text", " ")))
    return (final.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(n_toks).cast("long").alias("total_tokens")))
