"""Round-7 training-data tranche: corpus MIXING and directional
containment (SURVEY.md §2.13 extensions).

The three mixing ops are the arithmetic behind every LLM data
recipe — temperature-flattened source sampling, a deterministic
hash reservoir, and clamped token-budget allocation — and the
containment detector is the directional cousin of Jaccard dedup
(catches quoted/wrapped copies that symmetric similarity misses).
All four are pure DataFrame compositions with exact DuckDB oracles;
the deterministic u(0,1) per doc reuses the portable md5 idiom
(first 32 bits / 2^32), so sampling DECISIONS — not just counts —
are value-checked cross-engine.

Reference anchor: the reference curates its scrape into one corpus
with no mixing control (web_scrpaer_2.py:545-548 flushes whatever
arrived); these ops are the [E] north-star generalization of that
"what goes in the training set" step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

MIX_TEMPERATURE = 2.0       # flatten exponent 1/T = 0.5
RESERVOIR_K = 100           # hash-reservoir sample size
CONTAIN_MIN = 0.8           # directional containment gate
BUDGET_TOKENS = 1_000_000   # global token budget to allocate
SHARE_FLOOR, SHARE_CAP = 0.01, 0.2


def _u01(col: F.Column) -> F.Column:
    """Deterministic uniform(0,1) per key: first 32 bits of md5 over
    the decimal string, / 2^32 — bit-identical in DuckDB as
    CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
    / 4294967296.0 (same idiom as the dedup sketch family)."""
    return (F.conv(F.substring(
        F.md5(F.encode(col.cast("string"), "utf-8")), 1, 8), 16, 10)
        .cast("long") / F.lit(4294967296.0))


_U01_SQL = ("CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS BIGINT) / 4294967296.0")

_TOKENS_SQL = "len(string_split(COALESCE(text, ''), ' '))"


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH w AS (
      SELECT source, CAST(SUM({_TOKENS_SQL}) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), t AS (
      SELECT SUM(tokens) AS tot,
             SUM(pow(tokens, {1.0 / MIX_TEMPERATURE})) AS flat_tot
      FROM w
    ), rates AS (
      SELECT w.source, w.tokens,
             round(least(1.0,
               (pow(w.tokens, {1.0 / MIX_TEMPERATURE}) / t.flat_tot)
               / (w.tokens / t.tot)), 9) AS rate
      FROM w, t
    )
    SELECT r.source, r.tokens, r.rate,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN {_U01_SQL} < r.rate THEN 1 ELSE 0 END)
             AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r ON r.source = d.source
    GROUP BY r.source, r.tokens, r.rate
    """,
    tags=("sample", "mixing", "llm-data"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mix (the multilingual-LLM
    sampling rule: p_s ∝ w_s^(1/T) instead of raw token share w_s,
    so over-represented sources are downsampled). Per source:
    acceptance rate = min(1, flattened-share / raw-share), and every
    doc is accepted iff its deterministic md5-u(0,1) < rate — the
    oracle recomputes the individual DECISIONS, not just expected
    counts. Rate is rounded to 9 dp on both sides so the one
    transcendental (pow) can't flip a boundary compare.

    100 TB shape: one token-count aggregate (map-side combined),
    a 20-row rate table broadcast back, and a shuffle-free
    accept-scan — the mix never materializes the corpus twice."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
    w = docs.groupBy("source").agg(F.sum(tokens).alias("tokens"))
    t = w.agg(F.sum("tokens").alias("tot"),
              F.sum(F.pow("tokens", 1.0 / MIX_TEMPERATURE))
              .alias("flat_tot"))
    rates = (w.crossJoin(F.broadcast(t))
             .select("source", "tokens",
                     F.round(F.least(F.lit(1.0),
                             (F.pow("tokens", 1.0 / MIX_TEMPERATURE)
                              / F.col("flat_tot"))
                             / (F.col("tokens") / F.col("tot"))), 9)
                     .alias("rate")))
    return (docs.join(F.broadcast(rates), "source")
            .groupBy("source", "tokens", "rate")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(_u01(F.col("doc_id")) < F.col("rate"), 1)
                       .otherwise(0)).alias("n_sampled")))


@register(
    "sample_reservoir_hash",
    oracle=f"""
    SELECT doc_id, source, round({_U01_SQL}, 9) AS priority
    FROM documents
    ORDER BY priority, doc_id
    LIMIT {RESERVOIR_K}
    """,
    tags=("sample", "llm-data"),
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed reservoir sample: the K docs with the smallest
    deterministic md5-priority — the hash-priority formulation of
    reservoir sampling (Efraimidis-Spirakis A-Res with uniform
    weights), which needs no sequential state: every shard keeps its
    local top-K by priority and the driver merges, exactly what
    Spark's TakeOrderedAndProject plans for an ORDER BY + LIMIT
    (pinned in tests — no global sort ever materializes). Re-running
    on a grown corpus keeps a stable sample for surviving docs —
    the property that makes hash reservoirs auditable."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select("doc_id", "source",
                        F.round(_u01(F.col("doc_id")), 9).alias("priority"))
            .orderBy("priority", "doc_id").limit(RESERVOIR_K))


@register(
    "text_containment_ngram",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS word
      FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM tok a JOIN tok b ON a.word = b.word
                           AND b.doc_id = a.doc_id + 1
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.i AS DOUBLE) / sa.n AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
    WHERE CAST(i.i AS DOUBLE) / sa.n >= {CONTAIN_MIN}
    """,
    tags=("text", "dedup", "llm-data"),
)
def text_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTIONAL token-set containment C(A→B) = |A∩B| / |A| over
    adjacent-id pairs — the asymmetric cousin of dedup_ngram_jaccard
    (same pluggable pair generator, same exact-set machinery): a
    short doc quoted inside a long one scores ~1.0 here but low on
    Jaccard, which is why decontamination pipelines check
    containment, not just symmetric similarity. Plan shape is the
    jaccard one minus the union denominator: explode → distinct →
    pair join → intersection count over one side's size."""
    docs = load(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.col("text"), " ")).alias("word"))
           .distinct())
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (a.join(b, (F.col("a.word") == F.col("b.word"))
                    & (F.col("b.doc_id") == F.col("a.doc_id") + 1))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("na"))
    cont = F.col("i").cast("double") / F.col("na")
    return (inter.join(sa, "doc_a")
            .filter(cont >= CONTAIN_MIN)
            .select("doc_a", "doc_b", cont.alias("containment")))


@register(
    "corpus_token_budget_alloc",
    oracle=f"""
    WITH w AS (
      SELECT source, CAST(SUM({_TOKENS_SQL}) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ), c AS (
      SELECT source, tokens,
             least(greatest(tokens / (SELECT SUM(tokens) FROM w),
                            {SHARE_FLOOR}), {SHARE_CAP}) AS clamped
      FROM w
    )
    SELECT source, tokens,
           round(clamped / (SELECT SUM(clamped) FROM c), 9) AS share,
           CAST(floor({BUDGET_TOKENS}
                * round(clamped / (SELECT SUM(clamped) FROM c), 9))
                AS BIGINT) AS alloc_tokens
    FROM c
    """,
    tags=("mixing", "llm-data"),
)
def corpus_token_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped token-budget allocation: each source's raw token share
    is clamped to [floor, cap] (no source starves, none dominates —
    the standard mixing-table guard rails), renormalized in ONE pass
    (documented choice: a single renormalize can leave post-clamp
    shares slightly off the caps; the iterative waterfall variant is
    a driver loop over ≤|sources| steps if a deployment needs exact
    caps), and the global budget is floored into per-source token
    allocations. Shares round to 9 dp before the floor so the one
    division chain can't flip an integer boundary cross-engine.

    100 TB shape: one map-side-combined token aggregate; everything
    after operates on |sources| rows."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
    w = docs.groupBy("source").agg(F.sum(tokens).alias("tokens"))
    tot = w.agg(F.sum("tokens").alias("tot"))
    c = (w.crossJoin(F.broadcast(tot))
         .select("source", "tokens",
                 F.least(F.greatest(F.col("tokens") / F.col("tot"),
                                    F.lit(SHARE_FLOOR)),
                         F.lit(SHARE_CAP)).alias("clamped")))
    ctot = c.agg(F.sum("clamped").alias("ctot"))
    share = F.round(F.col("clamped") / F.col("ctot"), 9)
    return (c.crossJoin(F.broadcast(ctot))
            .select("source", "tokens", share.alias("share"),
                    F.floor(F.lit(BUDGET_TOKENS) * share)
                    .cast("bigint").alias("alloc_tokens")))
