"""Training-mix curation operators [E]: weighted source interleaving
and greedy sequence packing.

These are the two steps between "curated corpus" and "batches on a
trainer": choose how much of each source enters the mix (weighted
interleave) and concatenate documents into fixed-budget training
sequences (packing). The reference's closest analog is its dataset
allocation planner (web_scrpaer_2.py:291-334), which budgets how
many reactions to pull per dataset — the same quota-per-source idea,
here applied declaratively to a document corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from .dedup import portable_hash32

# Knuth multiplicative hash (same constant as sample_per_group_topk):
# doc_id * MULT % 100 scrambles sequential ids into a uniform keep
# die, stays exact in int64 at any realistic id (id < 9.2e18/MULT),
# and is identical arithmetic in Spark and DuckDB.
MULT = 2654435761

# source -> percent of its documents kept in the mix. Sources not
# listed fall back to the default rate. Values are deliberately
# non-uniform so the oracle exercises the join, not a constant.
MIX_WEIGHTS = {"src0": 90, "src1": 75, "src2": 50, "src3": 25,
               "src4": 10}
MIX_DEFAULT = 40


@register(
    "interleave_sources_weighted",
    oracle=f"""
    WITH weights (source, pct) AS (
      VALUES {", ".join(f"('{s}', {p})" for s, p in MIX_WEIGHTS.items())}
    ), mixed AS (
      SELECT d.source,
             COALESCE(w.pct, {MIX_DEFAULT}) AS pct,
             d.n_chars
      FROM documents d LEFT JOIN weights w ON d.source = w.source
      WHERE d.doc_id * {MULT} % 100 < COALESCE(w.pct, {MIX_DEFAULT})
    )
    SELECT source, pct,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM mixed GROUP BY source, pct
    """,
    tags=("curation", "sample", "join"),
)
def interleave_sources_weighted(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Weighted source interleave: each corpus source contributes a
    configured fraction of its documents to the training mix.

    The weights live in a tiny config relation (the realistic shape
    — mix ratios are data, not code) broadcast-joined onto the
    corpus; the keep decision is a deterministic multiplicative-hash
    die on doc_id, so the mix is reproducible at any cluster size
    and re-runs are stable (same property as the other key-mod
    samplers here). One scan, one broadcast, one map-side-combined
    aggregate — no shuffle of document text, no RNG.
    """
    docs = load(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        [(s, p) for s, p in MIX_WEIGHTS.items()], "source string, pct int")
    keep_pct = F.coalesce(F.col("pct"), F.lit(MIX_DEFAULT))
    return (docs.join(F.broadcast(weights), "source", "left")
            .withColumn("pct", keep_pct)
            .filter(F.pmod(F.col("doc_id") * F.lit(MULT),
                           F.lit(100)) < F.col("pct"))
            .groupBy("source", "pct")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("chars_kept")))


PACK_BUDGET = 2048   # character budget per packed training sequence
PACK_SHARDS = 8          # minimum packing shards per language
PACK_GROUP_DOCS = 50_000  # target docs per (lang, shard) pandas group


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit-sequential packer for one (lang, shard)
    group: walk docs in doc_id order, open a new bin whenever the
    next doc would overflow the budget. A doc larger than the budget
    gets a bin of its own (never split). Pure pandas, O(n)."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    bin_ids, bin_id, filled = [], 0, 0
    for n in pdf["n_chars"]:
        if filled > 0 and filled + n > PACK_BUDGET:
            bin_id += 1
            filled = 0
        filled += n
        bin_ids.append(bin_id)
    pdf["bin_id"] = bin_ids
    return pdf[["lang", "shard", "bin_id", "doc_id", "n_chars"]]


_PACK_SCHEMA = ("lang string, shard int, bin_id long, doc_id long, "
                "n_chars long")


def _pack_oracle_sql() -> str:
    """DuckDB SQL replaying the greedy packer EXACTLY via a recursive
    CTE (rows-only through round 8): shard assignment is the portable
    md5 hash (shared with the Spark side since round 9 — xxhash64 was
    engine-private), n_shards re-derives from COUNT(*) with the same
    ceil formula, and the recursion walks each (lang, shard) group in
    doc_id rank order carrying (bin_id, filled) — one iteration per
    rank, all groups advanced in parallel, so depth = the largest
    group (bounded by PACK_GROUP_DOCS at any corpus size, the same
    bound that keeps the Arrow group in memory). The filled > 0 guard
    matches the Python packer on zero-length docs."""
    return f"""
    WITH RECURSIVE params AS (
      SELECT GREATEST({PACK_SHARDS},
                      CAST(CEIL(COUNT(*) / {PACK_GROUP_DOCS}.0) AS BIGINT))
               AS n_shards
      FROM documents
    ), d0 AS (
      SELECT doc_id, lang, n_chars,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % p.n_shards AS INTEGER) AS shard
      FROM documents, params p
    ), docs AS (
      SELECT lang, shard, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, shard
                                ORDER BY doc_id) AS rk
      FROM d0
    ), walk AS (
      SELECT lang, shard, rk, n_chars,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(n_chars AS BIGINT) AS filled
      FROM docs WHERE rk = 1
      UNION ALL
      SELECT d.lang, d.shard, d.rk, d.n_chars,
             CASE WHEN w.filled > 0
                   AND w.filled + d.n_chars > {PACK_BUDGET}
                  THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.filled > 0
                   AND w.filled + d.n_chars > {PACK_BUDGET}
                  THEN CAST(d.n_chars AS BIGINT)
                  ELSE w.filled + d.n_chars END
      FROM walk w JOIN docs d
        ON d.lang = w.lang AND d.shard = w.shard AND d.rk = w.rk + 1
    )
    SELECT lang, shard, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS seq_chars
    FROM walk GROUP BY lang, shard, bin_id
    """


@register(
    "pack_sequences",
    oracle=_pack_oracle_sql(),
    tags=("curation", "pandas-udf"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents into training
    sequences of at most PACK_BUDGET characters, never splitting a
    document (the standard pre-tokenization packing pass that turns
    a ragged corpus into near-fixed-length trainer input).

    Packing is inherently a sequential scan (bin state depends on
    every earlier doc), so it runs as an Arrow ``applyInPandas``
    over (lang, shard) groups — the one place a Pandas UDF is the
    honest tool. Scale comes from the SHARD axis, not the group
    scan: docs are sharded by a hash of doc_id, each shard packs
    independently in O(|shard|), and the shard COUNT follows the
    corpus size (docs / PACK_GROUP_DOCS, min PACK_SHARDS) so a
    group's pandas frame stays bounded at any scale (waste is
    bounded: ≤ one partial bin per shard). The
    returned frame is the per-bin rollup; bin membership is
    property-tested (every doc exactly once, no bin over budget
    unless a single oversized doc, deterministic across runs) AND —
    since round 9 — the whole greedy walk is value-checked by a
    recursive-CTE DuckDB oracle that replays it bin by bin.
    """
    base = load(spark, sf_dir, "documents")
    # Shard count derives from the corpus (ceil(n/PACK_GROUP_DOCS),
    # floored at PACK_SHARDS): applyInPandas materializes each
    # (lang, shard) group as ONE in-memory pandas frame, so a FIXED
    # shard count means group size grows with the corpus until the
    # Arrow collection OOMs — the bound must follow the data. One
    # count() scalar (bounded driver state, IVF-centroid posture).
    n_docs = base.count()
    n_shards = max(PACK_SHARDS, -(-n_docs // PACK_GROUP_DOCS))
    # portable shard die (round 9): md5-derived, so the DuckDB oracle
    # recomputes the same shards — xxhash64 was engine-private.
    docs = base.select(
        "doc_id", "lang", "n_chars",
        F.pmod(portable_hash32(F.col("doc_id").cast("string")),
               F.lit(n_shards)).cast("int").alias("shard"))
    packed = (docs.groupBy("lang", "shard")
              .applyInPandas(_pack_group, _PACK_SCHEMA))
    return (packed.groupBy("lang", "shard", "bin_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("seq_chars")))
