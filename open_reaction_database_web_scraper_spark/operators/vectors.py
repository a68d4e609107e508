"""Similarity search over embeddings (SURVEY.md §2.11).

Exact brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketed variant as the scale path (buckets
shrink the candidate set from |corpus| to a bucket's worth, the 100
TB-viable shape). Vector math is higher-order-function JVM code —
no Python, no UDF — so the scan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.vector_math import cosine_similarity, dot
from ..registry import register

N_QUERIES = 8      # vec_id < 8 are the query vectors
TOP_K = 5
N_PLANES = 8       # LSH hyperplanes → 256 buckets


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c"))
    return queries, corpus


@register(
    "vector_topk_similarity",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(c.e, c.e))) AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))) DESC,
                 c.vec_id) AS rn
      FROM emb q CROSS JOIN emb c
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cosine FROM scored WHERE rn <= {TOP_K}
    """,
    tags=("vector", "similarity"),
)
def vector_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the
    corpus, score JVM-side, rank-limit per query. Elements are cast
    to double before the sequential fold so the accumulation order
    (array order) and precision match the oracle bit-for-bit."""
    queries, corpus = _queries_and_corpus(spark, sf_dir)
    scored = (F.broadcast(queries).crossJoin(corpus)
              .withColumn("cosine",
                          cosine_similarity(F.col("q"), F.col("c"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id", "cosine"))


@register("vector_ann_lsh", oracle=None, tags=("vector", "approx"))
def vector_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane (sign) LSH.

    Hyperplane components are deterministic pseudo-randoms derived
    from xxhash64(plane, dim) — reproducible with no RNG state. Each
    vector gets an 8-bit bucket signature; queries only score
    vectors in their own bucket. This is the 100 TB shape: the
    cross-join shrinks from |Q|×|C| to per-bucket volumes, and the
    bucket join is a plain hash join on a byte."""
    queries, corpus = _queries_and_corpus(spark, sf_dir)

    def bucket(vec: F.Column) -> F.Column:
        # sign bit per plane: dot(vec, plane) > 0, plane components
        # in [-0.5, 0.5) from a hash of (plane index, dimension).
        bits = [
            (F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda d: (F.pmod(F.xxhash64(F.lit(p), d), 1000)
                                   .cast("double") / 1000.0 - 0.5)),
                    lambda x, w: x * w),
                F.lit(0.0), lambda acc, v: acc + v) > 0).cast("int")
            for p in range(N_PLANES)
        ]
        out = F.lit(0)
        for i, b in enumerate(bits):
            out = out + (b * F.lit(2 ** i))
        return out

    qb = queries.withColumn("bucket", bucket(F.col("q")))
    cb = corpus.withColumn("bucket", bucket(F.col("c")))
    scored = (qb.join(cb, "bucket")
              .withColumn("cosine",
                          cosine_similarity(F.col("q"), F.col("c"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "neighbor_id", "cosine", "bucket"))


@register(
    "dedup_embed_cosine",
    oracle=None,
    tags=("dedup", "vector"),
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all pairs with cosine
    ≥ 0.95 among vectors sharing an LSH bucket (candidate pruning),
    the embedding-space analog of MinHash dedup."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"))

    dim = F.size(F.col("e"))
    bits = [
        (F.aggregate(
            F.zip_with(
                F.col("e"),
                F.transform(F.sequence(F.lit(0), dim - 1),
                            lambda d: (F.pmod(F.xxhash64(F.lit(p), d), 1000)
                                       .cast("double") / 1000.0 - 0.5)),
                lambda x, w: x * w),
            F.lit(0.0), lambda acc, v: acc + v) > 0).cast("int")
        for p in range(N_PLANES)
    ]
    bucket = F.lit(0)
    for i, b in enumerate(bits):
        bucket = bucket + (b * F.lit(2 ** i))
    bucketed = emb.withColumn("bucket", bucket)
    a, b_ = bucketed.alias("a"), bucketed.alias("b")
    pairs = (a.join(b_, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .withColumn("cosine", cosine_similarity(F.col("a.e"),
                                                     F.col("b.e")))
             .filter(F.col("cosine") >= 0.95))
    return pairs.select(F.col("a.vec_id").alias("vec_a"),
                        F.col("b.vec_id").alias("vec_b"), "cosine")
