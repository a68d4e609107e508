"""Round-8b scale probe: the three vector ops whose hot loops changed
this round — dedup_embed_cosine (per-vector audit reshape: argmax
window + left join added), vector_ann_ivf and vector_ann_pq
(struct-min argmins, decimal Lloyd means, portable sample hash) — at
1x/10x/100x embeddings, default confs.

Embedding construction matches scaleup_r7b: shifted ids +
per-coordinate jitter, the 8 query vectors kept 1x (fixed probe set,
growing corpus — the real ANN regime). dedup_embed_cosine's
adaptive-bits contract is the thing under test at 100x: signature
width must grow with the corpus so bucket occupancy (and therefore
candidate work per vector) stays ~constant.

Usage: python scripts/scaleup_r8b.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from scripts.probe_common import time_op  # noqa: E402

OPS = ("dedup_embed_cosine", "vector_ann_ivf", "vector_ann_pq")


def build_emb(spark, sf_dir: str, copies: int, out: str) -> None:
    vkey = (load(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id")).collect()[0][0] + 1)
    emb = (load(spark, sf_dir, "embeddings")
           .withColumn("copy", F.explode(
               F.sequence(F.lit(0), F.lit(copies - 1))))
           .filter((F.col("copy") == 0) | (F.col("vec_id") >= 8))
           .withColumn("vec_id", F.col("vec_id") + F.col("copy") * vkey)
           .withColumn("embedding", F.expr(
               "transform(embedding, (x, i) -> CAST(x + "
               "0.001 * ((copy * 31 + i) % 7 - 3) AS FLOAT))")))
    (emb.drop("copy").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"  embeddings: {copies}x at {n} rows", flush=True)


def build_emb_isotropic(spark, sf_dir: str, copies: int, out: str) -> None:
    """Isotropic growth: copies get FRESH pseudo-random directions
    (per-(vec_id, dim) hash-derived coordinates), not jitter — the
    jittered corpus makes every copy a TRUE near-dup of its base, so
    dedup_embed_cosine's candidate work there measures the planted
    quadratic pair structure (28.7× pairs for 10× rows — verified),
    not the operator. ANN ops with fixed query sets are insensitive
    to the difference; the all-pairs near-dup audit is not."""
    vkey = (load(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id")).collect()[0][0] + 1)
    emb = (load(spark, sf_dir, "embeddings")
           .withColumn("copy", F.explode(
               F.sequence(F.lit(0), F.lit(copies - 1))))
           .filter((F.col("copy") == 0) | (F.col("vec_id") >= 8))
           .withColumn("vec_id", F.col("vec_id") + F.col("copy") * vkey)
           .withColumn("embedding", F.expr(
               "CASE WHEN copy = 0 THEN embedding ELSE "
               "transform(sequence(0, size(embedding) - 1), i -> "
               "CAST((pmod(xxhash64(concat(CAST(vec_id AS STRING), ':', "
               "CAST(i AS STRING))), 2000) - 1000) / 1000.0 AS FLOAT)) "
               "END")))
    (emb.drop("copy").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"  embeddings (isotropic): {copies}x at {n} rows", flush=True)



def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r8b")
    spark.sparkContext.setLogLevel("ERROR")

    big10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8b_10x_")
    big100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8b_100x_")
    print("building 10x ...", flush=True)
    build_emb(spark, sf_dir, 10, big10)
    print("building 100x ...", flush=True)
    build_emb(spark, sf_dir, 100, big100)

    summary: dict = {}
    for name in OPS:
        t1 = time_op(spark, name, sf_dir)
        t10 = time_op(spark, name, big10)
        t100 = time_op(spark, name, big100)
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
              f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x",
              flush=True)
        summary[name] = {
            "1x": round(t1, 2), "10x": round(t10, 2), "100x": round(t100, 2),
            "ratio_1_to_10": round(t10 / t1, 1),
            "ratio_10_to_100": round(t100 / t10, 1)}

    # embed_cosine again on ISOTROPIC growth: separates the
    # operator's own scaling from the jittered corpus' quadratic
    # true-pair structure (see build_emb_isotropic docstring).
    iso10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8b_iso10x_")
    iso100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r8b_iso100x_")
    build_emb_isotropic(spark, sf_dir, 10, iso10)
    build_emb_isotropic(spark, sf_dir, 100, iso100)
    name = "dedup_embed_cosine"
    t1 = time_op(spark, name, sf_dir)
    t10 = time_op(spark, name, iso10)
    t100 = time_op(spark, name, iso100)
    print(f"{name} (isotropic): 1x={t1:.2f}s 10x={t10:.2f}s "
          f"100x={t100:.2f}s ratio10={t10 / t1:.1f}x "
          f"ratio100={t100 / t10:.1f}x", flush=True)
    summary["dedup_embed_cosine_isotropic"] = {
        "1x": round(t1, 2), "10x": round(t10, 2), "100x": round(t100, 2),
        "ratio_1_to_10": round(t10 / t1, 1),
        "ratio_10_to_100": round(t100 / t10, 1)}
    summary["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print("SCALEUP_R8B_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
