"""Round-9 scale probe: the hard-negative miners head-to-head at
1x/10x/100x (default confs), plus the §2.12c doc ops whose r8c
numbers were never recorded in SCALING.md.

The exhaustive miner (sample_hard_negative_mine) is probed expecting
SUPERLINEAR decades — its probe set AND its per-probe pool both grow
with the corpus, so pair work is O(N²/100) by construction; it runs
1x/10x ONLY. Its 100x decade is a recorded DNF: the first round-9
attempt ran the 1.2B-pair stage >75 minutes wall without completing
(the cosine's ArrayAggregate fold evaluates interpreted inside the
pre-window sort projection — µs per pair × 1.2B), and was killed.
The celled miner (sample_hard_negative_mine_ann) narrows each
probe's pool to its adaptive-bits LSH candidate cells:
occupancy-bound candidates, subquadratic decades — it runs all
three on the SAME jittered corpora. That contrast is the
decomposition the verdict asked for.

Usage: python scripts/scaleup_r9.py [sf_dir]
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
from scripts.probe_common import build_salted_docs, time_op  # noqa: E402

DOC_OPS = ("text_bpe_pair_merge", "text_ngram_novelty")
EMB_OPS = (("sample_hard_negative_mine", 2),       # 1x/10x only (DNF at 100x)
           ("sample_hard_negative_mine_ann", 3))


def build_emb_jitter(spark, sf_dir: str, copies: int, out: str) -> None:
    """Jittered embedding copies (labels preserved, so the cross-
    label pool structure scales with the corpus)."""
    vkey = (load(spark, sf_dir, "embeddings")
            .agg(F.max("vec_id")).collect()[0][0] + 1)
    emb = (load(spark, sf_dir, "embeddings")
           .withColumn("copy", F.explode(
               F.sequence(F.lit(0), F.lit(copies - 1))))
           .withColumn("vec_id", F.col("vec_id") + F.col("copy") * vkey)
           .withColumn("embedding", F.expr(
               "transform(embedding, (x, i) -> CAST(x + "
               "0.001 * ((copy * 31 + i) % 7 - 3) AS FLOAT))")))
    (emb.drop("copy").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    print(f"  embeddings: {copies}x at {n} rows", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r9")
    spark.sparkContext.setLogLevel("ERROR")

    summary: dict = {}
    d10 = tempfile.mkdtemp(prefix="ordspark_r9_d10_")
    d100 = tempfile.mkdtemp(prefix="ordspark_r9_d100_")
    build_salted_docs(spark, sf_dir, 10, d10)
    build_salted_docs(spark, sf_dir, 100, d100)
    for name in DOC_OPS:
        t1, t10, t100 = (time_op(spark, name, d)
                         for d in (sf_dir, d10, d100))
        print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
              f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x",
              flush=True)
        summary[name] = {
            "1x": round(t1, 2), "10x": round(t10, 2),
            "100x": round(t100, 2),
            "ratio_1_to_10": round(t10 / t1, 1),
            "ratio_10_to_100": round(t100 / t10, 1)}

    e10 = tempfile.mkdtemp(prefix="ordspark_r9_e10_")
    e100 = tempfile.mkdtemp(prefix="ordspark_r9_e100_")
    build_emb_jitter(spark, sf_dir, 10, e10)
    build_emb_jitter(spark, sf_dir, 100, e100)
    for name, decades in EMB_OPS:
        dirs = (sf_dir, e10, e100)[:decades]
        ts = [time_op(spark, name, d) for d in dirs]
        rec = {"1x": round(ts[0], 2), "10x": round(ts[1], 2),
               "ratio_1_to_10": round(ts[1] / ts[0], 1)}
        line = (f"{name}: 1x={ts[0]:.2f}s 10x={ts[1]:.2f}s "
                f"ratio10={ts[1] / ts[0]:.1f}x")
        if decades == 3:
            rec.update({"100x": round(ts[2], 2),
                        "ratio_10_to_100": round(ts[2] / ts[1], 1)})
            line += (f" 100x={ts[2]:.2f}s "
                     f"ratio100={ts[2] / ts[1]:.1f}x")
        else:
            rec["100x"] = "DNF (killed >75min wall, see docstring)"
            line += " 100x=DNF(>75min)"
        print(line, flush=True)
        summary[name] = rec
    summary["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print("SCALEUP_R9_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
