"""Round-7 scale probe: dedup_minhash_lsh at 1x/10x/100x with
DEFAULT confs — the round-6 100x knee (14.6x/decade at the 32-wide
default, fixed by SPARK_GRAFT_SHUFFLE=128) should now be fixed BY
DEFAULT: minhash_pairs sizes its banding exchange from documents
parquet bytes (one partition per ~512 KiB, floor 32, cap 8192), so
the 100x corpus gets ~116 partitions without any env override.

Corpus construction matches scaleup_r5/r6: doc_id shifted per copy;
non-zero copies get a per-copy salt token INTERLEAVED between every
pair of words so cross-copy shingle overlap is zero and near-dup
pair density grows linearly.

Usage: python scripts/scaleup_r7.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402
from open_reaction_database_web_scraper_spark.operators.dedup import (  # noqa: E402
    _auto_width,
    _path_bytes,
)
from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    load_all_operators,
)
from open_reaction_database_web_scraper_spark.session import get_session  # noqa: E402
from scripts.probe_common import time_op  # noqa: E402


def build_docs(spark, sf_dir: str, copies: int, out: str) -> None:
    dkey = (load(spark, sf_dir, "documents")
            .agg(F.max("doc_id")).collect()[0][0] + 1)
    salt = F.concat(F.lit(" s"), F.col("copy").cast("string"), F.lit(" "))
    docs = (load(spark, sf_dir, "documents")
            .withColumn("copy", F.explode(
                F.sequence(F.lit(0), F.lit(copies - 1))))
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * dkey)
            .withColumn("text", F.when(
                F.col("copy") == 0, F.col("text")).otherwise(
                F.regexp_replace("text", " ", salt))))
    (docs.drop("copy").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"  documents: {copies}x at {n} rows, "
          f"{_path_bytes(f'{out}/documents.parquet') >> 20} MiB", flush=True)



def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    assert "SPARK_GRAFT_SHUFFLE" not in os.environ, \
        "probe must run at DEFAULT confs (that's the point)"
    load_all_operators()
    spark = get_session("scaleup_r7")
    spark.sparkContext.setLogLevel("ERROR")

    big10 = tempfile.mkdtemp(prefix="ordspark_scaleup_r7_10x_")
    big100 = tempfile.mkdtemp(prefix="ordspark_scaleup_r7_100x_")
    print("building 10x ...", flush=True)
    build_docs(spark, sf_dir, 10, big10)
    print("building 100x ...", flush=True)
    build_docs(spark, sf_dir, 100, big100)

    name = "dedup_minhash_lsh"
    widths = {d: _auto_width(d) for d in (sf_dir, big10, big100)}
    t1 = time_op(spark, name, sf_dir)
    t10 = time_op(spark, name, big10)
    t100 = time_op(spark, name, big100)
    summary = {name: {
        "1x": round(t1, 2), "10x": round(t10, 2), "100x": round(t100, 2),
        "ratio_1_to_10": round(t10 / t1, 1),
        "ratio_10_to_100": round(t100 / t10, 1),
        "band_join_width": {"1x": widths[sf_dir], "10x": widths[big10],
                            "100x": widths[big100]},
        "confs": "default (no SPARK_GRAFT_SHUFFLE)"}}
    print(f"{name}: 1x={t1:.2f}s 10x={t10:.2f}s 100x={t100:.2f}s "
          f"ratio10={t10 / t1:.1f}x ratio100={t100 / t10:.1f}x "
          f"widths={widths}", flush=True)
    print("SCALEUP_R7_JSON " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
