"""Capture .explain('formatted') for the queries round 13 touched.

Usage: python scripts/capture_plans_r13.py <suffix>   # before|after
Writes plans/r13/<query>_<suffix>.txt for the touched batch queries
plus the streaming chunk-builder's write-side plan (the streaming
jobs themselves execute eagerly into a sink, so their dataflow is
the micro-batch plan, which explain() cannot show — the builder's
batch plan is the part this round changed).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)
from open_reaction_database_web_scraper_spark.catalog import load  # noqa: E402

TOUCHED = ["text_fingerprint", "multimodal_decode_gif"]


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    suffix = sys.argv[1]
    sf = "/root/testdata/sf0.1"
    load_all_operators()
    spark = get_session("plans_r13")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(here, exist_ok=True)
    for name in TOUCHED:
        df = REGISTRY[name].fn(spark, sf)
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(fmt(df))
        print("wrote", name, suffix)
    # chunk-builder write-side plan: the frame the builder writes
    ev = load(spark, sf, "events")
    ev = ev.unionByName(ev)  # copies=2, the dedup family's source
    chunk = F.ntile(4).over(Window.orderBy(F.asc_nulls_last("ts"),
                                           "event_id"))
    chunked = ev.withColumn("chunk", chunk)
    with open(os.path.join(here,
                           f"stream_chunk_builder_{suffix}.txt"),
              "w") as fh:
        if suffix == "before":
            # the old builder ran FOUR of these filtered writes, each
            # recomputing the window (plus the write itself)
            fh.write("# OLD builder: this plan executed 4x, once per "
                     "chunk filter (k = 1..4), each write a separate "
                     "job recomputing the global window:\n\n")
            fh.write(fmt(chunked.filter(F.col("chunk") == 1)
                         .drop("chunk").coalesce(1)))
        else:
            fh.write("# NEW builder: ONE partitionBy('chunk') write "
                     "of this frame (single job; the dynamic "
                     "partition writer emits one file per chunk "
                     "value from the single window partition):\n\n")
            fh.write(fmt(chunked))
    print("wrote stream_chunk_builder", suffix)


if __name__ == "__main__":
    main()
