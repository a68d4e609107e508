"""Shared helpers for the scaleup_r* probe scripts (round-8 review:
the timing harness and the salted-documents corpus builder had grown
three verbatim copies — one home, like operators' _auto_width).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.catalog import load
from open_reaction_database_web_scraper_spark.registry import REGISTRY


def time_op(spark, name: str, sf_dir: str) -> float:
    """Warm once (codegen/JIT/footer caches), then one timed
    noop-sink materialization with caches dropped on both sides —
    the probe scripts' standard protocol."""
    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    return time.perf_counter() - t0


def build_salted_docs(spark, sf_dir: str, copies: int, out: str) -> None:
    """documents × copies with per-copy salt tokens INTERLEAVED
    (regexp space → ' s<copy> '), so cross-copy shingle/block overlap
    is 0 and true shared structure stays 1x-like within each copy —
    the corpus-growth model every documents-side probe uses."""
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
    print(f"  documents: {copies}x at {n} rows", flush=True)


def build_suffixed_docs(spark, sf_dir: str, copies: int, out: str) -> None:
    """documents × copies under a per-copy TOKEN BIJECTION (every
    token w becomes ``w_c<copy>``): cross-copy shingle overlap is 0
    (like the salt-interleave model) AND each copy's within-copy
    shingle-equality structure is ISOMORPHIC to 1x — token counts,
    shingle counts, pair graph, and component diameters are exactly
    the originals. This is the right growth model for FIXPOINT ops:
    the round-10 probe measured that the salt-INTERLEAVE model halves
    the effective shingle width inside each copy (half of every
    shingle's tokens are the shared salt), densifying the near-dup
    candidate graph until CC diameter exceeds its round budget — a
    corpus-model artifact, not an engine property."""
    from pyspark.sql import functions as F  # local: matches file style

    from open_reaction_database_web_scraper_spark.catalog import load
    dkey = (load(spark, sf_dir, "documents")
            .agg(F.max("doc_id")).collect()[0][0] + 1)
    tag = F.concat(F.lit("_c"), F.col("copy").cast("string"))
    docs = (load(spark, sf_dir, "documents")
            .withColumn("copy", F.explode(
                F.sequence(F.lit(0), F.lit(copies - 1))))
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * dkey)
            .withColumn("text", F.when(
                F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(F.regexp_replace(
                    "text", " ", F.concat(tag, F.lit(" "))), tag))))
    (docs.drop("copy").repartition(32)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"  documents(suffix): {copies}x at {n} rows", flush=True)


def time_call_budgeted(spark, fn, budget_s: float = 1200.0):
    """Wall-time ``fn()`` under a kill budget: a timer cancels all
    Spark jobs at ``budget_s`` so a superlinear cell records a DNF
    string instead of hanging the whole probe session. Returns
    ``(seconds | None, error | None, result | None)``. The finally
    block drops caches AND drained memory-sink views — a probe
    session runs many streaming jobs back-to-back, the exact regime
    that OOMed the sf10 sweep (SCALING.md round 13)."""
    import threading

    from open_reaction_database_web_scraper_spark.testing import (
        drop_drained_memory_sinks)

    sc = spark.sparkContext
    fired = threading.Event()

    def _kill():
        fired.set()
        sc.cancelAllJobs()

    timer = threading.Timer(budget_s, _kill)
    timer.start()
    try:
        t0 = time.perf_counter()
        out = fn()
        return round(time.perf_counter() - t0, 2), None, out
    except Exception as e:
        if fired.is_set():
            return None, f"DNF>{budget_s:.0f}s (budget kill)", None
        return None, f"error: {type(e).__name__}: {e}", None
    finally:
        timer.cancel()
        spark.catalog.clearCache()
        drop_drained_memory_sinks(spark)


def build_skewed_events(spark, sf_dir: str, mult: int, out: str) -> int:
    """events × mult with 90% of rows reassigned to ONE user — the
    hot-key regime that serializes a keyed-state stream into a
    single task. Timestamps/event_ids are re-spread so the replay
    chunks stay balanced in TIME (the skew is purely in the key).
    Single home (round-13 review: scaleup_r12 and scaleup_r13 carried
    byte-identical copies whose cells are required to be comparable)."""
    ev = load(spark, sf_dir, "events")
    base = ev.agg(F.max("event_id")).collect()[0][0] + 1
    grown = (ev.withColumn("copy", F.explode(
                 F.sequence(F.lit(0), F.lit(mult - 1))))
             .withColumn("event_id",
                         F.col("event_id") + F.col("copy") * base)
             .drop("copy"))
    skewed = grown.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), F.lit(10)) < 9, F.lit(777))
        .otherwise(F.col("user_id")))
    skewed.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/events.parquet")
    n = spark.read.parquet(f"{out}/events.parquet").count()
    print(f"  skewed events: {mult}x at {n} rows (90% user 777)",
          flush=True)
    return n
