"""Round-14 probe (VERDICT r13 #6): dedup_clusters' ~10-sequential-
small-jobs floor. Counts the Spark JOBS a full run launches (driver
status store, same high-water-mark idiom as shuffle_metrics) and
times the pipeline's components, then A/Bs the candidate fusions:

  A. production dedup_clusters (window collapse + eager cache count)
  B. groupBy-agg reps (one row per sig off the same exchange) with
     members joined back — trades the window for an agg + join
  C. members WITHOUT the eager cache-fill count (re-verifies the
     round-11 4.8x in-flight-recompute finding on today's plan)

Usage: python scripts/probe_r14_minhash.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from open_reaction_database_web_scraper_spark.registry import (  # noqa: E402
    REGISTRY, load_all_operators)
from open_reaction_database_web_scraper_spark.session import (  # noqa: E402
    get_session)


def job_count(spark) -> int:
    store = spark._jsc.sc().statusStore()
    lst = store.jobsList(None)
    n = lst.size()
    return max((lst.apply(i).jobId() for i in range(n)), default=-1)


def timed(spark, label, fn, reps=3):
    fn()  # warm
    spark.catalog.clearCache()
    samples, jobs = [], []
    for _ in range(reps):
        j0 = job_count(spark)
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
        jobs.append(job_count(spark) - j0)
        spark.catalog.clearCache()
    samples.sort()
    print(f"{label:44s} med={samples[len(samples)//2]:7.3f} "
          f"min={samples[0]:7.3f} max={samples[-1]:7.3f} "
          f"jobs/run={jobs[-1]}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    load_all_operators()
    spark = get_session("probe_r14_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    from pyspark.sql import functions as F

    from open_reaction_database_web_scraper_spark.operators import dedup

    def full():
        (REGISTRY["dedup_clusters"].fn(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())

    def rep_pairs_only():
        rp, members = dedup.minhash_rep_pairs(spark, sf_dir)
        rp.write.format("noop").mode("overwrite").save()
        members.unpersist()

    def signatures_only():
        (dedup.minhash_signatures(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())

    # B: agg-based collapse — same sig exchange, reps directly
    def rep_pairs_agg():
        sig = dedup.minhash_signatures(spark, sf_dir)
        groups = (sig.groupBy("sig")
                  .agg(F.min("doc_id").alias("rep"),
                       F.count(F.lit(1)).alias("gsize"))).cache()
        groups.count()
        reps_df = groups.select(F.col("rep").alias("doc_id"), "sig")
        bands = dedup._rep_bands(reps_df)
        bands = bands.repartition(dedup._auto_width(sf_dir),
                                  "band_idx", "band_hash")
        a, b = bands.alias("a"), bands.alias("b")
        cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                       & (F.col("a.band_hash") == F.col("b.band_hash"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("rep_a"),
                        F.col("b.doc_id").alias("rep_b"))
                .distinct())
        sa = reps_df.select(F.col("doc_id").alias("rep_a"),
                            F.col("sig").alias("sig_a"))
        sb = reps_df.select(F.col("doc_id").alias("rep_b"),
                            F.col("sig").alias("sig_b"))
        est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                          lambda x, y: x == y),
                               lambda eq: eq))
               .cast("double") / F.lit(float(dedup.N_HASHES)))
        rp = (cand.join(sa, "rep_a").join(sb, "rep_b")
              .withColumn("est_jaccard", est)
              .filter(F.col("est_jaccard") >= 0.5)
              .select("rep_a", "rep_b", "est_jaccard"))
        rp.write.format("noop").mode("overwrite").save()
        groups.unpersist()

    # C: production shape, no eager count (in-flight recompute check)
    def rep_pairs_nocount():
        sig = dedup.minhash_signatures(spark, sf_dir)
        members = dedup.signature_groups(sig).cache()
        reps_df = (members.filter(F.col("doc_id") == F.col("rep"))
                   .select("doc_id", "sig"))
        bands = dedup._rep_bands(reps_df)
        bands = bands.repartition(dedup._auto_width(sf_dir),
                                  "band_idx", "band_hash")
        a, b = bands.alias("a"), bands.alias("b")
        cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                       & (F.col("a.band_hash") == F.col("b.band_hash"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
                .select(F.col("a.doc_id").alias("rep_a"),
                        F.col("b.doc_id").alias("rep_b"))
                .distinct())
        sa = reps_df.select(F.col("doc_id").alias("rep_a"),
                            F.col("sig").alias("sig_a"))
        sb = reps_df.select(F.col("doc_id").alias("rep_b"),
                            F.col("sig").alias("sig_b"))
        est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                          lambda x, y: x == y),
                               lambda eq: eq))
               .cast("double") / F.lit(float(dedup.N_HASHES)))
        rp = (cand.join(sa, "rep_a").join(sb, "rep_b")
              .withColumn("est_jaccard", est)
              .filter(F.col("est_jaccard") >= 0.5)
              .select("rep_a", "rep_b", "est_jaccard"))
        rp.write.format("noop").mode("overwrite").save()
        members.unpersist()

    timed(spark, "signatures only", signatures_only, reps)
    timed(spark, "A rep_pairs production (window+count)",
          rep_pairs_only, reps)
    timed(spark, "B rep_pairs agg-collapse", rep_pairs_agg, reps)
    timed(spark, "C rep_pairs no eager count", rep_pairs_nocount, reps)
    timed(spark, "FULL dedup_clusters", full, reps)


if __name__ == "__main__":
    main()
