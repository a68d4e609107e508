"""ORD-corpus queries (SURVEY.md §3.1) — the reference's own data
path, registered for the driver: ingest the captured golden document
store, roll up per-dataset totals, and execute crawl-plan modes as
DataFrame slices. These run over ``/root/reference``'s
``ord_formatted_data*.json`` corpus (the reference's end-to-end
outputs), not the TPC-H tables, so ``sf_dir`` is ignored; oracles
use DuckDB's JSON functions over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.crawl_plan import CrawlPlan, apply_plan, parse_config
from ..registry import register
from ..sources.ord import read_ord_documents

GOLDEN_GLOB = "/root/reference/ord_formatted_data*.json"
GOLDEN_ONE = "/root/reference/ord_formatted_data_one.json"


@register("ord_scan_documents", oracle=None, tags=("ord", "scan"))
def ord_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze scan of the whole golden corpus: one row per reaction
    record with input/outcome arities (web_scrpaer_2.py:530-548
    reversed)."""
    rx = read_ord_documents(spark, GOLDEN_GLOB)
    return rx.select(
        "dataset_id", "reaction_id", "success",
        F.size(F.map_keys("inputs")).alias("n_input_tabs"),
        F.coalesce(F.size("outcomes"), F.lit(0)).alias("n_outcomes"))


@register(
    "ord_dataset_rollup",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_GLOB}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    )
    SELECT dataset_id,
           SUM(len(rx)) AS total_reactions,
           SUM(len(list_filter(rx,
               x -> CAST(json_extract(x, '$.success') AS BOOLEAN))))
             AS successful_scrapes
    FROM ds GROUP BY dataset_id
    """,
    tags=("ord", "agg"),
)
def ord_dataset_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dataset totals over the full corpus, duplicates across
    capture files summed — web_scrpaer_2.py:461-462 on real data,
    cross-checked against DuckDB's JSON reader."""
    rx = read_ord_documents(spark, GOLDEN_GLOB)
    return rx.groupBy("dataset_id").agg(
        F.count("reaction_id").alias("total_reactions"),
        F.coalesce(F.sum(F.when(F.col("success"), 1)), F.lit(0))
        .alias("successful_scrapes"))


@register(
    "ord_plan_uniform_range",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_ONE}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), ds_ord AS (
      SELECT dataset_id, rx,
             ROW_NUMBER() OVER (ORDER BY dataset_id) AS dataset_ord
      FROM ds
    ), flat AS (
      SELECT dataset_id, dataset_ord,
             UNNEST(rx) AS r,
             UNNEST(generate_series(1, len(rx))) AS reaction_ord
      FROM ds_ord WHERE dataset_ord BETWEEN 1 AND 3
    )
    SELECT dataset_id, CAST(dataset_ord AS BIGINT) AS dataset_ord,
           json_extract_string(r, '$.reaction_id') AS reaction_id,
           CAST(reaction_ord AS BIGINT) AS reaction_ord
    FROM flat WHERE reaction_ord BETWEEN 1 AND 2
    """,
    tags=("ord", "plan"),
)
def ord_plan_uniform_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 3 (uniform_range): datasets 1-3, reactions 1-2 of each —
    the reference's 1-based inclusive slicing (web_scrpaer_2.py:
    283-286, 425-430) compiled to windowed ordinals."""
    rx = read_ord_documents(spark, GOLDEN_ONE)
    plan = parse_config({"mode": "uniform_range",
                         "dataset_start": 1, "dataset_end": 3,
                         "reaction_start": 1, "reaction_end": 2})
    return apply_plan(rx, plan).select(
        "dataset_id", F.col("dataset_ord").cast("long").alias("dataset_ord"),
        "reaction_id",
        F.col("reaction_ord").cast("long").alias("reaction_ord"))


@register(
    "ord_plan_single_target",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_ONE}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), ds_ord AS (
      SELECT dataset_id, rx,
             ROW_NUMBER() OVER (ORDER BY dataset_id) AS dataset_ord
      FROM ds
    ), flat AS (
      SELECT dataset_id, dataset_ord,
             UNNEST(rx) AS r,
             UNNEST(generate_series(1, len(rx))) AS reaction_ord
      FROM ds_ord WHERE dataset_ord = 50
    )
    SELECT dataset_id, CAST(dataset_ord AS INT) AS dataset_ord,
           json_extract_string(r, '$.reaction_id') AS reaction_id,
           CAST(reaction_ord AS INT) AS reaction_ord
    FROM flat WHERE reaction_ord = 1
    """,
    tags=("ord", "plan"),
)
def ord_plan_single_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 5 (single target): dataset ordinal 50, reaction 1 —
    main()'s collapse of target mode into equal bounds
    (web_scrpaer_2.py:527)."""
    rx = read_ord_documents(spark, GOLDEN_ONE)
    plan = parse_config({"mode": "single_target",
                         "dataset_target": 50, "reaction_target": 1})
    assert isinstance(plan, CrawlPlan) and plan.max_workers == 1
    return apply_plan(rx, plan).select(
        "dataset_id", "reaction_id", "dataset_ord", "reaction_ord")
