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
from ..sources.ord_datasource import OrdDataSource

GOLDEN_GLOB = "/root/reference/ord_formatted_data*.json"
GOLDEN_ONE = "/root/reference/ord_formatted_data_one.json"


@register(
    "ord_scan_documents",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_GLOB}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), flat AS (
      SELECT dataset_id, UNNEST(rx) AS r FROM ds WHERE len(rx) > 0
      UNION ALL
      -- posexplode_outer parity: a dataset with no reactions still
      -- yields one all-NULL placeholder row on the Spark side
      SELECT dataset_id, NULL AS r FROM ds WHERE rx IS NULL OR len(rx) = 0
    )
    SELECT dataset_id,
           json_extract_string(r, '$.reaction_id') AS reaction_id,
           CAST(json_extract(r, '$.success') AS BOOLEAN) AS success,
           CAST(json_array_length(r, '$.inputsMap') AS INT) AS n_input_tabs,
           CAST(COALESCE(json_array_length(r, '$.outcomes'), 0) AS INT)
             AS n_outcomes
    FROM flat
    """,
    tags=("ord", "scan"))
def ord_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze scan of the whole golden corpus: one row per reaction
    record with input/outcome arities (web_scrpaer_2.py:530-548
    reversed). Oracled since round 6: DuckDB independently walks the
    same JSON files; records without an ``inputsMap`` surface as NULL
    arity in both engines (size(NULL map) is NULL under ANSI)."""
    rx = read_ord_documents(spark, GOLDEN_GLOB)
    return rx.select(
        "dataset_id", "reaction_id", "success",
        F.size(F.map_keys("inputs")).alias("n_input_tabs"),
        F.coalesce(F.size("outcomes"), F.lit(0)).alias("n_outcomes"))


@register(
    "ord_python_datasource",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_GLOB}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.total_reactions_scraped')
               AS BIGINT) AS total_reactions_scraped,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), flat AS (
      SELECT dataset_id, total_reactions_scraped,
             UNNEST(rx) AS r,
             CAST(UNNEST(generate_series(0, len(rx) - 1)) AS INT)
               AS reaction_pos
      FROM ds WHERE len(rx) > 0
      UNION ALL
      SELECT dataset_id, total_reactions_scraped, NULL AS r,
             NULL AS reaction_pos
      FROM ds WHERE rx IS NULL OR len(rx) = 0
    )
    SELECT dataset_id, total_reactions_scraped, reaction_pos,
           json_extract_string(r, '$.reaction_id') AS reaction_id,
           CAST(json_extract(r, '$.success') AS BOOLEAN) AS success,
           CAST(json_array_length(r, '$.inputsMap') AS INT) AS n_input_tabs,
           CAST(COALESCE(json_array_length(r, '$.outcomes'), 0) AS INT)
             AS n_outcomes
    FROM flat
    """,
    tags=("ord", "scan", "source"),
)
def ord_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The golden corpus through the CUSTOM Spark 4 Python Data
    Source (``sources/ord_datasource.py``): partition-per-capture-
    file reads — the reference's 3-worker dataset parallelism
    (web_scrpaer_2.py:308-327) as planner-visible input partitions —
    streaming flat arity rows with PERMISSIVE malformed-file
    handling. Value-checked against the same DuckDB JSON walk as the
    relational scan, plus per-reaction ordinals and the dataset's
    own recorded total, so the connector's row fan-out, NULL
    posture, and 0-based positions all hash-match."""
    # registration is idempotent per session (re-register overwrites)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrdDataSource)
    return (spark.read.format("ord").option("path", GOLDEN_GLOB).load())


@register(
    "ord_python_datasource_pushdown",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_GLOB}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), flat AS (
      SELECT dataset_id, UNNEST(rx) AS r FROM ds WHERE len(rx) > 0
    )
    SELECT dataset_id,
           json_extract_string(r, '$.reaction_id') AS reaction_id,
           CAST(json_array_length(r, '$.outcomes') AS INT) AS n_outcomes
    FROM flat
    WHERE CAST(json_extract(r, '$.success') AS BOOLEAN)
      AND json_array_length(r, '$.outcomes') >= 1
    """,
    tags=("ord", "scan", "source"),
)
def ord_python_datasource_pushdown(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Mixed filter pushdown through the custom connector: the
    ``success = true`` predicate is PUSHED into the Python reader
    (rows failing it never cross the Arrow boundary — the connector
    analog of row-group pruning), while ``n_outcomes >= 1`` is not
    pushable and stays a post-scan Spark filter. The reader-level
    split is pinned by unit tests; the oracle re-derives both
    predicates from the raw JSON, so over- OR under-pushing (rows
    filtered twice, or not at all) breaks the value hash."""
    # runtime conf (not only session default): a caller-built
    # session without DEFAULT_CONFS must still plan this reader
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrdDataSource)
    df = spark.read.format("ord").option("path", GOLDEN_GLOB).load()
    return (df.filter((F.col("success") == True)  # noqa: E712
                      & (F.col("n_outcomes") >= 1))
            .select("dataset_id", "reaction_id", "n_outcomes"))


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
           CAST(SUM(len(rx)) AS BIGINT) AS total_reactions,
           CAST(SUM(len(list_filter(rx,
               x -> CAST(json_extract(x, '$.success') AS BOOLEAN))))
             AS BIGINT) AS successful_scrapes
    FROM ds GROUP BY dataset_id
    """,
    tags=("ord", "agg"),
)
def ord_dataset_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dataset totals over the full corpus, duplicates across
    capture files summed — web_scrpaer_2.py:461-462 on real data,
    cross-checked against DuckDB's JSON reader."""
    rx = read_ord_documents(spark, GOLDEN_GLOB)
    # count reaction_pos, not reaction_id: the oracle counts array
    # ELEMENTS (len(rx)), and a failure record without a reaction_id
    # is still an element — only the posexplode_outer empty-dataset
    # placeholder (reaction_pos NULL) must not count.
    return rx.groupBy("dataset_id").agg(
        F.count("reaction_pos").alias("total_reactions"),
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


@register(
    "ord_sample_report",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_ONE}')
    ), ds AS (
      SELECT k AS dataset_id,
             CAST(json_extract(j, '$.' || k || '.reactions') AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), flat AS (
      SELECT dataset_id, UNNEST(rx) AS r,
             UNNEST(generate_series(1, len(rx))) AS pos
      FROM ds
    ), target AS (
      SELECT * FROM flat
      WHERE CAST(json_extract(r, '$.success') AS BOOLEAN)
      ORDER BY dataset_id, pos LIMIT 1
    ), pairs AS (
      SELECT UNNEST(CAST(json_extract(r, '$.inputsMap') AS JSON[])) AS p
      FROM target
    ), comps AS (
      SELECT json_extract_string(p, '$[0]') AS tab,
             UNNEST(CAST(json_extract(p, '$[1].components') AS JSON[])) AS c
      FROM pairs
    ), inp AS (
      SELECT 'input' AS section, tab,
             json_extract_string(c, '$.identifiers[0].value') AS identifier,
             json_extract_string(c, '$.reaction_role') AS reaction_role,
             CASE WHEN json_extract(c, '$.amount.moles') IS NOT NULL
                    THEN 'moles'
                  WHEN json_extract(c, '$.amount.volume') IS NOT NULL
                    THEN 'volume'
                  ELSE 'N/A' END AS amount_kind,
             COALESCE(
               CAST(json_extract(c, '$.amount.moles.value') AS DOUBLE),
               CAST(json_extract(c, '$.amount.volume.value') AS DOUBLE))
               AS amount_value,
             CAST(NULL AS BOOLEAN) AS is_desired
      FROM comps WHERE json_array_length(c, '$.identifiers') > 0
    ), prods AS (
      SELECT 'product' AS section, CAST(NULL AS VARCHAR) AS tab,
             json_extract_string(o, '$.identifiers[0].value') AS identifier,
             CAST(NULL AS VARCHAR) AS reaction_role,
             CAST(NULL AS VARCHAR) AS amount_kind,
             CAST(NULL AS DOUBLE) AS amount_value,
             COALESCE(CAST(json_extract(o, '$.is_desired_product')
                           AS BOOLEAN), FALSE) AS is_desired
      FROM (SELECT UNNEST(CAST(json_extract(r, '$.outcomes') AS JSON[]))
              AS o FROM target)
      WHERE json_array_length(o, '$.identifiers') > 0
    )
    SELECT * FROM inp UNION ALL SELECT * FROM prods
    """,
    tags=("ord", "report"),
)
def ord_sample_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only read query — v1's sample report
    (web_scraper.py:512-561): first successful reaction of the first
    dataset with successes → per input tab, each component's FIRST
    identifier, its role, and the v1 amount rule (moles, else volume,
    else N/A — v1 ignores mass); then products' first identifier +
    desired flag. Printed strings become typed columns."""
    rx = read_ord_documents(spark, GOLDEN_ONE)
    target = (rx.filter(F.col("success")
                        & F.col("reaction_id").isNotNull())
              .orderBy("dataset_id", "reaction_pos").limit(1))
    comps = (target
             .select(F.explode("inputs").alias("tab", "inp"))
             .select("tab", F.explode("inp.components").alias("c"))
             .filter(F.size("c.identifiers") > 0))
    inp = comps.select(
        F.lit("input").alias("section"), "tab",
        F.col("c.identifiers")[0]["value"].alias("identifier"),
        F.col("c.reaction_role").alias("reaction_role"),
        F.when(F.col("c.amount.moles").isNotNull(), "moles")
        .when(F.col("c.amount.volume").isNotNull(), "volume")
        .otherwise("N/A").alias("amount_kind"),
        F.coalesce(F.col("c.amount.moles.value"),
                   F.col("c.amount.volume.value")).alias("amount_value"),
        F.lit(None).cast("boolean").alias("is_desired"))
    prods = (target.select(F.explode("outcomes").alias("o"))
             .filter(F.size("o.identifiers") > 0)
             .select(
                 F.lit("product").alias("section"),
                 F.lit(None).cast("string").alias("tab"),
                 F.col("o.identifiers")[0]["value"].alias("identifier"),
                 F.lit(None).cast("string").alias("reaction_role"),
                 F.lit(None).cast("string").alias("amount_kind"),
                 F.lit(None).cast("double").alias("amount_value"),
                 F.coalesce(F.col("o.is_desired_product"), F.lit(False))
                 .alias("is_desired")))
    return inp.unionByName(prods)


@register(
    "ord_amount_unit_rollup",
    oracle=f"""
    WITH doc AS (
      SELECT json(content) AS j FROM read_text('{GOLDEN_GLOB}')
    ), ds AS (
      SELECT CAST(json_extract(j, '$.' || k || '.reactions')
                  AS JSON[]) AS rx
      FROM doc, UNNEST(json_keys(j)) AS t(k)
    ), r AS (
      SELECT UNNEST(rx) AS r FROM ds
    ), e AS (
      SELECT UNNEST(CAST(json_extract(r, '$.inputsMap') AS JSON[]))
               AS entry
      FROM r
    ), c AS (
      SELECT UNNEST(CAST(json_extract(entry, '$[1].components')
                         AS JSON[])) AS comp
      FROM e
    )
    SELECT CASE
             WHEN json_extract(comp, '$.amount.moles') IS NOT NULL
               THEN 'moles'
             WHEN json_extract(comp, '$.amount.volume') IS NOT NULL
               THEN 'volume'
             WHEN json_extract(comp, '$.amount.mass') IS NOT NULL
               THEN 'mass'
             ELSE 'none' END AS kind,
           COALESCE(
             json_extract_string(comp, '$.amount.moles.units'),
             json_extract_string(comp, '$.amount.volume.units'),
             json_extract_string(comp, '$.amount.mass.units'),
             'N/A') AS units,
           COUNT(*) AS n_components
    FROM c GROUP BY 1, 2
    """,
    tags=("ord", "agg"),
)
def ord_amount_unit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantitative-domain audit of the golden corpus: input
    components counted by oneof-amount KIND (moles/volume/mass/none)
    and unit — the distribution SURVEY.md §1.3 documents (418 MOLE,
    350 LITER + 4 MILLILITER, 1 GRAM across the five capture files'
    reaction records, duplicates included) — i.e. the
    oneof-normalization semantics of web_scrpaer_2.py:124-145
    verified AS AN AGGREGATE over every component, not just per
    formatted row.

    Shape: two explodes (map values → components) then one tiny hash
    aggregate on the (kind, unit) domain; the oneof pick is the same
    struct-nullness CASE the formatter uses, cross-checked against
    DuckDB's independent JSON walk of the raw files.
    """
    rx = read_ord_documents(spark, GOLDEN_GLOB)
    comp = (rx.select(F.explode(F.map_values("inputs")).alias("inp"))
            .select(F.explode("inp.components").alias("c")))
    amt = F.col("c.amount")
    kind = (F.when(amt["moles"].isNotNull(), "moles")
            .when(amt["volume"].isNotNull(), "volume")
            .when(amt["mass"].isNotNull(), "mass")
            .otherwise("none"))
    units = F.coalesce(amt["moles"]["units"], amt["volume"]["units"],
                       amt["mass"]["units"], F.lit("N/A"))
    return (comp.select(kind.alias("kind"), units.alias("units"))
            .groupBy("kind", "units")
            .agg(F.count("*").alias("n_components")))
