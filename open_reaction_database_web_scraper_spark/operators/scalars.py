"""Scalar functions (SURVEY.md §2.8).

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, inside whole-stage codegen, no Python in the hot path.
Reference provenance per function is cited on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import register


@register(
    "str_split_part",
    oracle="""
    SELECT c_custkey, split_part(c_name, '#', 2) AS name_num
    FROM customer
    """,
    tags=("scalar", "string"),
)
def str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last path segment — the reference's ``href.split('/')[-1]``
    (web_scrpaer_2.py:261,421)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.substring_index("c_name", "#", -1).alias("name_num"))


@register(
    "str_regexp_extract",
    oracle=r"""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)
             AS name_id
    FROM customer
    """,
    tags=("scalar", "string"),
)
def str_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture — the reference's ``of (\\d+) entries``
    pagination parse (web_scrpaer_2.py:234-237)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .cast("bigint").alias("name_id"))


@register(
    "str_trim_len_case",
    oracle="""
    SELECT p_partkey, upper(p_type) AS type_upper,
           lower(p_brand) AS brand_lower,
           length(trim(p_name)) AS name_len
    FROM part
    """,
    tags=("scalar", "string"),
)
def str_trim_len_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim/length/case cleaning (web_scrpaer_2.py:301,310)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length(F.trim("p_name")).alias("name_len"))


@register(
    "str_concat_fmt",
    oracle="""
    SELECT o_orderkey,
           'ord-' || CAST(o_orderkey AS VARCHAR) AS synth_id,
           concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri
    FROM orders
    """,
    tags=("scalar", "string"),
)
def str_concat_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id/url building — the reference's f-string id construction
    (web_scrpaer_2.py:341,389)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat(F.lit("ord-"), F.col("o_orderkey").cast("string"))
        .alias("synth_id"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority")
        .alias("status_pri"))


@register(
    "cond_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1
    """,
    tags=("scalar", "conditional"),
)
def cond_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branchy decode — the reference's if/elif oneof-pick
    (web_scrpaer_2.py:128-145)."""
    od = load(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") > 300000, "big")
              .when(F.col("o_totalprice") > 100000, "mid")
              .otherwise("small"))
    return od.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("cnt"))


@register(
    "cond_coalesce_default",
    oracle="""
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'error'), 'UNKNOWN') AS etype,
           COALESCE(CAST(json_extract_string(props, '$.missing') AS VARCHAR),
                    'none') AS missing_key
    FROM events
    """,
    tags=("scalar", "conditional"),
)
def cond_coalesce_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.get(k, default)`` semantics (web_scrpaer_2.py:107,130,187):
    absent JSON keys and sentinel values fall back to defaults."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("UNKNOWN"))
        .alias("etype"),
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("none"))
        .alias("missing_key"))


@register(
    "num_arith_round",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))
                * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DOUBLE) AS net_price,
           ABS(l_quantity - 25) AS qty_dev,
           CAST(CAST(l_quantity AS DECIMAL(18,4)) * 1000 AS DOUBLE) AS qty_milli
    FROM lineitem
    """,
    tags=("scalar", "numeric"),
)
def num_arith_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic on amounts — the reference's unit rescale analog
    (mole→mmol ×1e3) and failure-count subtraction
    (web_scraper.py:345). Derived prices computed in exact decimal so
    both engines produce bit-identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return li.select(
        "l_orderkey", "l_linenumber",
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
         * (F.lit(1) + dec("l_tax"))).cast("double").alias("net_price"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        (dec("l_quantity") * 1000).cast("double").alias("qty_milli"))


@register(
    "date_parts_trunc",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def date_parts_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp parts and truncation over o_orderdate [E]."""
    od = load(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_95"))


@register(
    "arr_explode",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
    FROM documents
    """,
    tags=("scalar", "array"),
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten array to rows — the reference's component loop
    (web_scrpaer_2.py:120). Explode is pipelined inside codegen; no
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "arr_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(UNNEST(generate_series(1, len(words))) - 1 AS INT) AS pos,
           UNNEST(words) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
    tags=("scalar", "array"),
)
def arr_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving flatten — the reference's
    ``enumerate(reaction_ids, 1)`` (web_scrpaer_2.py:445)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", "pos", "word")


@register(
    "arr_transform_filter",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           CAST(len(embedding) AS INT) AS dim,
           CAST(list_contains(embedding, 0.0) AS BOOLEAN) AS has_zero
    FROM embeddings
    """,
    tags=("scalar", "array", "higher-order"),
)
def arr_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-element map/filter without explode — v1's SMILES-only
    identifier filter (web_scraper.py:432-437) as higher-order
    functions. No shuffle, no Python."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.size("embedding").alias("dim"),
        F.array_contains("embedding", F.lit(0.0).cast("float"))
        .alias("has_zero"))


@register(
    "map_ops",
    oracle="""
    SELECT user_id,
           COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0)
             AS click_cnt,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
    tags=("scalar", "map"),
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build and read string-keyed maps — the reference's inputsMap
    pair handling (web_scrpaer_2.py:115-117,157-158). Builds a
    type→count map per user via map_from_entries, then reads it back
    with element_at; the oracle computes the same answer
    relationally."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts"))
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0))
        .alias("click_cnt"),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"))


@register(
    "json_get_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) % 10) AS k_mod
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    tags=("scalar", "json"),
)
def json_get_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pull fields out of a JSON string column (events.props) — the
    reference parses whole JSON docs (web_scrpaer_2.py:369)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))
            .filter(F.col("k") > 50))


@register(
    "date_arith_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE)
                AS TIMESTAMP) AS due_date,
           CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE)
                AS TIMESTAMP) AS prior_month,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS days_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS month_end
    FROM orders
    """,
    tags=("scalar", "date"),
)
def date_arith_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic on dates: fixed-day offsets, calendar-month
    offsets (both engines clamp month-ends identically), day deltas,
    and month boundaries.

    Date-valued results are surfaced as midnight TIMESTAMPs on both
    sides: pandas renders a Spark DATE as ``datetime.date`` but a
    DuckDB DATE as a midnight datetime64, so bare DATE columns can
    never hash-match under the driver's pandas comparison — the
    arithmetic itself still happens in DATE space."""
    od = load(spark, sf_dir, "orders").withColumn(
        "d", F.to_date("o_orderdate"))
    return od.select(
        "o_orderkey",
        F.date_add("d", 90).cast("timestamp").alias("due_date"),
        F.add_months("d", -1).cast("timestamp").alias("prior_month"),
        F.datediff("d", F.lit("1995-01-01").cast("date"))
        .cast("long").alias("days_since_95"),
        F.last_day("d").cast("timestamp").alias("month_end"))
