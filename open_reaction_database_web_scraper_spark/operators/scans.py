"""Scans, sources and sinks (SURVEY.md §2.1).

The reference's source is a crawled JSON document stream with a
dead-letter side channel for failed records (web_scrpaer_2.py:
369,380-385,505); its sink is a nested JSON document store keyed by
dataset (:545-548). Here those become parquet/JSON DataSource scans
(predicate pushdown + column pruning for free) and partitioned
writers.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..functions.numeric import dsum, dsum_sql
from ..registry import register

_SINK_ROOT: str | None = None


def _sink_dir(name: str) -> str:
    """Stable per-process output path for sink queries. One temp root
    per session, one subdir per sink, removed at exit — repeated
    invocations (bench warm-up runs every query twice; test reruns)
    overwrite in place instead of accumulating orphan mkdtemp dirs."""
    global _SINK_ROOT
    if _SINK_ROOT is None:
        _SINK_ROOT = tempfile.mkdtemp(prefix="ordspark_sinks_")
        atexit.register(shutil.rmtree, _SINK_ROOT, ignore_errors=True)
    return os.path.join(_SINK_ROOT, name)


@register(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_size FROM part",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection — ReadSchema carries only the
    four selected columns down to the parquet footer."""
    return load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size")


@register(
    "scan_json_nested",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
    tags=("scan", "json"),
)
def scan_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON ingestion with malformed-row tolerance —
    the reference's ``json.loads`` of scraped text
    (web_scrpaer_2.py:369) with its try/except guard (:380-385).
    ``from_json`` in PERMISSIVE mode yields null structs instead of
    failing, reproducing the `.get(k, default)` semantics."""
    ev = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.select(
        "event_id",
        F.from_json("props", schema, {"mode": "PERMISSIVE"}).alias("p"))
    return parsed.select("event_id", F.col("p.k").alias("k"))


@register(
    "source_enumerate",
    oracle="""
    SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 10
    """,
    tags=("scan",),
)
def source_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerate work items with dedup + early stop — the reference's
    paginated dataset-id crawl (web_scrpaer_2.py:209-289) with its
    seen-set dedup (:262) and early-stop (:264-266). The limit is
    pushed below the sort by TakeOrderedAndProject."""
    return (load(spark, sf_dir, "events")
            .select("user_id").distinct()
            .orderBy("user_id").limit(10))


@register(
    "sink_json",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    tags=("sink",),
)
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink round-trip — the reference's ``json.dump`` of nested
    per-dataset records (web_scrpaer_2.py:545-548). Writes nested
    rows as JSON lines, re-reads them, and returns the re-read frame;
    the oracle checks the round-tripped values against the source —
    a sink bug (lost rows, mangled arrays) breaks the hash match.
    The round-tripped array is serialized to CSV in the RETURNED
    frame only (the sink itself stays nested): raw list cells are
    unhashable to the driver's pandas comparison."""
    nested = (load(spark, sf_dir, "orders")
              .groupBy("o_custkey")
              .agg(F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
                   F.count("*").alias("n_orders")))
    out = _sink_dir("sink_json")
    nested.coalesce(4).write.mode("overwrite").json(out)
    schema = "o_custkey bigint, order_keys array<bigint>, n_orders bigint"
    return spark.read.schema(schema).json(out).select(
        "o_custkey",
        F.array_join(F.transform("order_keys",
                                 lambda x: x.cast("string")), ",")
        .alias("order_keys"),
        "n_orders")


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_returnflag
    """,
    tags=("sink",),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink — the per-dataset keying of the
    reference's output map (web_scrpaer_2.py:530-535) as a
    ``partitionBy`` layout, so downstream reads get partition
    pruning. Returns per-partition counts from the re-read."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    out = _sink_dir("sink_parquet_partitioned")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    # Partition-pruned read: only the 'R' directory is listed.
    pruned = back.filter(F.col("l_returnflag") == "R")
    return pruned.groupBy("l_returnflag").agg(F.count("*").alias("cnt"))


@register(
    "error_side_channel",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_type = 'error'
    """,
    tags=("scan", "quality"),
)
def error_side_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing: split failed records from good ones and
    keep both flowing — the reference's failure records
    (web_scrpaer_2.py:385,505) and success filter (:542). Returns the
    dead-letter side; the good side is the complement filter."""
    ev = load(spark, sf_dir, "events")
    bad = ev.filter(F.col("event_type") == "error")
    return bad.select("event_id", "event_type", "value")


@register(
    "sink_parquet_clustered",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           {dsum_sql('l_quantity')} AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-02-01'
    """,
    tags=("sink", "layout"),
)
def sink_parquet_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered parquet layout: range-partition by the query-time
    filter column (`l_shipdate`) and sort within files, so every
    file's row-group min/max statistics cover a narrow key range and
    a time-window read skips almost all files — the data-skipping
    half of a 100 TB layout (partitionBy handles categorical keys,
    clustering handles continuous ones). The returned frame is a
    one-month window aggregate over the re-read: a layout bug that
    drops or duplicates rows breaks the oracle hash."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate")
    out = _sink_dir("sink_parquet_clustered")
    (li.repartitionByRange(8, "l_shipdate")
     .sortWithinPartitions("l_shipdate")
     .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    win = back.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-02-01"))
    return win.agg(F.count("*").alias("cnt"),
                   dsum("l_quantity").alias("qty"))


@register(
    "sink_bronze_mixed",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_records,
           CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_formatted,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_failed,
           CAST(SUM(LENGTH(props)) AS BIGINT) AS raw_bytes,
           CAST(SUM(CAST(CASE WHEN event_type <> 'error' THEN value END
                         AS DECIMAL(18,4))) AS DOUBLE) AS formatted_value
    FROM events GROUP BY user_id
    """,
    tags=("sink", "quality"),
)
def sink_bronze_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1's mixed bronze sink (web_scraper.py:349-352): ONE output
    keeping raw payloads, formatted records, AND failed records
    together — `reaction_database_scrape.json` holds every scrape
    result with its raw data, a `formatted_data` field only on
    successes (web_scraper.py:283-285), and error info on failures.
    SURVEY §3.3 calls it the engine's bronze-layer analog.

    Here: every event becomes a bronze record carrying the raw
    payload (`props`), a `formatted` struct (null for failures —
    exactly v1's conditional `formatted_data`), and an `error` field
    (null for successes). Written as one JSON-lines layout, re-read
    with an explicit schema, and rolled up per user; the oracle
    recomputes the rollup from the source table, so a sink that
    drops a record class, mangles the raw payload, or loses
    formatted values breaks the hash."""
    ev = load(spark, sf_dir, "events")
    ok = F.col("event_type") != "error"
    bronze = ev.select(
        "event_id", "user_id",
        ok.alias("success"),
        F.col("props").alias("raw"),
        F.when(ok, F.struct(F.col("event_type").alias("kind"),
                            F.col("value").alias("value")))
        .alias("formatted"),
        F.when(~ok, F.concat(F.lit("scrape failed: event "),
                             F.col("event_id"))).alias("error"))
    out = _sink_dir("sink_bronze_mixed")
    bronze.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, success boolean, raw string, "
        "formatted struct<kind:string, value:double>, error string"
    ).json(out)
    return (back.groupBy("user_id")
            .agg(F.count("*").alias("n_records"),
                 F.sum(F.when(F.col("success"), 1).otherwise(0))
                 .alias("n_formatted"),
                 F.count("error").alias("n_failed"),
                 F.sum(F.length("raw")).alias("raw_bytes"),
                 dsum(F.col("formatted.value")).alias("formatted_value")))


@register(
    "scan_csv_typed",
    oracle="""
    SELECT p_partkey, p_brand, p_size
    FROM part WHERE p_size >= 25
    """,
    tags=("scan", "csv"),
)
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with an explicit schema: write a CSV image of
    `part` once per session, re-read it typed (no inference pass —
    at 100 TB schema inference is a full extra scan), filter on a
    numeric column. PERMISSIVE mode + explicit schema is the same
    malformed-row posture as the JSON scan; the oracle recomputes
    from the parquet source, so a type-mangling round trip (string
    size, lost header) breaks the hash."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    out = _sink_dir("scan_csv_typed")
    part.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema("p_partkey bigint, p_brand string, "
                             "p_size int") \
        .option("header", True).option("mode", "PERMISSIVE").csv(out)
    return back.filter(F.col("p_size") >= 25)


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT l_orderkey, l_quantity, l_returnflag
    FROM lineitem WHERE l_quantity > 45
    """,
    tags=("scan", "orc"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round-trip (second columnar format besides
    parquet): write a lineitem projection as ORC once per session,
    re-read, filter. ORC carries the same pushdown machinery —
    min/max stripe statistics serve the quantity predicate — and the
    oracle recomputes from the parquet source, so any type or value
    mangling in the ORC round trip breaks the hash."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag")
    out = _sink_dir("scan_orc_roundtrip")
    li.write.mode("overwrite").orc(out)
    return spark.read.orc(out).filter(F.col("l_quantity") > 45)


@register(
    "sink_compact_small_files",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("sink", "maintenance"),
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented table (64 tiny parquet
    files — the classic streaming-ingest footprint) rewritten into a
    handful of right-sized files, integrity-checked by re-reading
    the compacted layout and rolling it up against the source table.

    The compaction read->write is SHUFFLE-FREE: `coalesce` merges
    input splits within tasks instead of `repartition`ing through an
    exchange — at 100 TB, compaction jobs are pure IO and should
    never pay a network pass over the data. File sizing is belt and
    braces: coalesce bounds the file COUNT while
    `maxRecordsPerFile` re-splits if a merged task would exceed the
    target row budget (the local knob for the 128 MB-file target a
    real lakehouse compactor aims at).
    """
    docs = load(spark, sf_dir, "documents")
    frag = _sink_dir("sink_compact_fragmented")
    docs.repartition(64).write.mode("overwrite").parquet(frag)

    compacted = _sink_dir("sink_compact_compacted")
    (spark.read.parquet(frag)
     .coalesce(4)
     .write.mode("overwrite")
     .option("maxRecordsPerFile", 500_000)
     .parquet(compacted))
    return (spark.read.parquet(compacted)
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


@register(
    "scan_text_lines",
    oracle="SELECT text AS line FROM documents",
    tags=("scan", "source"),
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-lines source round-trip: the corpus written as plain
    .txt (one document per line — the commonest LLM-corpus interchange
    format) and re-read with ``spark.read.text``, completing the
    source matrix (parquet / ORC / CSV / JSON / text).

    The text source is splittable by line and prunes nothing (one
    value column) — which is exactly why the engine's first move on
    such data is this scan followed by a parquet rewrite
    (sink_parquet_partitioned); the op documents the boundary. The
    write is a temp-dir fixture (same pattern as scan_orc_roundtrip);
    documents contain no newlines, so line == document and the
    oracle is the parquet-sourced projection.
    """
    out = _sink_dir("text_lines_src")
    (load(spark, sf_dir, "documents")
     .select("text").coalesce(4)
     .write.mode("overwrite").text(out))
    return spark.read.text(out).select(F.col("value").alias("line"))


ZORDER_BITS = 16  # bits per dimension in the interleaved key


def zorder_key(x, y, x_max, y_max):
    """64-bit Morton (Z-order) value of two columns, each normalized
    to ZORDER_BITS via its max: bit i of x lands at position 2i, bit
    i of y at 2i+1. Pure JVM integer expressions (a fixed 16-step
    shift/mask unroll — whole-stage codegen folds it flat)."""
    nx = F.floor(x.cast("double") / x_max * ((1 << ZORDER_BITS) - 1)) \
        .cast("long")
    ny = F.floor(y.cast("double") / y_max * ((1 << ZORDER_BITS) - 1)) \
        .cast("long")
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = (z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(nx, i)
                        .bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ny, i)
                        .bitwiseAND(F.lit(1)), 2 * i + 1)))
    return z


@register(
    "sink_zorder_clustered",
    oracle=f"""
    SELECT COUNT(*) AS cnt, {dsum_sql('l_quantity')} AS qty
    FROM lineitem
    WHERE l_partkey < 100 AND l_suppkey < 100
    """,
    tags=("sink", "layout"),
)
def sink_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered layout: rows range-partitioned and sorted
    on the Morton interleave of TWO filter dimensions (l_partkey,
    l_suppkey), so each output file covers a small RECTANGLE of the
    (part, supp) plane and min/max statistics skip files for
    predicates on EITHER dimension — what single-key clustering
    (sink_parquet_clustered) cannot give the second column. This is
    the OPTIMIZE ZORDER layout move, built from stock primitives:
    normalize each key by its max (1-row aggregate broadcast),
    interleave bits JVM-side, repartitionByRange + sort on z, write.

    The returned frame is a two-dimension box-filter aggregate over
    the re-read — a layout bug that drops/duplicates rows breaks the
    oracle hash; the per-file rectangle property itself is pinned by
    the dedicated skipping test (both dims' per-file spans ≪ their
    domains).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    maxes = li.agg(F.max("l_partkey").cast("double").alias("pmax"),
                   F.max("l_suppkey").cast("double").alias("smax"))
    z = zorder_key(F.col("l_partkey"), F.col("l_suppkey"),
                   F.col("pmax"), F.col("smax"))
    out = _sink_dir("sink_zorder_clustered")
    (li.crossJoin(F.broadcast(maxes))
     .withColumn("zval", z)
     .repartitionByRange(8, "zval")
     .sortWithinPartitions("zval")
     .drop("pmax", "smax", "zval")
     .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    box = back.filter((F.col("l_partkey") < 100)
                      & (F.col("l_suppkey") < 100))
    return box.agg(F.count("*").alias("cnt"),
                   dsum("l_quantity").alias("qty"))


@register(
    "scan_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_scanned,
           CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_cust,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders
    """,
    tags=("scan", "observability"),
)
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality counters for free via ``df.observe``: the
    metrics (row count, high-value count, null-key count, exact
    decimal price mass) accumulate as accumulator-style aggregates
    DURING the same pass that drives the main job — no second scan
    of a 100 TB table just to know what flowed through it. This is
    the engine-level version of the reference's crawl accounting
    (success/skip tallies incremented while scraping,
    web_scrpaer_2.py:461-462, printed at :339-346 — counters riding
    the work, never a re-crawl).

    The observed pass here feeds a representative downstream job (a
    noop-format write, the cheapest full-materialization action);
    the returned frame is the metrics row itself. The decimal sum
    uses the same exact-accumulator idiom as every money aggregate
    in this package, so the observed value is bit-identical to the
    oracle's.
    """
    from pyspark.sql import Observation

    obs = Observation("qa")
    orders = load(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_scanned"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
        .cast("bigint").alias("n_high_value"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_null_cust"),
        dsum("o_totalprice").alias("total_price"))
    orders.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_scanned"], m["n_high_value"], m["n_null_cust"],
          m["total_price"])],
        "n_scanned bigint, n_high_value bigint, n_null_cust bigint, "
        "total_price double")


@register(
    "scan_schema_merge",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
             AS o_orderpriority
    FROM orders WHERE o_totalprice > 100000
    """,
    tags=("scan", "parquet"),
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations — the long-lived
    lake reality that a column added in month N must not break reads
    over months 1..N-1. Two generations of an orders extract are
    written side by side (gen=1 lacks ``o_orderpriority``; gen=2
    carries it) and re-read with ``mergeSchema`` — Spark unions the
    footers into one schema, back-filling NULL for the pre-evolution
    files; the totalprice filter still pushes into BOTH generations'
    row groups (per-file pruning is schema-aware). The oracle
    derives the expected merged result from the SOURCE table, so a
    merge that drops the new column, mistypes it, or resurrects
    it on old rows breaks the value hash. At 100 TB this is the
    default read mode of any multi-year table; the per-footer merge
    cost is why production tables ALSO checkpoint a canonical schema
    (the catalog's job, not the scan's)."""
    orders = load(spark, sf_dir, "orders")
    out = _sink_dir("scan_schema_merge")
    (orders.filter(F.col("o_orderkey") % 2 == 0)
     .select("o_orderkey", "o_totalprice")
     .write.mode("overwrite").parquet(f"{out}/gen=1"))
    (orders.filter(F.col("o_orderkey") % 2 == 1)
     .select("o_orderkey", "o_totalprice", "o_orderpriority")
     .write.mode("overwrite").parquet(f"{out}/gen=2"))
    back = (spark.read.option("mergeSchema", True)
            .option("basePath", out).parquet(f"{out}/gen=1",
                                             f"{out}/gen=2"))
    return (back.filter(F.col("o_totalprice") > 100000)
            .select("o_orderkey", "o_totalprice", "o_orderpriority"))


@register(
    "sink_ord_datasource",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    """,
    tags=("sink", "source", "ord"),
)
def sink_ord_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write through the CUSTOM transactional sink
    (``sources/ord_datasource.py::OrdSinkWriter``): per-task temp
    shards → driver commit renames + writes ``_MANIFEST.json`` (the
    all-or-nothing visibility contract a FileOutputCommitter gives
    parquet, rebuilt at the connector level), then read the
    MANIFESTED shards back and prove the round trip value-exact
    against the source table. A sink that loses a shard, double-
    commits one, or leaks uncommitted temp files breaks the hash or
    the manifest test."""
    import json as _json

    from ..sources.ord_datasource import OrdSinkDataSource
    spark.dataSource.register(OrdSinkDataSource)
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = _sink_dir("sink_ord_datasource")
    shutil.rmtree(out, ignore_errors=True)  # fresh dir per invocation
    docs.write.format("ord_sink").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    shards = [os.path.join(out, s) for s in manifest["shards"]]
    back = spark.read.schema("doc_id bigint, lang string, source string") \
        .json(shards)
    return back
