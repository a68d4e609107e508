"""Aggregation operators (SURVEY.md §2.4).

Reference semantics: per-dataset reaction counts and conditional
success counts (web_scrpaer_2.py:461-462), global totals
(web_scraper.py:336-337), re-nesting via per-group list collection
(web_scrpaer_2.py:541-543). All are hash aggregations with automatic
partial (map-side) combine — the scalable default at 100 TB; rollup
and cube add multi-dimension totals in a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.numeric import davg, davg_sql, dec, dsum, dsum_sql
from ..registry import register


@register(
    "agg_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l_discount AS DECIMAL(18,4))))
                     AS DECIMAL(38,4)) AS DOUBLE)
             AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           MIN(l_quantity) AS min_qty,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: several aggregates per group.

    The flagship query (``entry``). One shuffle; partial aggregation
    map-side; decimal accumulators for cross-engine determinism.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        # scale-8 product sum reduced to scale 4 BEFORE the double
        # cast: at scale 8 the sum's integer image exceeds 2^53, and
        # DuckDB's int128→double→÷10^scale conversion double-rounds
        # where Spark's BigDecimal rounds once — a 1-ULP, data-
        # dependent hash flake (bit at sf0.1). At scale 4 the integer
        # image is exact in a double, so both engines round once.
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_count_per_group",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS total_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows per group — the reference's ``total_reactions`` per
    dataset (web_scrpaer_2.py:462)."""
    return (load(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("total_orders")))


@register(
    "agg_conditional_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)
             AS big_qty_cnt,
           COUNT(*) AS total_cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count rows satisfying a predicate per group — the reference's
    ``successful_scrapes`` counter (web_scrpaer_2.py:461)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0))
        .alias("big_qty_cnt"),
        F.count("*").alias("total_cnt"),
    )


@register(
    "agg_global_totals",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice')} AS total_price,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals without grouping (web_scraper.py:336-337)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (reference dedups ids while
    accumulating, web_scrpaer_2.py:262)."""
    return (load(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("distinct_parts")))


@register("agg_approx_count_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path where exact
    distinct's shuffle is prohibitive. Rows-only check (approximate,
    but deterministic for a fixed input)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )


@register(
    "agg_collect_list",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "nest"),
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-nest: gather child records into a per-group array — the
    reference's reactions-per-dataset rebuild (web_scrpaer_2.py:
    541-543). The array is sorted then serialized to a CSV string:
    semantics are unchanged (order-insensitive nest), and the scalar
    image survives the driver's pandas hasher, which cannot hash raw
    list cells (round-1 ORACLE-ERR)."""
    return (load(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list("o_orderkey")),
                            lambda x: x.cast("string")), ",")
                 .alias("order_keys")))


@register(
    "agg_collect_set",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS types
    FROM events GROUP BY user_id
    """,
    tags=("agg", "nest"),
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique values per group (reference's dedup-while-collecting,
    web_scrpaer_2.py:422-423). Serialized like ``agg_collect_list``
    so the driver's pandas hasher can compare it."""
    return (load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.array_join(F.sort_array(F.collect_set("event_type")),
                              ",").alias("types")))


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group + subtotal + grand-total in one pass — the reference
    computes group and global counts separately (web_scraper.py:290,
    :336-337); ROLLUP fuses them into a single shuffle."""
    return (load(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("cnt"), dsum("l_quantity").alias("sum_qty")))


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-dimension totals (returnflag × linestatus)."""
    return (load(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("cnt"),
                 dsum("l_extendedprice").alias("sum_price")))


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-flag, per-status, grand total) —
    the SQL surface of the engine; one Expand + one hash aggregate,
    not three scans."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS cnt, {dsum_sql('l_extendedprice')} AS sum_price
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register("agg_hll_sketch_merge", oracle=None, tags=("agg", "approx"))
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+):
    per-language distinct-token sketches plus an ALL row built by
    UNIONING THE SKETCHES, not rescanning the data — the property
    that makes 100 TB distinct-counting incremental (per-partition /
    per-day sketches persist, any rollup is a cheap sketch merge).
    Rows-only: estimates are approximate; the test pins them within
    tolerance of the exact counts."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    sk = tok.groupBy("lang").agg(F.hll_sketch_agg("word").alias("sk"))
    per_lang = sk.select(
        "lang", F.hll_sketch_estimate("sk").alias("est_distinct"))
    merged = (sk.agg(F.hll_union_agg("sk").alias("sk"))
              .select(F.lit("ALL").alias("lang"),
                      F.hll_sketch_estimate("sk").alias("est_distinct")))
    return per_lang.unionByName(merged)


@register(
    "agg_min_max_by",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rn_max,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
               AS rn_min
      FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS top_orderkey,
           MAX(CASE WHEN rn_max = 1 THEN o_totalprice END) AS top_price,
           MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS bottom_orderkey,
           MAX(CASE WHEN rn_min = 1 THEN o_totalprice END) AS bottom_price
    FROM ranked GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin per group via ``max_by``/``min_by`` — "which
    order was the most/least expensive per priority class" without a
    self-join or a window over raw rows.

    max_by's aggregation buffer carries ONE candidate row per group
    per partition (map-side combined), so the plan is a plain
    single-shuffle hash aggregate — strictly cheaper at 100 TB than
    the window-rank formulation the oracle uses, which must shuffle
    and sort every row. Ties on price are broken by orderkey by
    ordering on a (price, key) struct (Spark compares structs
    lexicographically), making the answer unique at any parallelism.
    """
    od = load(spark, sf_dir, "orders")
    by_max = F.struct("o_totalprice", "o_orderkey")
    return od.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", by_max).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
        F.min_by("o_orderkey", by_max).alias("bottom_orderkey"),
        F.min("o_totalprice").alias("bottom_price"))


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via mergeable roaring-style bitmaps
    (Spark 3.5+ bitmap functions): each (group, 2^15-key bucket)
    builds a bitmap of key positions, bitmaps OR-merge map-side, and
    the final count is the SUM of per-bucket popcounts.

    This is the 100 TB alternative to both COUNT(DISTINCT) (whose
    exact plan needs an Expand or a two-phase distinct shuffle of
    every key occurrence) and HLL (approximate): the shuffle carries
    at most one ≤4 KiB bitmap per (group, bucket) per task, the merge
    is associative, and partial bitmaps can be persisted and
    re-merged incrementally. The oracle is the plain COUNT(DISTINCT)
    it must equal exactly.
    """
    ev = load(spark, sf_dir, "events")
    per_bucket = (ev.groupBy(
        "event_type",
        F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(F.bitmap_construct_agg(
            F.bitmap_bit_position("user_id")).alias("bmp")))
    return (per_bucket.groupBy("event_type")
            .agg(F.sum(F.bitmap_count("bmp")).alias("n_users")))


@register(
    "agg_bool_and_or",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_above_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "bool"),
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean reduction aggregates (EVERY/ANY): per order status,
    whether ALL orders clear a price floor and whether ANY is
    urgent — the data-quality-assertion aggregate shape (``bool_and``
    over a validation predicate is how a 100 TB pipeline asserts an
    invariant without collecting a row).

    Both reduce map-side to one boolean per (group, partition), so
    the exchange carries |groups| x 1-bit payloads; short-circuit
    semantics are irrelevant to correctness (AND/OR are associative
    and commutative over the predicate column)."""
    o = load(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.bool_and(F.col("o_totalprice") > 1000)
                 .alias("all_above_1k"),
                 F.bool_or(F.col("o_orderpriority") == "1-URGENT")
                 .alias("any_urgent"),
                 F.count("*").alias("n_orders")))


@register("agg_count_min_sketch", oracle=None,
          tags=("agg", "sketch", "approx"))
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates: one mergeable KB-sized
    sketch over the event_type stream, probed for each type's
    estimated count — the third sketch family next to HLL
    (agg_hll_sketch_merge, distinct) and bitmaps (agg_bitmap_distinct,
    exact distinct): CMS answers FREQUENCY at bounded memory with a
    one-sided error (estimate >= true, overshoot <= eps x N w.h.p.).

    The build is Spark's native `count_min_sketch` aggregate —
    partial sketches merge associatively map-side, so the exchange
    carries one ~17 KB sketch per partition regardless of row count.
    Probing uses the JVM CountMinSketch reader on the single final
    sketch (KB-sized, driver-safe — same bounded-state posture as
    the IVF centroid collect); the probe keys are the distinct
    event types, themselves a tiny aggregate. Approximate → rows-only;
    the estimate-vs-exact envelope is pinned in tests.
    """
    ev = load(spark, sf_dir, "events")
    skdf = ev.agg(F.count_min_sketch(
        F.col("event_type"), F.lit(0.001), F.lit(0.99), F.lit(42))
        .alias("sk"))
    sk_bytes = bytes(skdf.collect()[0].sk)
    # NULL event_types crash both the python sort (None < str) and
    # the JVM probe (estimateCount(null) NPEs); the sketch aggregate
    # itself skips NULLs, so the probe list must too.
    types = sorted(r.event_type for r in
                   ev.select("event_type").distinct()
                   .filter(F.col("event_type").isNotNull()).collect())
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(sk_bytes)
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    rows = [(t, int(sketch.estimateCount(t))) for t in types]
    return spark.createDataFrame(rows, "event_type string, est_count bigint")
