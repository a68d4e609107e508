"""Physical-plan shape assertions (SURVEY.md §4).

Correctness says WHAT a query returns; these tests pin HOW Spark
executes it — the properties that decide whether the same plan
survives a 1000-executor / 100 TB scale-up:

- small dimensions broadcast (no shuffle of the big side's rows),
- filters and projections reach the parquet scan,
- aggregates run partial (map-side combine) before the exchange,
- hot-path queries stay inside whole-stage codegen (no Python eval).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from open_reaction_database_web_scraper_spark.registry import (
    REGISTRY,
    load_all_operators,
)

load_all_operators()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pinned_rows(m: dict, name: str) -> int:
    """Shuffle-row reading for an exact pin, failing LOUD when the
    measurement is retry-tainted (round 14, VERDICT r13 #7): a stage
    retry makes shuffle_since under-count (partial attempts report
    only re-run partitions), so a pin mismatch after one would blame
    the plan for a measurement artifact. max_attempt > 0 never occurs
    in healthy local[...] runs — when it does, the cause is named."""
    import pytest as _pytest
    if m.get("max_attempt", 0) > 0:
        _pytest.fail(
            f"{name}: shuffle measurement retry_tainted "
            f"(max_attempt={m['max_attempt']}) — rows may read low; "
            "re-run, and investigate why a local stage retried")
    return m["rows"]


def test_star_join_broadcasts_dims(spark, sf_dir):
    """The fixed-cardinality dims (region, nation) must be pinned
    broadcast joins at ANY scale; customer grows with the data, so
    its join must NOT be hard-pinned — with auto-broadcast off
    (modelling a customer table too big to broadcast) the plan must
    show exactly the two dim broadcasts plus a shuffled join for
    customer. AQE still broadcasts customer while it is small."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_multiway_star")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan


def test_enum_decode_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_lookup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_large_join_is_shuffle_on_key(spark, sf_dir):
    """orders ⋈ lineitem is large-large: sort-merge (or shuffled hash)
    on the join key is the right plan, not a nested loop. At sf0.001
    both sides fit under the broadcast threshold, so disable it to see
    the plan the query would get at scale."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_shuffle_equi")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "BroadcastNestedLoopJoin" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """Predicate on the scan must appear in PushedFilters, not only as
    a post-scan Filter node."""
    plan = plan_of(spark, sf_dir, "filter_eq")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no pushed filters:\n{plan}"


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A 2-column projection over lineitem (16 cols) must read only
    what it needs: ReadSchema lists the projected columns only."""
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_quantity"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_agg_is_partial_then_final(spark, sf_dir):
    """groupBy aggregates must map-side combine (two HashAggregate
    nodes around the exchange), shrinking the shuffle to one row per
    (partition, group)."""
    plan = plan_of(spark, sf_dir, "agg_count_per_group")
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_hot_paths_have_no_python_eval(spark, sf_dir):
    """Core relational queries must stay JVM-side: no BatchEvalPython
    (row-at-a-time Python UDF) anywhere in their plans. (The udf_*
    queries exercise the escape hatch deliberately and are exempt.)"""
    for name in ["agg_multi", "join_multiway_star", "win_topk_per_group",
                 "dedup_exact_hash", "vector_topk_similarity",
                 "text_tokenize_stats", "dedup_minhash_lsh"]:
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, f"{name} fell out of the JVM"


def test_range_join_stays_equi(spark, sf_dir):
    """The interval self-join must remain an equi join on (user,
    time-bucket) with a range residual — never a nested-loop or
    cartesian plan, whose pair generation is quadratic per key."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_range_theta")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_unpivot_is_expand_not_union(spark, sf_dir):
    """unpivot must compile to a single Expand over one scan feeding
    one partial+final aggregate — not N unioned scans."""
    plan = plan_of(spark, sf_dir, "unpivot_long")
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_pivot_is_single_aggregate(spark, sf_dir):
    """Pivot with pinned values: one scan, one aggregate — no extra
    job to discover the pivot domain."""
    plan = plan_of(spark, sf_dir, "pivot_wide")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_topk_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject — a
    per-partition top-k + merge, never a full global sort."""
    plan = plan_of(spark, sf_dir, "topk_order_limit")
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning_on_partitioned_layout(spark, sf_dir):
    """A filter on the partition column of a partitionBy layout must
    become a PartitionFilter (directory pruning — the 100 TB lever
    for per-dataset layouts), not a row-level filter."""
    import tempfile

    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_quantity", "l_returnflag"))
    out = tempfile.mkdtemp(prefix="ordspark_prune_")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    pruned = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l_returnflag" in m.group(1), plan


def test_salted_join_spreads_hot_keys(spark, sf_dir):
    """The salted join must key the shuffle on (key, salt) — visible
    as both columns in the join condition — and still produce the
    plain join's totals (oracle parity covers values; here we pin
    that the salt survives into the physical join keys)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_salted_skew")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    m = re.search(r"(?:SortMergeJoin|ShuffledHashJoin).*?\[([^\]]*salt[^\]]*)\]",
                  plan, re.S)
    assert m is not None, plan


def test_salted_join_planted_skew_spreads_and_matches(spark):
    """Planted skew: one key with 5000 rows among 400 one-row keys.
    The quantile-tail detector must flag exactly that key, the hot
    rows must land on >1 salt, and the salted join must equal the
    plain join. On skew-free data the hot set must be EMPTY (no
    replication) — the property an absolute threshold violates."""
    from open_reaction_database_web_scraper_spark.operators.joins import (
        hot_keys, salted_equi_join)

    fact = spark.range(0, 5400).select(
        F.when(F.col("id") < 5000, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row_id"))
    dim = spark.range(0, 6000).select(
        F.col("id").alias("dk"),
        (F.col("id") % 3).alias("grp"))

    hot = hot_keys(fact, "k").collect()
    assert [r.hot_key for r in hot] == [7]

    salted = salted_equi_join(fact, dim, "k", "dk",
                              salt_cols=["k", "row_id"])
    n_salts_used = (salted.filter(F.col("k") == 7)
                    .select("salt").distinct().count())
    assert n_salts_used > 1

    plain = fact.join(dim, fact.k == dim.dk)
    got = salted.groupBy("grp").count().collect()
    want = plain.groupBy("grp").count().collect()
    assert sorted((r.grp, r["count"]) for r in got) == \
        sorted((r.grp, r["count"]) for r in want)

    uniform = spark.range(0, 400).select(
        F.col("id").alias("k"), F.col("id").alias("row_id"))
    assert hot_keys(uniform, "k").count() == 0


def test_hot_keys_empty_on_tpch(spark):
    """Regression for the round-2 call-site bug (tail_q=0.999 bound
    positionally into skew_factor, marking ~58% of order keys hot):
    TPC-H lineitem has 1-7 items per order — never 16× the median —
    so the hot set must be EMPTY at every SF, and the salted join
    must degenerate to the plain join (every salt == 0, dim side
    never replicated)."""
    from open_reaction_database_web_scraper_spark.operators.joins import (
        hot_keys, salted_equi_join)
    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/lineitem.parquet"
        if not os.path.isdir(path) and not os.path.isfile(path):
            continue
        li = spark.read.parquet(path)
        assert hot_keys(li, "l_orderkey").count() == 0, sf
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    salted = salted_equi_join(li, od, "l_orderkey", "o_orderkey",
                              salt_cols=["l_orderkey", "l_linenumber"])
    assert salted.select("salt").distinct().collect() == [Row(salt=0)]


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Tables bucketed+sorted on the join key must join with ZERO
    Exchange nodes — the bucketing layout SCALING.md prescribes for
    repeated large-large joins. (Data lands in a temp path; only
    table metadata goes through the in-memory catalog.)"""
    import tempfile

    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_quantity"))
    od = (spark.read.parquet(f"{sf_dir}/orders.parquet")
          .select("o_orderkey", "o_orderstatus"))
    d = tempfile.mkdtemp(prefix="ordspark_bucket_")
    for name, df, key in [("li_b", li, "l_orderkey"),
                          ("od_b", od, "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, key).sortBy(key)
         .option("path", f"{d}/{name}").saveAsTable(name))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("od_b").join(
            spark.table("li_b"),
            F.col("o_orderkey") == F.col("l_orderkey")))
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    """The pricing-summary agg must compile into ≥1 whole-stage-codegen
    subtree (AQE's formatted plan hides them pre-execution, so ask the
    codegen explain mode directly)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["agg_multi"].fn(spark, sf_dir)
        code = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", code)
    assert m and int(m.group(1)) >= 1, code.splitlines()[0]


def test_pii_redact_is_shuffle_free(spark, sf_dir):
    """Redaction must stay a pure scan→project pass: no Exchange of
    any kind, no Python eval — the cheapest possible 100 TB sweep."""
    plan = plan_of(spark, sf_dir, "text_pii_redact")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_decontaminate_probes_broadcast(spark, sf_dir):
    """The benchmark gram set must reach the corpus side as a
    broadcast — the corpus' grams must NOT shuffle before the probe
    (no Exchange between the corpus scan and the join)."""
    plan = plan_of(spark, sf_dir, "text_decontaminate_ngram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_subdoc_blocks_shuffles_hashes_not_text(spark, sf_dir):
    """The block aggregates must key on the 8-byte xxhash64, never
    the block string: no 'block' column may appear in any Exchange's
    output schema."""
    plan = plan_of(spark, sf_dir, "dedup_subdoc_blocks")
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "block#" not in m.group(0), m.group(0)


def test_stratified_sample_filters_at_scan_stage(spark, sf_dir):
    """The per-stratum mod filter must evaluate in the scan stage —
    a Filter node on the map side, before the only Exchange (the agg
    exchange) — so the sample is decided without moving any data
    (the design point vs RNG df.sample)."""
    plan = plan_of(spark, sf_dir, "sample_stratified")
    assert re.search(r"Condition : .*pmod\(doc_id", plan)
    # exactly one scan and one exchange (partial→final agg)
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    # the filter node sits below the exchange in the tree (map side)
    tree = plan.split("\n\n")[0]
    assert tree.index("Exchange") < tree.index("Filter")  # deeper = later


def test_clustered_sink_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """The clustered layout's value: every parquet file covers a
    narrow l_shipdate range and files don't overlap, so min/max
    stats skip files for any time-window read."""
    import pyarrow.parquet as pq
    from open_reaction_database_web_scraper_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    out = str(tmp_path / "clustered")
    (li.repartitionByRange(8, "l_shipdate")
     .sortWithinPartitions("l_shipdate")
     .write.mode("overwrite").parquet(out))
    import glob
    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.schema.to_arrow_schema().__len__())}
        # aggregate stats over EVERY row group — a file with several
        # row groups would understate its true max from group 0 alone
        # and overlap could go undetected
        stats = [md.row_group(g).column(idx["l_shipdate"]).statistics
                 for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats),
                       max(s.max for s in stats)))
    ranges.sort()
    assert len(ranges) >= 4  # range partitioner actually split
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # disjoint: skipping works


def test_bitmap_distinct_avoids_expand(spark, sf_dir):
    """agg_bitmap_distinct's whole point: exact distinct WITHOUT the
    Expand (row-multiplying) plan COUNT(DISTINCT) needs — two plain
    hash aggregates whose shuffled payload is bitmaps, and both
    levels partial-aggregated map-side."""
    plan = plan_of(spark, sf_dir, "agg_bitmap_distinct")
    assert "Expand" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_histogram_is_single_aggregate(spark, sf_dir):
    """Equi-width histogram must be scan → project → ONE hash
    aggregate: a single exchange, partial map-side combine, and the
    2-column projection pruned into the parquet scan."""
    plan = plan_of(spark, sf_dir, "num_histogram_fixed")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial" in plan.lower(), plan
    assert "l_extendedprice" in plan.split("ReadSchema")[1][:200], plan


def test_sessionize_reuses_one_sort(spark, sf_dir):
    """Both window passes and the session aggregate share the
    (user_id)-compatible clustering: exactly one exchange and one
    sort in the whole plan — the property that keeps gaps-and-islands
    a single-shuffle algorithm at any scale."""
    plan = plan_of(spark, sf_dir, "win_sessionize_gaps")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan


def test_vocab_topk_never_sorts_full_vocabulary(spark, sf_dir):
    """The top-K must run as TakeOrderedAndProject (per-task heaps),
    never a global Sort of the whole vocabulary aggregate."""
    plan = plan_of(spark, sf_dir, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan


def test_min_max_by_is_plain_hash_agg(spark, sf_dir):
    """max_by/min_by must stay a single partial-aggregated exchange —
    one candidate row per group per partition — with no window or
    join in the plan (the oracle's formulation, which sorts every
    row, is exactly what this operator avoids)."""
    plan = plan_of(spark, sf_dir, "agg_min_max_by")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial" in plan.lower(), plan
    assert "Window" not in plan, plan


def test_fuzzy_levenshtein_joins_on_wildcard_key(spark, sf_dir):
    """Wildcard blocking must resolve to an EQUI join (hash or
    sort-merge) — never BroadcastNestedLoop/cartesian, which is what
    a naive inequality-pair formulation degenerates to."""
    plan = plan_of(spark, sf_dir, "dedup_fuzzy_levenshtein")
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan), plan
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_centroid_agg_is_partial(spark, sf_dir):
    """Per-(label, dim) decimal sums must partial-aggregate map-side
    so the exchange carries |labels|x|dims| rows per task, not the
    exploded corpus."""
    plan = plan_of(spark, sf_dir, "vector_centroid_agg")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "partial" in plan.lower(), plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both bucketed scans must feed the SortMergeJoin directly —
    the ONLY exchange in the plan is the final small group-by; with
    auto-broadcast off this is exactly the plan a 100 TB fact ⋈ fact
    join gets, minus both shuffles."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_bucketed_colocated")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_funnel_three_windows_one_exchange(spark, sf_dir):
    """event_funnel's three chained stage-MIN windows all partition
    on user_id, so Catalyst must stack them on ONE exchange; the only
    other exchange is the final 1-row global aggregate. A third
    exchange would mean the funnel re-shuffles per stage — the shape
    that dies at 100 TB."""
    plan = plan_of(spark, sf_dir, "event_funnel")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "Python" not in plan, plan


def test_retention_reuses_window_partitioning(spark, sf_dir):
    """retention_cohorts: one user_id window exchange + one aggregate
    exchange for the (cohort, offset) distinct rollup — the window's
    partitioning must not be re-shuffled a third time."""
    plan = plan_of(spark, sf_dir, "retention_cohorts")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
    assert "Python" not in plan, plan


def test_bloom_probes_stay_on_the_scan_stage(spark, sf_dir):
    """join_bloom_prefilter's word-image probes must be BROADCAST
    hash joins + bit-test filters sitting on the fact scan stage —
    the fact side must reach the dim join without ever shuffling.
    Only the two word-image aggregates and the final rollup may
    exchange (3 shuffles total); the image itself moves as broadcast
    state, never through the driver."""
    plan = plan_of(spark, sf_dir, "join_bloom_prefilter")
    assert "shiftright" in plan, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3, plan
    assert "Python" not in plan, plan


def test_knn_join_is_blocked_equi_join(spark, sf_dir):
    """vector_knn_join must plan a shuffled equi-join on the block
    key — never a cartesian/nested-loop pair enumeration, and with
    auto-broadcast off (probe side too big to ship at scale) still a
    partitioned join."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "vector_knn_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_sql_text_gets_dataframe_plans(spark, sf_dir):
    """Raw spark.sql() text must land in the same optimized physical
    shapes the DataFrame API gets: every WHERE predicate pushed into
    its parquet scan, and ORDER BY..LIMIT as TakeOrderedAndProject
    (per-task heaps), never a global sort."""
    plan = plan_of(spark, sf_dir, "sql_tpch_q3")
    assert "TakeOrderedAndProject" in plan, plan
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed, pushed
    assert "LessThan(o_orderdate" in pushed, pushed
    assert "GreaterThan(l_shipdate" in pushed, pushed


def test_time_bucket_multi_is_one_expand_one_scan(spark, sf_dir):
    """Three granularities must come from ONE scan + ONE Expand —
    not the oracle's three scans."""
    plan = plan_of(spark, sf_dir, "agg_time_bucket_multi")
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_nullsafe_join_is_hash_not_nested_loop(spark, sf_dir):
    """The null-safe key must hash like a normal equi key (a
    BroadcastHashJoin on the explicitly-hinted constant-domain dim);
    the naive OR-of-IS-NULLs predicate would degrade to
    BroadcastNestedLoop."""
    plan = plan_of(spark, sf_dir, "join_nullsafe_eq")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_keyword_topk_rank_limit_pushed_down(spark, sf_dir):
    """The rank<=3 filter must push into the window machinery as a
    WindowGroupLimit (per-partition top-k heaps BEFORE the doc_id
    exchange — the window-function analog of TakeOrderedAndProject),
    and the whole query must need at most the aggregates' shuffles
    plus one window exchange."""
    plan = plan_of(spark, sf_dir, "text_keyword_topk")
    assert "WindowGroupLimit" in plan, plan
    n_ex = len(re.findall(r"\(\d+\) Exchange hashpartitioning", plan))
    assert n_ex <= 4, plan


def test_resample_windows_share_one_sort(spark, sf_dir):
    """Both direction windows (backward LOCF, forward next-value)
    must evaluate in a single Window operator on one sort — Spark
    merges frames that share partitioning and ordering."""
    plan = plan_of(spark, sf_dir, "ts_resample_interpolate")
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_streak_distinct_precedes_window(spark, sf_dir):
    """The (user, day) distinct must run BEFORE the row_number
    window, so the window input is bounded by user-days: the plan
    shows a HashAggregate below the Window."""
    plan = plan_of(spark, sf_dir, "win_streak_longest")
    w = plan.find("(") and plan
    win_pos = re.search(r"\(\d+\) Window", plan).start()
    agg_pos = [m.start() for m in
               re.finditer(r"\(\d+\) HashAggregate", plan)]
    assert any(p > win_pos for p in agg_pos), plan


def test_rank_windows_partial_group_limit(spark, sf_dir):
    """The top-k rank windows in the miner/knn family must carry
    Spark's inferred Partial WindowGroupLimit BELOW the exchange —
    the per-partition bounded top-k that keeps the window's shuffle
    at k rows per group per map partition instead of the full
    candidate volume (the round-9 verdict's #1; the round-10 probe
    showed the rule already fires, so this pin makes it load-bearing:
    a conf or plan-shape regression that loses the partial limit
    fails here, not at 100x)."""
    for name in ("sample_hard_negative_mine",
                 "sample_hard_negative_mine_ann",
                 "vector_knn_join",
                 "embedding_binarize_hamming"):
        plan = plan_of(spark, sf_dir, name)
        assert "row_number(), 3, Partial" in plan, (name, plan)
        assert "row_number(), 3, Final" in plan, (name, plan)


def test_pair_stage_is_single_dot_fold(spark, sf_dir):
    """The O(pairs) scoring projection must fold ONE dot product per
    pair — vectors are unit-normalized once per side, so no SQRT
    (norm) evaluates inside the pair stage (round-10 lever: the 10x
    decomposition measured per-pair folds at ~91% of the exhaustive
    miner's wall; 3 folds -> 1 took 13.69s -> 8.67s)."""
    for name in ("sample_hard_negative_mine",
                 "sample_hard_negative_mine_ann",
                 "vector_knn_join"):
        plan = plan_of(spark, sf_dir, name)
        pair_segs = [seg for seg in plan.split("\n\n")
                     if "zip_with" in seg]
        assert pair_segs, (name, "no pair projection found")
        for seg in pair_segs:
            assert "SQRT" not in seg, (name, seg)


# ----------------------- structural shuffle pins (round 11, item 4)

# Exact shuffle ROWS each headline query writes at sf0.001 under the
# test session's fixed layout (local[32], shuffle.partitions=8, the
# driver-generated parquet). Rows — unlike wall seconds — are a pure
# function of plan + data + layout, so a silent plan regression (a
# lost broadcast, a dropped partial agg, an un-pruned scan feeding a
# wider exchange) moves these numbers even when the box is noisy.
# Bytes deliberately NOT pinned (shuffle compression is not
# deterministic). Values regenerate with
# open_reaction_database_web_scraper_spark.shuffle_metrics.
HEADLINE_SHUFFLE_ROWS = {
    "agg_multi": 6,             # partial agg: one row per group per side
    "join_shuffle_equi": 5,     # AQE broadcasts at this SF: agg rows only
    "join_multiway_star": 25,
    "win_topk_per_group": 449,
    "join_asof": 622,
    "join_range_theta": 94,
    "agg_cube": 12,
    "sort_order_by": 6000,      # range partitioning carries every row once
    "set_distinct": 6,
    "json_get_extract": 0,      # pure map: NO shuffle is the pin
}


def test_headline_shuffle_rows_pinned(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.shuffle_metrics import (
        measure_shuffle)
    got = {}
    for name in HEADLINE_SHUFFLE_ROWS:
        spark.catalog.clearCache()
        m = measure_shuffle(
            spark,
            lambda: REGISTRY[name].fn(spark, sf_dir)
            .write.format("noop").mode("overwrite").save())
        got[name] = pinned_rows(m, name)
    assert got == HEADLINE_SHUFFLE_ROWS


# Round-11 guard tripwire: the rewritten LSH family's shuffle rows.
# The hot-bucket guard's value is a SHAPE property (one band row per
# distinct signature, linear rep+star CC graph); these exact counts
# move if the collapse, the star linearization, or the banding
# exchange regress. Same layout caveats as HEADLINE_SHUFFLE_ROWS.
DEDUP_SHUFFLE_ROWS = {
    "dedup_minhash_lsh": 8914,
    # 17073 → 17070 in round 14: the CC convergence sum now rides the
    # checkpoint action as an Observation (CollectMetrics, shuffle-free)
    # instead of a per-round agg job whose partial rows hit the wire.
    "dedup_clusters_neardup": 17070,
    "dedup_simhash": 1019,
    "multimodal_phash_dedup": 501,
    "dedup_lsh_occupancy": 4830,
}


def test_dedup_family_shuffle_rows_pinned(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.shuffle_metrics import (
        measure_shuffle)
    got = {}
    for name in DEDUP_SHUFFLE_ROWS:
        spark.catalog.clearCache()
        m = measure_shuffle(
            spark,
            lambda: REGISTRY[name].fn(spark, sf_dir)
            .write.format("noop").mode("overwrite").save())
        got[name] = pinned_rows(m, name)
    assert got == DEDUP_SHUFFLE_ROWS


# Round-12 (verdict r11 #5): the same pins one decade up. A plan
# regression that only manifests past a size threshold (a broadcast
# that flips, an AQE coalesce that stops firing) is invisible to a
# single-SF pin; two decades make the SCALING SHAPE itself the
# assertion — e.g. sort_order_by 6 000 → 60 000 (linear, range
# partitioning carries every row once) while agg_multi/agg_cube/
# set_distinct stay CONSTANT (partial-agg rows are group-count-sized,
# the map-side-combine property that matters at 100 TB).
SHUFFLE_ROWS_SF001 = {
    "agg_multi": 6,
    "join_shuffle_equi": 5,      # AQE still broadcasts at sf0.01
    "join_multiway_star": 25,
    "win_topk_per_group": 4492,
    "join_asof": 5993,
    "join_range_theta": 853,
    "agg_cube": 12,
    "sort_order_by": 60000,
    "set_distinct": 6,
    "json_get_extract": 0,
    "dedup_minhash_lsh": 8912,
    # 17077 → 17074: round-14 Observation convergence check (see
    # DEDUP_SHUFFLE_ROWS note)
    "dedup_clusters_neardup": 17074,
    "dedup_simhash": 1012,
    "multimodal_phash_dedup": 501,
    "dedup_lsh_occupancy": 4829,
}


def test_shuffle_rows_pinned_sf001(spark):
    import os

    import pytest as _pytest
    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        _pytest.skip("sf0.01 testdata not present")
    from open_reaction_database_web_scraper_spark.shuffle_metrics import (
        measure_shuffle)
    got = {}
    for name in SHUFFLE_ROWS_SF001:
        spark.catalog.clearCache()
        m = measure_shuffle(
            spark,
            lambda: REGISTRY[name].fn(spark, sf)
            .write.format("noop").mode("overwrite").save())
        got[name] = pinned_rows(m, name)
    assert got == SHUFFLE_ROWS_SF001


# Round-12: the post-broadcast-threshold plan, pinned DIRECTLY. At
# every driver SF the dimension sides fit under the broadcast
# threshold, so the sf0.001/sf0.01 pins above only ever see the
# broadcast plan (join_shuffle_equi = 5 agg rows). Disabling the
# threshold forces the sort-merge path a 100 TB fact-fact join takes,
# and pins ITS shuffle volume: both join sides exchange once — the
# count is (filtered fact rows + dim rows + agg rows), linear across
# the decade — so a regression that only exists past the broadcast
# cliff (e.g. a lost pre-join filter inflating the exchanged side) is
# caught here at test scale.
NOBROADCAST_SHUFFLE_ROWS = {
    ("/root/testdata/sf0.001", "join_shuffle_equi"): 7505,
    ("/root/testdata/sf0.001", "join_multiway_star"): 1675,
    ("/root/testdata/sf0.01", "join_shuffle_equi"): 75005,
    ("/root/testdata/sf0.01", "join_multiway_star"): 16525,
}


def test_shuffle_rows_pinned_past_broadcast_threshold(spark):
    import os

    from open_reaction_database_web_scraper_spark.shuffle_metrics import (
        measure_shuffle)
    saved = {k: spark.conf.get(k, None) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       "-1")
        got = {}
        for (sf, name) in NOBROADCAST_SHUFFLE_ROWS:
            if not os.path.isdir(sf):
                continue
            spark.catalog.clearCache()
            m = measure_shuffle(
                spark,
                lambda: REGISTRY[name].fn(spark, sf)
                .write.format("noop").mode("overwrite").save())
            got[(sf, name)] = pinned_rows(m, name)
        want = {k: v for k, v in NOBROADCAST_SHUFFLE_ROWS.items()
                if k in got}
        assert got == want and got
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)   # was unset: restore the default
            else:
                spark.conf.set(k, v)


# Round-14 (VERDICT r13 #3): the iterative graph family's unrolled
# plans (3 iterations × the edges subtree) rely on AQE RUNTIME
# exchange reuse — invisible in the compile-time explain
# (isFinalPlan=false), so round 13's "AQE reuses it" was timing-only.
# Two pins make it structural: (a) the executed plan must contain
# ReusedExchange nodes; (b) exact shuffle rows at sf0.001 — measured
# 8 881 / 10 970 / 7 373 WITH reuse vs 44 224 / 189 869 / 28 752 with
# spark.sql.exchange.reuse=false (5×/17×/3.9×), so a silent loss of
# reuse (version bump, config drift) trips the exact pin loudly.
GRAPH_SHUFFLE_ROWS = {
    "graph_pagerank": 8881,
    "graph_triangle_count": 10970,
    "graph_bfs_levels": 7373,
}


def test_graph_family_shuffle_rows_pin_runtime_reuse(spark, sf_dir):
    from open_reaction_database_web_scraper_spark.shuffle_metrics import (
        measure_shuffle)
    got = {}
    for name in GRAPH_SHUFFLE_ROWS:
        spark.catalog.clearCache()
        m = measure_shuffle(
            spark,
            lambda: REGISTRY[name].fn(spark, sf_dir)
            .write.format("noop").mode("overwrite").save())
        got[name] = pinned_rows(m, name)
    assert got == GRAPH_SHUFFLE_ROWS


def test_graph_pagerank_executed_plan_reuses_exchanges(spark, sf_dir):
    """The EXECUTED adaptive plan (the only artifact that can show
    runtime reuse) must be final and contain ReusedExchange nodes —
    the edges subtree materializes once per distinct exchange, not
    once per unrolled iteration. Committed dumps: plans/r14/
    graph_*_final.txt."""
    df = REGISTRY["graph_pagerank"].fn(spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan[:2000]
