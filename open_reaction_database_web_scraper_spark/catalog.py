"""Table loading for the driver's synthetic star schema.

``load`` is the single scan entry point every registered query goes
through — it reads parquet (predicate pushdown, column pruning and
partition pruning all come for free from the DataSource V2 scan) and
never caches, so each query's plan is exactly what Catalyst derives
from the expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table from the scale-factor directory.

    ``events.ts`` is a parquet TIMESTAMP(NANOS) column, which Spark's
    vectorized reader rejects (SPARK-40819). We read nanos as long
    via the legacy conf and rebuild a microsecond TIMESTAMP_NTZ —
    flooring ns→µs exactly like DuckDB's client does, so oracle
    comparisons stay bit-identical.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # driver sessions may lack the nanos conf
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set(_NANOS_CONF, "true")
        df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestampadd(MICROSECOND, ts DIV 1000, "
                         "TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """(Re-)bind temp views for ``tables`` at ``sf_dir`` for
    spark.sql queries. Idempotent and metadata-only; scans still
    prune columns and push filters exactly as the DataFrame path
    does."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def fanout(df: DataFrame) -> DataFrame:
    """Spread a small-file scan across cores before heavy narrow work
    (per-row gram/shingle/hash construction).

    A table that arrives as fewer input splits than the session has
    cores serializes its map work — at toy scale every driver table
    is one single-row-group parquet file, so explode/transform
    pipelines would run on 1 of 32 cores. This helper round-robins
    such scans up to ``defaultParallelism``; when the scan already
    has at least that many splits (any real 100 TB layout), it is a
    no-op and no shuffle is added. The trade is explicit: a one-time
    shuffle of the (small) input vs serial execution of every
    downstream narrow stage — the same call AQE makes for shuffles
    but cannot make for inputs (it can't split a row group).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # Partition count from the scan's input files, not df.rdd:
    # the RDD conversion builds (and caches) a full RDD plan per
    # call — measurable py4j/analysis overhead on every scan-side
    # invocation. inputFiles() is metadata-only. A file can hold
    # multiple row groups (undercounting splits), but undercounting
    # only risks a redundant repartition of a small input — and any
    # real multi-row-group layout has ≥ target files anyway.
    try:
        n_splits = len(df.inputFiles())
    except Exception:  # non-file-backed plan (e.g. createDataFrame)
        return df.repartition(target)
    if n_splits >= target:
        return df
    return df.repartition(target)
