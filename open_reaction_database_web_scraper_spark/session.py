"""SparkSession factory tuned for the engine.

Defaults follow SURVEY.md §4: AQE on, Arrow on for pandas UDFs,
shuffle partitions sized for the target data (32 matches the
local[32] harness; on a real cluster this is overridden or left to
AQE coalescing). Session timezone pinned to UTC so timestamp
semantics are deterministic and match the DuckDB oracle's naive
timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: runtime re-plan, skew-join splitting,
    # partition coalescing — the 100 TB story relies on these.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF / applyInPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Shuffle parallelism: one partition per core locally. At
    # cluster scale, AQE coalesces from a deliberately high initial
    # number instead; callers override via SPARK_GRAFT_SHUFFLE.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # Console progress bars write \r-frames to stdout mid-job; any
    # harness that parses a JSON result line from stdout (bench.py,
    # the driver) gets them interleaved with the payload. Nothing in
    # this repo reads them — off everywhere.
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The custom ORD connector (sources/ord_datasource.py) implements
    # pushFilters(); Spark 4.1 refuses to plan such a reader unless
    # Python-source filter pushdown is explicitly enabled.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def get_session(app_name: str = "ord-spark-engine", master: str | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]")
    for k, v in {**DEFAULT_CONFS, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
