"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

UDFs are the engine's escape hatch, not its hot path — every query
here has a native-column twin (the oracle), reproducing the
reference's formatter-as-UDF test case (format_reaction_data,
web_scrpaer_2.py:82-192, is fully expressible as native columns).
Pandas UDFs ride Arrow batches; the row-at-a-time Python UDF is kept
deliberately small to demonstrate the API, not to carry data volume.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN o_orderpriority LIKE '1-%' THEN 1
                     WHEN o_orderpriority LIKE '2-%' THEN 2
                     WHEN o_orderpriority LIKE '3-%' THEN 3
                     WHEN o_orderpriority LIKE '4-%' THEN 4
                     ELSE 5 END AS INT) AS priority_code
    FROM orders
    """,
    tags=("udf",),
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-row Python — the reference applies its formatter
    per record (web_scrpaer_2.py:452). The oracle is the native
    CASE WHEN twin, asserting the UDF escape hatch computes exactly
    what the declarative form does."""

    @F.udf("int")
    def priority_code(p: str) -> int:
        head = (p or "").split("-", 1)[0]
        return int(head) if head.isdigit() else 5

    return load(spark, sf_dir, "orders").select(
        "o_orderkey", priority_code("o_orderpriority").alias("priority_code"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, value * 1000.0 AS value_milli
    FROM events
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow UDF: unit rescale (the reference's mole→mmol
    analog). Arrow-batched ×1000 on the pandas side is the same IEEE
    double op as the engine-native multiply, so values are
    bit-identical to the oracle."""

    @F.pandas_udf("double")
    def to_milli(v: pd.Series) -> pd.Series:
        return v * 1000.0

    return load(spark, sf_dir, "events").select(
        "event_id", to_milli("value").alias("value_milli"))


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT event_type, MAX(value) - MIN(value) AS value_range
    FROM events GROUP BY event_type
    """,
    tags=("udf", "pandas", "udaf"),
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group aggregate (grouped-agg pandas UDF). Computes
    max-min spread — an order-insensitive statistic, so the arbitrary
    row order within Arrow batches can't perturb the result."""

    @F.pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    return (load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(value_range("value").alias("value_range")))


@register(
    "udtf_flatten",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
    tags=("udf", "udtf"),
)
def udtf_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row in → many rows out via a Python UDTF — the reference's
    nested component loops (web_scrpaer_2.py:114-158). The oracle is
    the native explode twin; production code should prefer explode
    (JVM-side), which is why the demo is bounded to 100 docs."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            for tok in (text or "").split(" "):
                yield doc_id, tok

    spark.udtf.register("ord_tokenize", Tokenize)
    (load(spark, sf_dir, "documents")
     .filter(F.col("doc_id") < 100).select("doc_id", "text")
     .createOrReplaceTempView("udtf_flatten_docs"))
    return spark.sql(
        "SELECT t.doc_id, t.token "
        "FROM udtf_flatten_docs, LATERAL ord_tokenize(doc_id, text) t")


@register(
    "udf_pandas_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN mx = mn THEN 0.5
                ELSE (value - mn) / (mx - mn) END AS value_scaled
    FROM (SELECT event_id, event_type, value,
                 MIN(value) OVER (PARTITION BY event_type) AS mn,
                 MAX(value) OVER (PARTITION BY event_type) AS mx
          FROM events)
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def udf_pandas_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-MAP ``applyInPandas``: whole-group-in / rows-out — the
    API for per-group transforms that need the full group in memory
    (normalization, model scoring per key). Min-max scaling uses only
    single IEEE ops on exact inputs, so pandas and the SQL window
    twin are bit-identical."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        scaled = (pdf["value"] - mn) / (mx - mn) if mx != mn \
            else pd.Series(0.5, index=pdf.index)
        return pd.DataFrame({"event_id": pdf["event_id"],
                             "event_type": pdf["event_type"],
                             "value_scaled": scaled})

    return (load(spark, sf_dir, "events")
            .select("event_id", "event_type", "value")
            .groupBy("event_type")
            .applyInPandas(scale, "event_id bigint, event_type string, "
                                  "value_scaled double"))
