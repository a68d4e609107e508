"""Multimodal columns (SURVEY.md §2.11).

Images / audio / video are carried as opaque ``binary`` columns with
a typed metadata struct — the ORD ``measurements`` pattern
(web_scrpaer_2.py:169-182) generalized to media assets. The
Spark-side plumbing (schema, parquet round-trip, partition-preserving
``mapInPandas`` batch shape) is real; the codec itself is stubbed —
the container has no image/audio libraries — behind
``decode_stub``'s deterministic fake, with ``decode_real`` raising
``NotImplementedError`` as the marked integration point.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

ASSET_SCHEMA = ("asset_id bigint, payload binary, "
                "meta struct<fmt: string, n_bytes: long, source: string>")

FEATURE_SCHEMA = ("asset_id bigint, fmt string, n_bytes long, "
                  "byte_sum long, fake_width int, fake_height int")


def decode_real(payload: bytes, fmt: str):
    """Real media decode — requires codec libraries not present in
    this environment. Plug pillow/torchaudio/pyav here."""
    raise NotImplementedError(
        "media codecs unavailable in this container; "
        "use decode_stub for the deterministic fake")


def decode_stub(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """Deterministic fake decode: (byte_sum, width, height) derived
    purely from the payload bytes, standing in for a real codec so
    the pipeline shape (schema, batching, partitioning) is testable."""
    s = sum(payload) if payload else 0
    return s, (len(payload) % 640) + 1, (s % 480) + 1


def assets_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media-asset table: documents' text bytes as the opaque
    payload + typed metadata struct."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("txt").alias("fmt"),
            F.octet_length(F.encode("text", "utf-8")).cast("long")
            .alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"))


@register("multimodal_columns", oracle=None, tags=("multimodal",))
def multimodal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct: parquet round-trip, then a
    feature-extraction pass via ``mapInPandas`` (Arrow batches, one
    pass per partition — the shape a real image decode would use).
    Returns per-asset extracted features (deterministic fake)."""
    assets = assets_frame(spark, sf_dir)

    # Parquet round-trip: binary + nested struct must survive the sink.
    out = tempfile.mkdtemp(prefix="ordspark_multimodal_")
    assets.write.mode("overwrite").parquet(out)
    back = spark.read.schema(ASSET_SCHEMA).parquet(out)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, m["fmt"])
                     for p, m in zip(pdf["payload"], pdf["meta"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "byte_sum": [f[0] for f in feats],
                "fake_width": pd.array([f[1] for f in feats],
                                       dtype="int32"),
                "fake_height": pd.array([f[2] for f in feats],
                                        dtype="int32"),
            })

    return back.mapInPandas(extract, FEATURE_SCHEMA)
