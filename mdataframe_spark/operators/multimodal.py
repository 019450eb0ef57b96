"""Multimodal columns: opaque binary payloads + typed metadata.

Engine extension for multimodal training data. The convention: media
lives in a ``binary`` column, typed metadata (modality, codec, shape)
in sibling columns or a struct. Cheap byte-level operations (length,
content hash, magic-byte sniffing) are pure column expressions; the
decode/feature-extract path is Arrow-batched ``mapInPandas`` with a
STUBBED decoder (image/audio libraries are not in this container) —
the Spark-side plumbing (schema, batching, partition shape) is real
and tested; swap `_decode_stub` for a real decoder in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("modality", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media table from a text table (deterministic fake payload
    = utf-8 bytes). Real pipelines read payloads from parquet/object
    storage; the downstream plumbing is identical."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.create_map(F.lit("codec"), F.lit("utf-8")).alias("meta"),
    )


def payload_summary(df: DataFrame, group_col: str = "modality") -> DataFrame:
    """Byte-level stats per modality — pure column expressions."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.count_distinct(F.sha2(F.col("payload"), 256)).alias("distinct_payloads"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_stub(payload: bytes, dim: int = 8) -> list:
    """Deterministic fake feature extraction (STUB — no media libs in
    this container). Produces a stable ``dim``-dim vector from strided
    byte sums so tests are reproducible. Replace with a real decoder
    (PIL/torchaudio/ffmpeg) in production.

    The accumulator is an INTEGER byte sum (exact in float64 up to 2^53),
    so the result is independent of summation order and reproducible
    bit-for-bit by any engine — the final value is a single chain of
    IEEE ops on exact inputs.
    """
    if payload is None:
        return None
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = max(len(payload), 1)
    return [round(a / 255.0 / n * dim, 9) for a in acc]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    mapInPandas: each Arrow batch of (media_id, payload) becomes
    (media_id, n_bytes, feature) — the real distributed decode shape.
    Executor-parallel; batch size bounded by Arrow's maxRecordsPerBatch.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": pdf["payload"].map(lambda p: _decode_stub(p, dim)),
                }
            )

    return df.select("media_id", "payload").mapInPandas(extract, _FEATURE_SCHEMA)
