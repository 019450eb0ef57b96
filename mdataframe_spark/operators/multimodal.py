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


_TRANSFORM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("modality", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _resize_stub(payload: bytes, factor: int) -> bytes:
    """Deterministic stand-in for an image resize (STUB — no imaging
    libs in this container): keep every ``factor``-th byte. A real
    implementation decodes, resizes (PIL/opencv) and re-encodes; the
    Spark-side contract (binary in, binary out, meta updated) is
    identical."""
    if payload is None:
        return None
    return bytes(payload[::factor])


def _frame_sample_stub(payload: bytes, frame_size: int, every_k: int) -> bytes:
    """Deterministic stand-in for video frame sampling: treat the
    payload as fixed-size frames and keep every ``every_k``-th frame.
    This IS the real byte-plumbing for containerless raw formats; codec
    formats additionally need a demuxer in place of the slicing."""
    if payload is None:
        return None
    frames = [
        payload[i : i + frame_size] for i in range(0, len(payload), frame_size)
    ]
    return b"".join(frames[::every_k])


def resize_media(df: DataFrame, factor: int = 2) -> DataFrame:
    """Arrow-batched payload resize over media rows (mapInPandas —
    executor-parallel, no driver traffic). Meta records the transform
    so downstream stages can audit provenance."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(
                lambda p: _resize_stub(p, factor)
            )
            out["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "resize_factor": str(factor)}
            )
            yield out[["media_id", "payload", "modality", "meta"]]

    return df.select("media_id", "payload", "modality", "meta").mapInPandas(
        run, _TRANSFORM_SCHEMA
    )


def sample_frames(
    df: DataFrame, frame_size: int = 64, every_k: int = 4
) -> DataFrame:
    """Arrow-batched frame sampling over media payloads; same
    binary-in/binary-out contract as resize_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(
                lambda p: _frame_sample_stub(p, frame_size, every_k)
            )
            out["meta"] = pdf["meta"].map(
                lambda m: {
                    **(m or {}),
                    "frame_size": str(frame_size),
                    "frame_stride": str(every_k),
                }
            )
            yield out[["media_id", "payload", "modality", "meta"]]

    return df.select("media_id", "payload", "modality", "meta").mapInPandas(
        run, _TRANSFORM_SCHEMA
    )
