"""Streaming deduplication — the streaming twin of operators/dedup's
exact path (SURVEY §2.10 extension; the reference is strictly batch).

Two shapes:

- :func:`dedup_stream_exact`: keyed ``dropDuplicates`` over the
  watermark horizon. State is one entry per distinct key seen within
  the watermark — bounded by construction, the standard Structured
  Streaming dedup (Spark expires the key state once the watermark
  passes it via ``dropDuplicatesWithinWatermark``).
- :func:`dedup_stream_content`: content-addressed variant — the key is
  the md5 of the normalized payload column, matching the batch
  operator's exact-dedup hash (operators/dedup.exact_dedup_groups), so
  a backfill and the live stream agree on which records are duplicates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import normalize_text


def dedup_stream_exact(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First occurrence per key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def dedup_stream_content(
    events: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    normalized: bool = True,
) -> DataFrame:
    """First occurrence per content hash (md5 of the normalized text —
    the batch exact-dedup key) within the watermark horizon."""
    payload = (
        normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    )
    keyed = events.withColumn("__content_key", F.md5(payload))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )
