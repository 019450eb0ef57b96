"""Streaming Count-Min sketch — the streaming twin of
operators/sketches.count_min_cells (SURVEY §2.10 extension; the
reference is strictly batch).

Why this shape survives unbounded streams: the sketch's state is the
depth×width counter table — bounded BY CONSTRUCTION regardless of key
cardinality or stream length, so the aggregation needs no watermark
and never grows. Cells are additive, so the streaming aggregation's
running state after any prefix of micro-batches equals the batch
sketch over the same rows (equality-tested in
tests/test_streaming.py), and a backfilled batch sketch merges with
the live one by summing cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import count_min_positions


def count_min_stream(
    events: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Running Count-Min cells over a stream: (__row, __b, __c).

    Use ``outputMode("complete")`` (the state is the whole
    model-sized sketch) or fold the update stream into a store.
    Identical md5 positions to the batch builder — a probe against
    streamed cells returns the same estimates the batch sketch gives.
    """
    k = F.col(key_col).cast("string")
    pos = count_min_positions(k, depth, width)
    exploded = events.filter(F.col(key_col).isNotNull()).select(
        F.posexplode(F.array(*pos)).alias("__row", "__b")
    )
    return exploded.groupBy("__row", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )
