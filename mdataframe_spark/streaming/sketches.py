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

from ..operators.sketches import count_min_cells


def count_min_stream(
    events: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Running Count-Min cells over a stream: (__row, __b, __c).

    Use ``outputMode("complete")`` (the state is the whole
    model-sized sketch) or fold the update stream into a store.
    DELEGATES to the batch builder — filter/explode/groupBy are all
    streaming-safe, and one implementation is what guarantees the
    streamed and batch sketches can never diverge.
    """
    return count_min_cells(events, key_col, depth=depth, width=width)


def histogram_stream(
    events: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Running histogram cells over a stream: (__bin, __c), ≤ n_bins
    state rows. The bin range is data-independent, so cells are a pure
    sum monoid — running state after any micro-batch prefix equals the
    batch build, and quantile estimates from the live cells carry the
    same certified 2·bin_width bound (operators/sketches.py
    histogram_quantile_gate). DELEGATES to the batch builder (one
    implementation — the count_min_stream convention)."""
    from ..operators.sketches import histogram_cells

    return histogram_cells(events, col, lo, hi, n_bins)
