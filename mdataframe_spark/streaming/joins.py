"""Stream-stream joins (SURVEY.md §2.10 — engine extension; the
reference is strictly batch).

A watermarked interval join of two event streams: the canonical
"purchases matched to recent clicks" enrichment. Spark requires
watermarks on BOTH sides plus a time-range join condition so the
state store can evict rows the other stream can no longer match —
without those, a stream-stream join buffers both streams forever.
The builder accepts batch frames too (watermarks skipped, same plan),
which is how the batch-parity test checks the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    where ``left_ts <= right_ts <= left_ts + max_delay``.

    State bound: each side keeps only rows younger than
    ``watermark + max_delay`` relative to its event-time high-water
    mark — the interval condition is what lets Spark prove eviction is
    safe. ``left_ts`` and ``right_ts`` must be DIFFERENT column names
    (rename before calling); the key column may collide (it is
    deduplicated in the output).

    100 TB plan: the join is hash-partitioned on ``key`` on both
    sides; per-key state is bounded by event rate x the interval, not
    corpus size. Skewed keys behave like any skewed shuffle join —
    salt the key upstream if one user/session dominates.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ (rename one side first)"
        )
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    out = lw.join(rw, cond, how)
    # drop the duplicate right-side key column
    return out.drop(rw[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a streaming fact
    against a BATCH dimension table — the standard lookup pattern
    (events x user profile, lineitems x part catalog).

    Spark re-evaluates the static side per micro-batch (so a dimension
    refreshed in place is picked up batch-by-batch) and, because the
    static side is batch, no watermark or state store is involved —
    the join is stateless per micro-batch. The dimension is explicitly
    broadcast: at 100 TB the fact stream should never shuffle for a
    lookup-sized build side; a corpus-sized dimension belongs in a
    stream-stream join or a pre-bucketed table instead. Accepts a
    batch frame for ``stream`` too (identical plan), which is how the
    parity test checks semantics.
    """
    return stream.join(F.broadcast(dim), key, how)
