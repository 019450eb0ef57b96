"""Window-based statistical primitives: BH/FDR adjustment and ranking.

The reference obtains both from R — ``FDR`` comes out of edgeR's
``topTags`` / DESeq2's ``padj`` (reference: differential.py:107-117,
149, 255-270) and ``ranking`` out of NOISeq (differential.py:599-600,
727-739). Here they are native Spark window expressions (SURVEY.md §2.5
W1/W2) — the first fully R-free pieces of the stats stack.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Unpartitioned (single-reducer) window thresholds: every row moves
# through one task, so above WARN_ROWS the caller gets a warning and
# above MAX_ROWS a hard error unless they opted in with allow_global.
SINGLE_REDUCER_WARN_ROWS = 1_000_000
SINGLE_REDUCER_MAX_ROWS = 10_000_000


def _guard_unpartitioned(df: DataFrame, what: str, allow_global: bool) -> None:
    """Fail fast when a GLOBAL window is requested over a frame that is
    plausibly too large for one reducer.

    Cheap upper-bound probe: ``limit(max+1).count()`` scans at most
    max+1 rows (no shuffle), so the small stats frames this library
    targets pay one trivial job. Silent below 1M rows, a warning up to
    10M, an error beyond — unless ``allow_global=True`` documents that
    the caller accepts the single-reducer total order."""
    if allow_global:
        return
    probe = df.limit(SINGLE_REDUCER_MAX_ROWS + 1).count()
    if probe > SINGLE_REDUCER_MAX_ROWS:
        raise ValueError(
            f"{what}: unpartitioned window over >{SINGLE_REDUCER_MAX_ROWS:,} rows "
            "serializes the whole frame through one reducer. Pass group_cols= "
            "to partition the computation (one family/contrast per group), or "
            "allow_global=True to accept the single-reducer total order."
        )
    if probe > SINGLE_REDUCER_WARN_ROWS:
        warnings.warn(
            f"{what}: unpartitioned window over {probe:,} rows — a "
            "single-reducer total order; pass group_cols= to partition.",
            stacklevel=3,
        )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "fdr",
    group_cols: Optional[Sequence[str]] = None,
    tiebreak_cols: Sequence[str] = (),
    allow_global: bool = False,
) -> DataFrame:
    """Benjamini-Hochberg adjusted p-values as a window computation.

    BH: sort p ascending, q_i = min_{j>=i}( p_j * n / j ), clipped to 1.
    Expressed as two windows: a row_number to get the rank j, then the
    suffix-minimum — computed as a running min over a DESCENDING order
    with a growing frame (UNBOUNDED PRECEDING → CURRENT ROW), which
    Spark's WindowExec evaluates incrementally in O(n); the equivalent
    shrinking frame (CURRENT → UNBOUNDED FOLLOWING) is re-scanned per
    row, O(n²) — 20k rows took seconds. Ties in p get identical
    adjusted values automatically — the running min in descending order
    reaches the smaller p*n/j tied row first.

    ``group_cols`` partitions the correction (one family per group) and
    is also the scale path: an unpartitioned window is a single-reducer
    total order, fine for the ≤10^7-row stats frames this targets, wrong
    for 100 TB — at that scale, partition by contrast/family. Without
    ``group_cols`` the frame size is probed: >1M rows warns, >10M rows
    raises unless ``allow_global=True``.

    ``tiebreak_cols`` make the ordering total, so the rank window and
    the suffix-min frame agree on tie order — required when the output
    must be reproducible bit-for-bit across engines/runs. BH itself is
    tie-stable (tied p get equal adjusted values) either way.
    """
    parts = list(group_cols or [])
    if not parts:
        _guard_unpartitioned(df, "bh_adjust", allow_global)
    order_asc = [F.col(p_col).asc_nulls_last()] + [F.col(c).asc() for c in tiebreak_cols]
    order_desc = [F.col(p_col).desc_nulls_first()] + [F.col(c).desc() for c in tiebreak_cols]
    w_rank = Window.partitionBy(*parts).orderBy(*order_asc)
    w_n = Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))
    w_runmin = (
        Window.partitionBy(*parts)
        .orderBy(*order_desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.when(F.col(p_col).isNotNull(), 1)).over(w_n)
    rank = F.row_number().over(w_rank)
    raw = F.col(p_col) * n / rank
    return (
        df.withColumn("__bh_raw", raw)
        .withColumn(out_col, F.least(F.min("__bh_raw").over(w_runmin), F.lit(1.0)))
        .drop("__bh_raw")
    )


def add_rank(
    df: DataFrame,
    order_col: str,
    out_col: str = "rank",
    ascending: bool = True,
    group_cols: Optional[Sequence[str]] = None,
    method: str = "rank",
    allow_global: bool = False,
) -> DataFrame:
    """Ranking column (NOISeq-style ``ranking``, W2).

    method: 'rank' (ties share rank, gaps), 'dense_rank', or 'row_number'.
    Without ``group_cols`` the frame size is probed: >1M rows warns,
    >10M raises unless ``allow_global=True`` (see bh_adjust).
    """
    if not group_cols:
        _guard_unpartitioned(df, "add_rank", allow_global)
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*(group_cols or [])).orderBy(order)
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[method]
    return df.withColumn(out_col, fn().over(w))
