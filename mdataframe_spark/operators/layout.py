"""Physical-layout optimization: Z-order (Morton) clustering for
multi-column data skipping.

At 100 TB, min/max zone maps (parquet row-group statistics) are what
turn a selective filter into a skipped file. Sorting by ONE column
gives perfect skipping on that column and none on any other; Z-order
interleaves the bits of several columns so every output file covers a
small hyper-rectangle of the key space and filters on ANY of the
interleaved columns prune — the technique behind Delta/Iceberg
OPTIMIZE ZORDER BY, implemented here as pure codegen bit arithmetic +
one range repartition (the sort is per output file, never global).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: Sequence[Column | str], bits: int = 21) -> Column:
    """Morton code of up to three non-negative integer columns: bit b
    of column i lands at position ``b * n_cols + i``; ``bits`` low
    bits are taken per column (21 × 3 = 63 keeps the result in a
    BIGINT). A pure column expression — ``bits * n_cols`` shift/mask
    terms, all whole-stage codegen, zero shuffles; values are clamped
    into range (negative → 0, overflow → mask) so the code is total.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if not 1 <= n <= 3:
        raise ValueError(f"zorder_value interleaves 1-3 columns, got {n}")
    if bits * n > 63:
        raise ValueError(f"bits={bits} x {n} cols exceeds a signed BIGINT")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = F.greatest(F.lit(0), F.least(c.cast("bigint"), F.lit(mask)))
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 21,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range partitions of the Morton
    code — each output file covers a compact hyper-rectangle, so
    min/max zone maps prune on ANY of ``cols``. repartitionByRange
    samples the z distribution (one lightweight pass) and the sort is
    per-partition; there is no global sort barrier.
    """
    return (
        df.withColumn(z_col, zorder_value(list(cols), bits))
        .repartitionByRange(n_files, F.col(z_col))
        .sortWithinPartitions(z_col)
    )


def zonemap_stats(
    df: DataFrame,
    zone: Column | str,
    stat_cols: Sequence[str],
) -> DataFrame:
    """Zone-map (min/max data-skipping) statistics: per zone, the row
    count and min/max of each stat column — exactly what parquet
    row-group footers / Delta-Iceberg file stats hold, computed here
    so a pipeline can AUDIT its layout ("after this write pattern,
    how much would a typical filter actually skip?") before paying
    for a re-cluster. Returns (zone, n_rows, min_<c>, max_<c>...)
    ordered by zone.

    Plan shape: ONE partial-agged groupBy(zone) — min/max/count are
    all monoids, so the corpus collapses map-side; output is
    zone-count rows (files, not rows). Pair with
    :func:`zonemap_pruning` to score a predicate against the map and
    with :func:`zorder_value` to fix the layout it exposes.
    """
    z = F.expr(zone) if isinstance(zone, str) else zone
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(z.alias("zone")).agg(*aggs).orderBy("zone")


def zonemap_pruning(
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Score a BETWEEN predicate against a zone map from
    :func:`zonemap_stats`: a zone is prunable iff its [min, max]
    envelope cannot intersect [lo, hi] — the exact decision a scan
    planner makes from file statistics. Adds a ``prunable`` boolean;
    the caller aggregates the skip fraction (zone-count rows, free).
    NULL envelopes (all-NULL zones) are NOT prunable — a NULL stat
    tells the planner nothing, the conservative read."""
    mn, mx = F.col(f"min_{col}"), F.col(f"max_{col}")
    prunable = F.when(
        mn.isNull() | mx.isNull(), F.lit(False)
    ).otherwise((mx < F.lit(lo)) | (mn > F.lit(hi)))
    return stats.withColumn("prunable", prunable)
