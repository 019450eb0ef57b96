"""Slowly-changing-dimension (SCD type 2) merge: apply a snapshot of
updates to a versioned dimension table.

The warehouse-side face of the engine: dimension tables carry
(valid_from, valid_to) version ranges; merging a new snapshot must
close changed rows, open their new versions, insert new keys, and
leave everything else untouched — atomically derivable from ONE
full-outer join, no row-at-a-time MERGE loop.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_tracked as _persist_tracked


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    batch_id: int,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Merge an updates snapshot into an SCD2 dimension.

    ``current`` holds (key, attrs, valid_from, valid_to) with
    ``valid_to IS NULL`` marking the open version; ``updates`` holds
    (key, attrs). Semantics per key:

    - attrs unchanged (NULL-safe comparison) -> open row kept as-is;
    - attrs changed -> open row CLOSED (valid_to = batch_id) and a new
      open version inserted (valid_from = batch_id);
    - key only in updates -> new open row inserted;
    - key only in current -> open row kept (absence is not deletion —
      soft-delete snapshots should carry a tombstone attribute);
    - already-closed history rows pass through untouched.

    Plan shape: history splits from open rows with two filters on the
    same scan; ONE full-outer equi-join on the key classifies every
    open/update pair, and the three output classes are projections of
    that joined frame (persisted — three consumers), unioned with the
    history. No window, no driver state; the join shuffles on the key
    like any dimension merge must.
    """
    attr_cols = list(attr_cols)
    history = current.filter(F.col(to_col).isNotNull())
    open_rows = current.filter(F.col(to_col).isNull())
    upd = updates.select(
        F.col(key_col),
        F.lit(True).alias("__u_present"),
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
    )
    opn = open_rows.select(
        F.col(key_col),
        F.lit(True).alias("__o_present"),
        F.col(from_col).alias("__o_from"),
        *[F.col(a).alias(f"__o_{a}") for a in attr_cols],
    )
    j = _persist_tracked(opn.join(upd, key_col, "full_outer"))
    same = reduce(
        lambda x, y: x & y,
        [
            F.col(f"__o_{a}").eqNullSafe(F.col(f"__u_{a}"))
            for a in attr_cols
        ],
    )
    o_present = F.col("__o_present").eqNullSafe(F.lit(True))
    u_present = F.col("__u_present").eqNullSafe(F.lit(True))
    to_type = dict(current.dtypes)[to_col]

    def _o_row(to_val):
        return [F.col(f"__o_{a}").alias(a) for a in attr_cols] + [
            F.col("__o_from").alias(from_col),
            to_val.cast(to_type).alias(to_col),
        ]

    keep_open = j.filter(o_present & (~u_present | same)).select(
        key_col, *_o_row(F.lit(None))
    )
    close_old = j.filter(o_present & u_present & ~same).select(
        key_col, *_o_row(F.lit(batch_id))
    )
    new_versions = j.filter(u_present & (~o_present | ~same)).select(
        key_col,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.lit(batch_id).cast(dict(current.dtypes)[from_col]).alias(from_col),
        F.lit(None).cast(to_type).alias(to_col),
    )
    out_cols = [key_col, *attr_cols, from_col, to_col]
    return (
        history.select(*out_cols)
        .unionByName(keep_open)
        .unionByName(close_old)
        .unionByName(new_versions)
    )
