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

from pyspark.sql import DataFrame, Window
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


def merge_aggregates(
    stored: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a DELTA batch's partial
    aggregate into a STORED per-key aggregate — the warehouse pattern
    that turns a nightly full recompute into a scan of only the new
    data (at 100 TB the stored aggregate is key-bounded; the full fact
    history is never re-read).

    Both inputs carry ``keys`` + ``count_col`` + ``sum_cols`` (sums and
    counts are the mergeable sufficient statistics; averages derive as
    sum/n downstream — a stored AVERAGE cannot be merged, which is why
    this contract refuses to carry one). ONE full-outer join on the
    keys, null-coalesced adds. Merging the delta's partial aggregate
    is exact (integer/decimal sums are associative), so the result is
    provably identical to re-aggregating the union — the property the
    oracle checks.
    """
    keys = list(keys)
    sum_cols = list(sum_cols)
    s = stored.select(
        *keys,
        F.col(count_col).alias("__sn"),
        *[F.col(c).alias(f"__s_{c}") for c in sum_cols],
    )
    d = delta.select(
        *keys,
        F.col(count_col).alias("__dn"),
        *[F.col(c).alias(f"__d_{c}") for c in sum_cols],
    )
    j = s.join(d, keys, "full_outer")
    zero = F.lit(0)
    out_cols = [
        (F.coalesce(F.col("__sn"), zero) + F.coalesce(F.col("__dn"), zero))
        .cast("bigint")
        .alias(count_col)
    ] + [
        (
            F.coalesce(F.col(f"__s_{c}"), zero)
            + F.coalesce(F.col(f"__d_{c}"), zero)
        ).alias(c)
        for c in sum_cols
    ]
    return j.select(*keys, *out_cols)


def cdc_apply(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Collapse an insert/update/delete change log to its final state:
    per key, the highest-sequence change wins; a final ``delete_op``
    removes the key entirely. Returns the surviving keys with every
    non-key/non-seq payload column at its last value.

    Plan shape: ONE partial-agged groupBy(key) taking the
    lexicographic max of struct(seq…, op, payload…) — no per-key
    window sort, no driver MERGE loop; the shuffle carries one struct
    per input row and combines map-side. The sequence must be total
    per key (compose a tiebreaker into ``seq_cols`` — e.g. the log
    offset); ties would otherwise resolve by payload comparison.
    """
    key_cols = list(key_cols)
    seq_cols = list(seq_cols)
    payload = [
        c
        for c in changes.columns
        if c not in key_cols and c not in seq_cols and c != op_col
    ]
    packed = changes.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                *[F.col(c) for c in seq_cols],
                F.col(op_col).alias("__op"),
                *[F.col(c) for c in payload],
            )
        ).alias("__last")
    )
    # NULL-safe: a winning change with op=NULL (malformed upstream
    # extract) is KEPT, not silently treated as a delete — a key must
    # only vanish on an explicit tombstone
    alive = packed.filter(
        ~F.col("__last.__op").eqNullSafe(F.lit(delete_op))
    )
    return alive.select(
        *key_cols,
        *[F.col(f"__last.{c}").alias(c) for c in seq_cols],
        *[F.col(f"__last.{c}").alias(c) for c in payload],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (present in both, any compare
    column differs NULL-safely) — unchanged keys are dropped. Output:
    key columns, ``change_type``, and ``old_<c>`` / ``new_<c>`` for
    each compare column.

    Plan shape: ONE full-outer equi-join on the key (the scd2_merge
    discipline); the classification is a projection — no window, no
    second pass. At 100 TB both snapshots shuffle once on the key;
    pre-bucketed snapshot tables make it exchange-free.
    """
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    # empty compare_cols is a legitimate key-presence-only diff:
    # everything in both snapshots counts as unchanged (dropped)
    same = reduce(
        lambda x, y: x & y,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def scd2_compact(
    dim: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Compact an SCD2 history: merge runs of CONTIGUOUS versions with
    identical attributes (the artifact batch re-stamping leaves behind:
    a row closed and immediately reopened unchanged) into one row
    spanning the run — [min valid_from, max valid_to], an open version
    (NULL valid_to) keeping the run open.

    Plan shape: one key-partitioned window pass marks run starts (lag
    attribute change NULL-safely OR a gap valid_from ≠ lag(valid_to)),
    a running sum numbers the runs, and one (key, run) groupBy emits
    the spans — no self-join, no driver loop; at 100 TB the window and
    groupBy share the key partitioning, so the whole compaction is one
    shuffle.
    """
    attr_cols = list(attr_cols)
    w = Window.partitionBy(key_col).orderBy(F.col(from_col).asc())
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    gap = ~F.col(from_col).eqNullSafe(F.lag(to_col).over(w))
    is_start = (
        F.when(F.lag(from_col).over(w).isNull(), F.lit(True))
        .otherwise(changed | gap)
        .cast("int")
    )
    runs = dim.withColumn(
        "__run",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy(key_col, "__run", *attr_cols)
        .agg(
            F.min(from_col).alias(from_col),
            # an open version (NULL valid_to) keeps the run open —
            # max() skips NULLs, so count the NULLs explicitly
            F.when(
                F.sum(F.col(to_col).isNull().cast("int")) > 0, F.lit(None)
            )
            .otherwise(F.max(to_col))
            .alias(to_col),
        )
        .drop("__run")
        .select(key_col, *attr_cols, from_col, to_col)
    )
