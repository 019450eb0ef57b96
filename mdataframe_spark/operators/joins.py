"""As-of (time-travel) join — a training-data staple Spark lacks as a
built-in (pandas has merge_asof; DuckDB ships ASOF JOIN): match each
left row to the most recent right row at-or-before its timestamp within
the same key (attribution joins, slowly-changing-dimension lookups,
sensor alignment).

Engine extension (the reference has no join surface at all —
SURVEY.md §2.3); expressed Spark-first with NO per-row Python and NO
all-pairs range join:

1. union the two sides with a source tag, the right side carrying its
   payload as one struct column;
2. ONE window per key ordered by (ts, tag, tie-break) — right rows
   sort before left rows at equal timestamps, so "at or before" is
   inclusive — with ``last(payload, ignorenulls=True)`` over the
   growing frame: an O(n log n) sort per key, evaluated incrementally;
3. keep the left rows, unpack the matched struct.

Scale shape: exactly one shuffle on the join key (the union sorts
within partitions); payload width rides the window once — equivalent
work to a co-partitioned sort-merge join, with none of the quadratic
risk of the naive ``right.ts <= left.ts`` range-join formulation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    tolerance=None,
    suffix: str = "_asof",
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row with
    ``right_ts <= left_ts`` on the same key (null columns when no such
    row exists — pandas merge_asof 'backward' semantics).

    ``right_cols`` limits the matched payload (default: every right
    column except the key). ``tolerance`` (a Column or literal in the
    timestamp's own arithmetic, e.g. ``F.expr("INTERVAL 1 HOUR")``)
    nulls matches older than ``left_ts - tolerance``. ``tiebreak_col``
    makes the choice among equal-timestamp right rows total (largest
    wins) — required for hash-reproducible output when (key, ts) is
    not unique on the right.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    right_cols = list(right_cols)
    left_cols = [c for c in left.columns]

    r_payload = F.struct(*[F.col(c) for c in right_cols])
    r_payload_type = right.select(r_payload.alias("p")).schema["p"].dataType
    l_payload = F.struct(*[F.col(c) for c in left_cols])
    l_payload_type = left.select(l_payload.alias("p")).schema["p"].dataType

    tb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.lit(0)
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tb.cast("double").alias("__tb"),
        F.lit(None).cast(l_payload_type).alias("__lp"),
        r_payload.alias("__rp"),
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0.0).alias("__tb"),
        l_payload.alias("__lp"),
        F.lit(None).cast(r_payload_type).alias("__rp"),
    )
    unioned = r_side.unionByName(l_side)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rp", ignorenulls=True).over(w)
    m_ts = F.last(
        F.when(F.col("__tag") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    rows = (
        unioned.withColumn("__m", matched)
        .withColumn("__mts", m_ts)
        .filter(F.col("__tag") == 1)
    )
    if tolerance is not None:
        keep = F.col("__mts") >= F.col("__ts") - tolerance
        rows = rows.withColumn(
            "__m", F.when(keep, F.col("__m"))
        ).withColumn("__mts", F.when(keep, F.col("__mts")))
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"__lp.{c}").alias(c) for c in left_cols if c not in keys]
        + [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    )
    return rows.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    validate: bool = False,
) -> DataFrame:
    """Interval-containment join: each left row matched to every right
    interval with ``start <= point <= end`` on the same key (inner).

    Spark's naive formulation (`join` on the BETWEEN predicate) plans a
    nested-loop/cartesian per key. Here both sides bucket into
    ``bin_width``-sized time bins — intervals EXPLODE into every bin
    they overlap, points map to one bin — and the match is an ordinary
    equi-join on (key, bin) with the exact containment filter on top.
    Candidates are bounded by per-bin co-occupancy, never |L|x|R|.

    Pick ``bin_width`` near the typical interval length: an interval
    spanning B bins costs B replicated rows (``validate=True`` spends
    one aggregation to raise if any interval spans more than 10,000
    bins). Left/right non-key column names must not collide."""
    keys = [on] if isinstance(on, str) else list(on)
    bw = int(bin_width)
    if validate:
        worst = right.agg(
            F.max(
                (F.col(end_col) - F.col(start_col)) / F.lit(bw)
            ).alias("m")
        ).collect()[0]["m"]
        if worst is not None and worst > 10_000:
            raise ValueError(
                f"range_join: an interval spans {worst:.0f} bins at "
                f"bin_width={bw}; raise bin_width (replication factor "
                "= interval length / bin_width)"
            )
    lb = left.withColumn("__bin", F.floor(F.col(point_col) / F.lit(bw)))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bw)),
                F.floor(F.col(end_col) / F.lit(bw)),
            )
        ),
    )
    return (
        lb.join(rb, keys + ["__bin"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bin")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi-join: salt the (large, skewed) left side and
    replicate the right side across the salt domain.

    AQE's skew-join split handles INPUT-partition skew, but when one
    key's rows exceed a single executor's memory on the build side, or
    the skew is in the JOIN OUTPUT, salting is the standard remedy:
    left rows get a random salt in [0, n_salts); right rows are
    replicated n_salts times (one per salt value); the join key becomes
    (key, salt), spreading each hot key over ``n_salts`` reducers.

    Semantics are identical to ``left.join(right, on, how)`` for
    ``inner`` and ``left`` joins (each left row joins exactly its
    replicated partners once). Right/full joins would need de-dup of
    the replicated unmatched rows — explicitly rejected rather than
    silently wrong. Cost: right side shuffles n_salts× its size — use
    when the right side is far smaller than the skewed left (else
    broadcast it and skip salting entirely).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'|'left' — right/full "
            "semantics with a replicated right side would duplicate "
            "unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # F.rand(seed) is plan-stable but PARTITION-order-dependent: which
    # salt a given row draws varies with the input partitioning. That
    # is irrelevant to join RESULTS (every salt matches the same
    # replicated right rows) — the salt only spreads reducer load — so
    # determinism of the output is unaffected; do not rely on specific
    # row-to-salt assignments.
    lf = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = lf.join(rt, keys + ["__salt"], how)
    return out.drop("__salt")
