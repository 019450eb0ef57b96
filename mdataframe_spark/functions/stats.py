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
    scale_safe: bool = False,
    by_correction: bool = False,
) -> DataFrame:
    """Benjamini-Hochberg adjusted p-values as a window computation.

    ``by_correction=True`` applies the Benjamini-Yekutieli harmonic
    factor c(n) = Σ_{i≤n} 1/i (q_i = min_{j≥i} p_j·n·c(n)/j) — the
    FDR control valid under ARBITRARY dependence between the tests
    (plain BH assumes independence/PRDS); c(n) is computed in-plan as
    one more window sum over the ranked frame (the ln(n)+γ-ish factor
    costs power, so it is opt-in). With ``scale_safe=True`` the same
    correction rides the range-partitioned arm: c(n) is a single
    scalar function of n, so the distributed BH decomposition carries
    it as one driver-computed multiplier (round-12; previously
    NotImplementedError — a 100 TB per-document correction under
    dependence had no path).

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

    ``scale_safe=True`` switches to the range-partitioned exact BH
    (:func:`bh_adjust_scale_safe`) — same values, no single-reducer
    window, no row ceiling: the path for per-document p-values on a
    100 TB text corpus. Ignored when ``group_cols`` already partitions
    the computation.
    """
    if scale_safe and not group_cols:
        return bh_adjust_scale_safe(
            df,
            p_col,
            out_col,
            tiebreak_cols=tiebreak_cols,
            by_correction=by_correction,
        )
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
    if by_correction:
        # c(n) = sum over ranked non-null rows of 1/rank — the rank
        # materializes first (window functions cannot nest), then one
        # more window sum over the same (already single-reducer)
        # frame; the harmonic terms differ across engines only in the
        # last ulp, far below the output rounding grid
        staged = df.withColumn("__bh_rank", rank)
        harm = F.sum(
            F.when(
                F.col(p_col).isNotNull(),
                F.lit(1.0) / F.col("__bh_rank"),
            )
        ).over(w_n)
        raw = F.col(p_col) * n / F.col("__bh_rank") * harm
        return (
            staged.withColumn("__bh_raw", raw)
            .withColumn(
                out_col,
                F.least(F.min("__bh_raw").over(w_runmin), F.lit(1.0)),
            )
            .drop("__bh_raw", "__bh_rank")
        )
    raw = F.col(p_col) * n / rank
    return (
        df.withColumn("__bh_raw", raw)
        .withColumn(out_col, F.least(F.min("__bh_raw").over(w_runmin), F.lit(1.0)))
        .drop("__bh_raw")
    )


def _harmonic(n: int) -> float:
    """H_n = Σ_{i≤n} 1/i — ascending-order loop for small n (the
    window arm's running sum usually accumulates in the same ascending
    order, but that order is a WindowExec implementation detail, not a
    contract — the arms agree to accumulation-order ulps, ~1e-12 at
    200k rows, far below the output rounding grid); Euler-Maclaurin
    asymptotic H_n = ln n + γ + 1/(2n) − 1/(12n²) + 1/(120n⁴) beyond
    (remainder O(n⁻⁶) < 1e-30 at the crossover — far below double
    ulp), so a 10¹²-test corpus never loops on the driver."""
    import math

    if n <= 0:
        return 0.0
    if n <= 1_000_000:
        h = 0.0
        for i in range(1, n + 1):
            h += 1.0 / i
        return h
    ninv = 1.0 / n
    return (
        math.log(n)
        + 0.57721566490153286060651209008240243
        + ninv / 2.0
        - ninv * ninv / 12.0
        + ninv ** 4 / 120.0
    )


def bh_adjust_scale_safe(
    df: DataFrame,
    p_col: str,
    out_col: str = "fdr",
    tiebreak_cols: Sequence[str] = (),
    num_buckets: Optional[int] = None,
    by_correction: bool = False,
) -> DataFrame:
    """EXACT Benjamini-Hochberg without a global window — the corpus-
    scale path (e.g. per-document quality p-values over 100 TB), where
    the single-reducer total order of :func:`bh_adjust` is impossible.

    The global sort is replaced by the standard distributed sort-rank
    decomposition:

    1. bucket boundaries from approximate p-quantiles (balanced buckets
       even when p mass concentrates near 0 — one pass);
    2. per-bucket counts in ONE aggregation (also yields n); the B
       cumulative offsets are computed on the driver and broadcast —
       driver traffic is O(B) scalars, never rows;
    3. within each bucket a PARTITIONED window gives local ranks (all
       buckets sort in parallel); offset + local rank = exact global
       rank j, so q' = p·n/j is exact;
    4. the BH suffix-min factorizes: rows only need the running min
       within their bucket (partitioned window, descending) combined
       with the min q' over all HIGHER buckets — per-bucket minima are
       one small aggregation, suffix-minimized on the driver and
       broadcast back.

    Values are identical to ``bh_adjust`` (asserted in
    tests/test_stats.py at 10^6 rows): bucket assignment is monotone in
    p, so tied p-values always share a bucket and the within-bucket
    running min equalizes them exactly as the single window does.
    Cost: three passes over the input (quantiles,
    counts, the ranked transform) — at this scale recomputation beats
    pinning the corpus in memory; persist upstream if the input is an
    expensive subplan. Null p-values get a null ``out_col`` and do not
    count toward n.

    ``by_correction=True`` applies Benjamini-Yekutieli: q' becomes
    p·n·c(n)/j with the harmonic factor c(n) = Σ_{i≤n} 1/i — a single
    SCALAR function of the already-known n, computed on the driver
    (:func:`_harmonic`) and folded into the same decomposition; the
    suffix-min factorization is unchanged because a positive constant
    commutes with min. Values equal the window arm's BY output
    (asserted in tests/test_stats.py) and dominate plain BH row-wise.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(spark.sparkContext.defaultParallelism * 4, 16)

    nn_col = df.filter(F.col(p_col).isNotNull())
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = sorted(set(nn_col.approxQuantile(p_col, probs, 0.001)))

    bkt = F.lit(0)
    for i, c in enumerate(cuts):
        bkt = F.when(F.col(p_col) > F.lit(c), F.lit(i + 1)).otherwise(bkt)
    bkt = F.when(F.col(p_col).isNull(), F.lit(None)).otherwise(bkt)

    with_b = df.withColumn("__bh_bkt", bkt)
    counts = {
        int(r["__bh_bkt"]): int(r["n"])
        for r in with_b.filter(F.col("__bh_bkt").isNotNull())
        .groupBy("__bh_bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(counts.values())
    if n_total == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
    )

    order_asc = [F.col(p_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    order_desc = [F.col(p_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w_rank = Window.partitionBy("__bh_bkt").orderBy(*order_asc)
    w_runmin = (
        Window.partitionBy("__bh_bkt")
        .orderBy(*order_desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grank = off_map[F.col("__bh_bkt")] + F.row_number().over(w_rank)
    # BY multiplies AFTER the division, in the window arm's IEEE
    # operation order ((p·n)/j)·c — correctly-rounded multiplication by
    # a positive constant is monotone, so the suffix-min factorization
    # below commutes with the factor. The two arms then agree up to the
    # c(n) VALUE itself: the window arm accumulates its harmonic sum in
    # whatever order WindowExec evaluates the running frame (an
    # implementation detail), the scale-safe arm uses the driver-side
    # ascending _harmonic loop — they differ only in accumulation-order
    # ulps, far below the 6-dp output rounding grid (what the 200k-row
    # equality test actually asserts: 1e-12 agreement). Plain BH keeps
    # its expression byte-identical (no spurious ×1.0).
    q_expr = F.col(p_col) * F.lit(float(n_total)) / grank
    if by_correction:
        q_expr = q_expr * F.lit(_harmonic(n_total))
    ranked = with_b.withColumn(
        "__bh_q", F.when(F.col("__bh_bkt").isNotNull(), q_expr)
    )

    bucket_mins = {
        int(r["__bh_bkt"]): float(r["m"])
        for r in ranked.filter(F.col("__bh_bkt").isNotNull())
        .groupBy("__bh_bkt")
        .agg(F.min("__bh_q").alias("m"))
        .collect()
    }
    suffix, run = {}, float("inf")
    for b in sorted(bucket_mins, reverse=True):
        suffix[b] = run  # min strictly ABOVE bucket b
        run = min(run, bucket_mins[b])
    sfx_map = F.create_map(
        *[
            x
            for b, v in suffix.items()
            for x in (F.lit(b), F.lit(v if v != float("inf") else 2.0))
        ]
    )
    fdr = F.least(
        F.min("__bh_q").over(w_runmin), sfx_map[F.col("__bh_bkt")], F.lit(1.0)
    )
    return (
        ranked.withColumn(
            out_col, F.when(F.col("__bh_bkt").isNotNull(), fdr)
        )
        .drop("__bh_bkt", "__bh_q")
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


def holm_adjust(
    df: DataFrame,
    p_col: str,
    out_col: str = "p_holm",
    group_cols: Optional[Sequence[str]] = None,
    tiebreak_cols: Sequence[str] = (),
    allow_global: bool = False,
    scale_safe: bool = False,
) -> DataFrame:
    """Holm step-down adjusted p-values — FWER control valid under
    arbitrary dependence with NO independence assumption and uniformly
    more powerful than plain Bonferroni: sort p ascending, adj_i =
    max_{j ≤ i} min(p_j·(n − j + 1), 1). The strict family-wise
    counterpart of :func:`bh_adjust`'s FDR (use Holm when ONE false
    positive is unacceptable; BH when a controlled false-discovery
    RATE is).

    Two windows, mirroring bh_adjust's shape but CHEAPER: the rank
    window plus a running MAX over the SAME ascending order with a
    growing frame (UNBOUNDED PRECEDING → CURRENT ROW — incremental
    O(n); no second descending sort at all, where BH's suffix-min
    needs one). Tied p-values get identical adjusted values (the
    running max reaches the larger multiplier first). ``group_cols``
    partitions the family (and is the scale path); without it the
    single-reducer guard probes the frame size like bh_adjust. NULL p
    rows keep a NULL ``out_col`` and do not count toward n.
    ``scale_safe=True`` switches to the range-partitioned exact Holm
    (:func:`holm_adjust_scale_safe`) — same values, no single-reducer
    window, no row ceiling; ignored when ``group_cols`` already
    partitions the computation.
    """
    if scale_safe and not group_cols:
        return holm_adjust_scale_safe(
            df, p_col, out_col, tiebreak_cols=tiebreak_cols
        )
    parts = list(group_cols or [])
    if not parts:
        _guard_unpartitioned(df, "holm_adjust", allow_global)
    order_asc = [F.col(p_col).asc_nulls_last()] + [
        F.col(c).asc() for c in tiebreak_cols
    ]
    w_rank = Window.partitionBy(*parts).orderBy(*order_asc)
    w_n = Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))
    w_runmax = (
        Window.partitionBy(*parts)
        .orderBy(*order_asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.when(F.col(p_col).isNotNull(), 1)).over(w_n)
    rank = F.row_number().over(w_rank)
    raw = F.when(
        F.col(p_col).isNotNull(),
        F.least(F.col(p_col) * (n - rank + 1), F.lit(1.0)),
    )
    return (
        df.withColumn("__holm_raw", raw)
        .withColumn(
            out_col,
            F.when(
                F.col(p_col).isNotNull(), F.max("__holm_raw").over(w_runmax)
            ),
        )
        .drop("__holm_raw")
    )


def holm_adjust_scale_safe(
    df: DataFrame,
    p_col: str,
    out_col: str = "p_holm",
    tiebreak_cols: Sequence[str] = (),
    num_buckets: Optional[int] = None,
) -> DataFrame:
    """EXACT Holm step-down without a global window — the corpus-scale
    FWER path (per-document p-values over 100 TB), completing the
    bh_adjust_scale_safe / BY family: the step-down running MAX
    factorizes across range buckets exactly like BH's suffix-min,
    just in the PREFIX direction.

    Same four-step decomposition as :func:`bh_adjust_scale_safe`:

    1. bucket boundaries from approximate p-quantiles;
    2. per-bucket counts in ONE aggregation (also yields n); offsets
       on the driver, O(B) scalars;
    3. partitioned windows give local ranks; offset + local rank =
       exact global rank j, raw_j = min(p_j·(n − j + 1), 1) — the
       identical clipped expression the window arm computes;
    4. the running max factorizes: within-bucket prefix max
       (partitioned ascending window) combined with the max raw over
       all LOWER buckets — per-bucket maxima are one small
       aggregation, prefix-maximized on the driver and broadcast back.

    Values are identical to ``holm_adjust`` (asserted in
    tests/test_stats.py): bucket assignment is monotone in p, ties
    share a bucket, and correctly-rounded IEEE ops make the clipped
    raw sequence identical, so the factorized max equals the single
    window's. Null p-values keep a null ``out_col`` and do not count
    toward n.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(spark.sparkContext.defaultParallelism * 4, 16)

    nn_col = df.filter(F.col(p_col).isNotNull())
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = sorted(set(nn_col.approxQuantile(p_col, probs, 0.001)))

    bkt = F.lit(0)
    for i, c in enumerate(cuts):
        bkt = F.when(F.col(p_col) > F.lit(c), F.lit(i + 1)).otherwise(bkt)
    bkt = F.when(F.col(p_col).isNull(), F.lit(None)).otherwise(bkt)

    with_b = df.withColumn("__hm_bkt", bkt)
    counts = {
        int(r["__hm_bkt"]): int(r["n"])
        for r in with_b.filter(F.col("__hm_bkt").isNotNull())
        .groupBy("__hm_bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(counts.values())
    if n_total == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
    )

    order_asc = [F.col(p_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w_rank = Window.partitionBy("__hm_bkt").orderBy(*order_asc)
    w_runmax = (
        Window.partitionBy("__hm_bkt")
        .orderBy(*order_asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grank = off_map[F.col("__hm_bkt")] + F.row_number().over(w_rank)
    ranked = with_b.withColumn(
        "__hm_raw",
        F.when(
            F.col("__hm_bkt").isNotNull(),
            F.least(
                F.col(p_col) * (F.lit(n_total) - grank + 1), F.lit(1.0)
            ),
        ),
    )

    bucket_maxs = {
        int(r["__hm_bkt"]): float(r["m"])
        for r in ranked.filter(F.col("__hm_bkt").isNotNull())
        .groupBy("__hm_bkt")
        .agg(F.max("__hm_raw").alias("m"))
        .collect()
    }
    prefix, run = {}, float("-inf")
    for b in sorted(bucket_maxs):
        prefix[b] = run  # max strictly BELOW bucket b
        run = max(run, bucket_maxs[b])
    pfx_map = F.create_map(
        *[
            x
            for b, v in prefix.items()
            for x in (F.lit(b), F.lit(v if v != float("-inf") else 0.0))
        ]
    )
    adj = F.greatest(
        F.max("__hm_raw").over(w_runmax), pfx_map[F.col("__hm_bkt")]
    )
    return (
        ranked.withColumn(
            out_col, F.when(F.col("__hm_bkt").isNotNull(), adj)
        )
        .drop("__hm_bkt", "__hm_raw")
    )


def storey_qvalue(
    df: DataFrame,
    p_col: str,
    out_col: str = "qvalue",
    pi0_lambda: float = 0.5,
    group_cols: Optional[Sequence[str]] = None,
    tiebreak_cols: Sequence[str] = (),
    allow_global: bool = False,
    scale_safe: bool = False,
) -> DataFrame:
    """Storey q-values: Benjamini-Hochberg rescaled by the estimated
    null proportion pi0 = #{p > lambda} / (n * (1 - lambda)), clipped
    to [1/n, 1] (Storey & Tibshirani 2003, single-lambda estimator) —
    when many tests are truly non-null (a differential-expression
    screen, a per-token association sweep), BH's implicit pi0 = 1 is
    conservative and Storey recovers the lost power. Adds ``out_col``
    plus a constant ``pi0`` column; NULL p-values get NULL q (the
    bh_adjust convention).

    Decomposition: pi0 is ONE count aggregation collapsed to three
    integers (a scalar probe — never a corpus structure), rounded to
    6 dp so both engines carry the identical multiplier; the probe's
    total row count also serves as :func:`bh_adjust`'s single-reducer
    guard (same thresholds, same error), so the guard's separate
    limit-count scan is skipped — one probe, not two. The q-values
    are then exactly ``bh_adjust(...) * pi0``. The factorization is
    legal for the same reason BY's c(n) factor is: multiplication by
    a positive constant is monotone, so it commutes with BH's
    suffix-min — and no clipping ever binds, because the suffix-min
    over j >= i always includes j = n where p_(n)*n/n = p_max <= 1,
    so q <= pi0 * p_max <= 1 unconditionally.

    ``scale_safe=True`` rides :func:`bh_adjust_scale_safe`'s
    range-partitioned arm unchanged (the pi0 probe is
    corpus-size-free either way), so per-document q-values over
    100 TB have the same path BH does; ``group_cols`` partitions the
    correction per family, with pi0 still estimated GLOBALLY (the
    qvalue-package convention — pass pre-filtered frames for
    per-family pi0).
    """
    probe = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(p_col).isNotNull(), 1)).alias("n"),
        F.count(
            F.when(F.col(p_col) > float(pi0_lambda), 1)
        ).alias("n_above"),
    ).collect()[0]
    n, n_above = int(probe["n"] or 0), int(probe["n_above"] or 0)
    n_rows = int(probe["n_rows"] or 0)
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("double")).withColumn(
            "pi0", F.lit(None).cast("double")
        )
    # replicate _guard_unpartitioned from the EXACT count the pi0
    # probe already paid for, then pass allow_global=True below so
    # bh_adjust does not re-probe with a second limit-count scan
    if not group_cols and not scale_safe and not allow_global:
        if n_rows > SINGLE_REDUCER_MAX_ROWS:
            raise ValueError(
                f"storey_qvalue: unpartitioned window over "
                f">{SINGLE_REDUCER_MAX_ROWS:,} rows serializes the whole "
                "frame through one reducer. Pass group_cols= to partition "
                "the computation, scale_safe=True for the range-partitioned "
                "arm, or allow_global=True to accept the single-reducer "
                "total order."
            )
        if n_rows > SINGLE_REDUCER_WARN_ROWS:
            warnings.warn(
                f"storey_qvalue: unpartitioned window over {n_rows:,} rows "
                "— a single-reducer total order; pass group_cols= or "
                "scale_safe=True.",
                stacklevel=2,
            )
    pi0 = n_above / (n * (1.0 - float(pi0_lambda)))
    pi0 = round(min(1.0, max(pi0, 1.0 / n)), 6)
    adjusted = bh_adjust(
        df,
        p_col,
        out_col=out_col,
        group_cols=group_cols,
        tiebreak_cols=tiebreak_cols,
        allow_global=True,
        scale_safe=scale_safe,
    )
    # explicit NULL-in-NULL-out: bh_adjust's suffix-min assigns a NULL
    # p the defensive fdr 1.0 (least() skips the NULL running min);
    # a q-VALUE for a missing p is not meaningful, so gate on p itself
    return adjusted.withColumn(
        out_col,
        F.when(
            F.col(p_col).isNotNull() & F.col(out_col).isNotNull(),
            F.col(out_col) * F.lit(pi0),
        ),
    ).withColumn("pi0", F.lit(pi0))
