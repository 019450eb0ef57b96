"""Distributed two-sample / independence tests: chi-square,
Mann-Whitney U, Kolmogorov-Smirnov.

The drift-monitoring battery of a production ML pipeline (is this
week's feature distribution the same as last week's? does the label
depend on the source?), and the nonparametric counterparts of the
engine's parametric differential tests (functions/edger.py,
functions/deseq2.py — the reference delegates such testing to R;
these are native distributed plans).

Every statistic here reduces the corpus to a model-sized table in ONE
partial-aggregated pass (contingency cells, distinct-value rank
blocks) and derives the result from exact integer sums, so any SQL
engine replays the arithmetic bit-for-bit.

P-values (``with_p=True``, the default) ride OUTSIDE the hashed
oracle column set: their special functions (igamma/erfc/Kolmogorov Q,
functions/numerics.py) have no cross-engine-exact form, so the
registered oracle queries pass ``with_p=False`` and the p columns are
instead pinned to independent closed-form computations in
tests/test_stats_tests.py (documented tolerance 1e-6 — the p is an
Arrow-batched evaluation over the already-one-row result, rounded to
6 dp). The reference ships p/FDR for its whole differential suite
(reference src/mdataframe/differential.py:26-48); a monitoring battery
without p-values makes every user reimplement them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import persist_tracked as _persist_tracked
from .guards import DEFAULT_MAX_CELLS, DEFAULT_MAX_STEPS, probe_collapsed


def _chi2_p(chi2_col, dof_col):
    """Upper-tail chi-square p = Q(dof/2, chi2/2) as an Arrow-batched
    expression (runs over the single aggregated row)."""

    @F.pandas_udf("double")
    def _p(chi2: pd.Series, dof: pd.Series) -> pd.Series:
        from ..functions.numerics import pgamma

        def one(c, d):
            if c is None or d is None or pd.isna(c) or d <= 0:
                return None
            return round(
                float(pgamma(float(c), shape=float(d) / 2.0, scale=2.0,
                             lower_tail=False)),
                6,
            )

        return pd.Series(
            [one(c, d) for c, d in zip(chi2, dof)], dtype="float64"
        )

    return _p(chi2_col, dof_col)


def _z_p(z_col):
    """Two-sided normal p = 2·Φ(−|z|), Arrow-batched."""

    @F.pandas_udf("double")
    def _p(z: pd.Series) -> pd.Series:
        from ..functions.numerics import pnorm

        def one(v):
            if v is None or pd.isna(v):
                return None
            return round(float(2.0 * pnorm(-abs(float(v)))), 6)

        return pd.Series([one(v) for v in z], dtype="float64")

    return _p(z_col)


def _ks_p(stat_col):
    """Asymptotic KS p = Q_Kolmogorov(λ) at λ = sqrt(n_eff)·D,
    Arrow-batched."""

    @F.pandas_udf("double")
    def _p(lam: pd.Series) -> pd.Series:
        from ..functions.numerics import pkolmogorov

        def one(v):
            if v is None or pd.isna(v):
                return None
            return round(float(pkolmogorov(float(v))[0]), 6)

        return pd.Series([one(v) for v in lam], dtype="float64")

    return _p(stat_col)


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    with_p: bool = True,
) -> DataFrame:
    """Pearson chi-square statistic of independence between two
    categorical columns, with Cramér's V effect size.

    One (a, b) cell count collapses the corpus; row/column margins
    aggregate the cell table (categories-bounded); expected counts are
    computed as (row/N)·col — dividing FIRST keeps every intermediate
    in double range at any corpus size (row·col overflows int64 near
    10^10 rows per margin). Returns ONE row: (n, dof, chi2,
    cramers_v); dof = (R-1)(C-1); V is NULL for a degenerate (single
    row or column) table. Degenerate INPUT (empty, or every row null
    in either column) returns the NULL-guarded row (0, 0, NULL, NULL)
    — the mannwhitney_u / ks_two_sample convention — instead of
    crashing on the scalar probe.
    """
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = base.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__o"))
    rt = cells.groupBy("__a").agg(F.sum("__o").alias("__r"))
    ct = cells.groupBy("__b").agg(F.sum("__o").alias("__c"))
    row = cells.agg(F.sum("__o").alias("__n")).first()
    n = row["__n"] or 0
    if n == 0:
        out = df.sparkSession.range(1).select(
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0).cast("bigint").alias("dof"),
            F.lit(None).cast("double").alias("chi2"),
            F.lit(None).cast("double").alias("cramers_v"),
        )
        if with_p:
            out = out.withColumn("p_value", F.lit(None).cast("double"))
        return out
    joined = cells.join(F.broadcast(rt), "__a").join(F.broadcast(ct), "__b")
    e = (F.col("__r") / F.lit(float(n))) * F.col("__c")
    term = (F.col("__o") - e) * (F.col("__o") - e) / e
    agged = joined.agg(
        F.lit(n).cast("bigint").alias("n"),
        (
            (F.countDistinct("__a") - 1) * (F.countDistinct("__b") - 1)
        ).cast("bigint").alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
        # degenerate (single-row or single-column) tables have no
        # association scale: V is NULL, not an ANSI divide-by-zero
        F.round(
            F.when(
                F.least(
                    F.countDistinct("__a") - 1, F.countDistinct("__b") - 1
                )
                > 0,
                F.sqrt(
                    F.sum(term)
                    / (
                        n
                        * F.least(
                            F.countDistinct("__a") - 1,
                            F.countDistinct("__b") - 1,
                        )
                    )
                ),
            ),
            6,
        ).alias("cramers_v"),
    )
    if with_p:
        agged = agged.withColumn(
            "p_value", _chi2_p(F.col("chi2"), F.col("dof"))
        )
    return agged


def _rank_blocks(
    df: DataFrame,
    value_col: str,
    flag,
    label: str = "rank_blocks",
    max_values: int | None = DEFAULT_MAX_STEPS,
):
    """(value, n, p) distinct-value blocks plus the running pooled
    count — the shared tie-aware rank decomposition of AUC, U and KS:
    one partial-agged groupBy bounds everything downstream by the
    number of DISTINCT values.

    The "quantize continuous values upstream" contract is
    RUNTIME-ENFORCED (round-13, the wasserstein_1d discipline): the
    block table is persisted and a count probe raises
    :class:`~.guards.CollapsedTableTooLarge` past ``max_values``
    (default 100k) instead of silently placing a corpus-sized
    distinct-value table on the ONE ``Window.orderBy`` reducer that
    computes the running counts. ``max_values=None`` disables the
    guard (and the persist-forcing probe — full laziness restored).
    """
    g = df.groupBy(F.col(value_col).cast("double").alias("__v")).agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum(flag.cast("bigint")).alias("__t1"),
    )
    if max_values is not None:
        g = _persist_tracked(g)
        probe_collapsed(g, max_values, label, "value", "max_values")
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    return g.withColumn("__cum", F.sum("__t").over(w)).withColumn(
        "__cum1", F.sum("__t1").over(w)
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
    max_values: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Tie-corrected Mann-Whitney U (Wilcoxon rank-sum): does the
    boolean ``group_col`` split ``value_col`` into stochastically
    different samples? Returns ONE row: (n1, n2, u1, z) — u1 for the
    TRUE group; z is the normal approximation with the standard tie
    correction, NULL when the variance degenerates (all values tied).

    Decomposition: the same distinct-value rank blocks as
    :func:`auc <..operators.evaluation.auc>` — the doubled rank sum
    2·R1 = Σ t1·(2·cum − t + 1) and the tie term Σ(t³−t) are exact
    integer sums, so the statistic replays bit-for-bit in SQL. Like
    AUC, quantize continuous values upstream if the distinct-value
    table must stay model-sized at 100 TB.

    Overflow discipline: the rank-sum terms scale as N², so the
    accumulations run in ``decimal(38,0)`` — exact and
    order-independent to ~10^38 (DuckDB's SUM(BIGINT) promotes to
    HUGEINT the same way), where a bigint accumulator would wrap
    silently near 3·10^9 rows with ANSI off. The n1·n2-scale products
    feeding the double statistics are computed in double (they exceed
    int64 near 10^10 rows per group).

    The quantize-upstream contract is runtime-enforced: the
    distinct-value table raises
    :class:`~.guards.CollapsedTableTooLarge` past ``max_values``
    (default 100k; ``None`` disables) — see :func:`_rank_blocks`.
    """
    flag = F.col(group_col).cast("boolean")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    blocks = _rank_blocks(base, value_col, flag, "mannwhitney_u", max_values)
    dec = "decimal(38,0)"
    acc = blocks.agg(
        F.sum(
            F.col("__t1").cast(dec)
            * (2 * F.col("__cum") - F.col("__t") + 1)
        ).alias("__r2"),
        F.sum("__t1").alias("n1"),
        F.sum(F.col("__t") - F.col("__t1")).alias("n2"),
        F.sum(
            F.col("__t").cast(dec) * F.col("__t") * F.col("__t")
            - F.col("__t")
        ).alias("__ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    # u1 = (2·R1 − n1(n1+1)) / 2 entirely in decimal before the final
    # double division — exact at any n1
    u1 = (F.col("__r2") - n1.cast(dec) * (n1 + 1)) / 2.0
    mu = n1.cast("double") * n2 / 2.0
    # tie-corrected variance: n1·n2/12 · ((n+1) − Σ(t³−t)/(n(n−1)));
    # guarded against n <= 1 (ANSI divide-by-zero) and all-tied input
    # (zero variance).
    var = F.when(
        n > 1,
        n1.cast("double")
        * n2
        / 12.0
        * ((n + 1) - F.col("__ties") / (n.cast("double") * (n - 1))),
    )
    out = acc.select(
        n1,
        n2,
        F.round(u1, 1).alias("u1"),
        F.round(F.when(var > 0, (u1 - mu) / F.sqrt(var)), 6).alias("z"),
    )
    if with_p:
        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
    max_values: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D: the max gap between the two
    empirical CDFs — THE distribution-drift test for continuous
    features. Returns ONE row: (n1, n2, d, ks_stat) with ks_stat =
    sqrt(n1·n2/(n1+n2))·D, the scale-free quantity monitoring systems
    threshold (1.36 ≈ α 0.05).

    Same distinct-value decomposition as :func:`mannwhitney_u`; both
    CDFs are exact integer ratios evaluated at every distinct pooled
    value, so D is engine-exact before the final rounding. The
    quantize-upstream contract is runtime-enforced via ``max_values``
    (default 100k; ``None`` disables) — see :func:`_rank_blocks`; the
    persisted block table also spares the second corpus scan the
    totals aggregation used to pay.
    """
    flag = F.col(group_col).cast("boolean")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    blocks = _rank_blocks(base, value_col, flag, "ks_two_sample", max_values)
    tot = blocks.agg(
        F.sum("__t1").alias("__n1"),
        F.sum(F.col("__t") - F.col("__t1")).alias("__n2"),
    )
    n1, n2 = F.col("__n1"), F.col("__n2")
    # an empty group has no CDF to compare: D is NULL, not an ANSI
    # divide-by-zero
    gap = F.when(
        (n1 > 0) & (n2 > 0),
        F.abs(
            F.col("__cum1") / n1 - (F.col("__cum") - F.col("__cum1")) / n2
        ),
    )
    # the n1·n2 product is computed in DOUBLE on both engines: int64
    # would overflow near 10^10 rows per group
    n1d = F.first("__n1").cast("double")
    out = blocks.crossJoin(F.broadcast(tot)).agg(
        F.first("__n1").alias("n1"),
        F.first("__n2").alias("n2"),
        F.round(F.max(gap), 6).alias("d"),
        F.round(
            F.max(gap)
            * F.sqrt(
                n1d * F.first("__n2") / (n1d + F.first("__n2"))
            ),
            6,
        ).alias("ks_stat"),
    )
    if with_p:
        out = out.withColumn("p_value", _ks_p(F.col("ks_stat")))
    return out


def cvm_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_values: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Two-sample Cramér–von Mises T: the INTEGRAL of the squared gap
    between the two empirical CDFs, T = (n1·n2/N²)·Σ_{i≤N}
    (F1(xᵢ) − F2(xᵢ))² over all N pooled points (Anderson 1962) — the
    whole-distribution companion of :func:`ks_two_sample` in the
    drift battery: KS sees only the single worst gap, CvM weights
    every gap, so slow mid-distribution drift that never produces one
    large gap still registers. Returns ONE row: (n1, n2, n_values,
    cvm); NULL when either group is empty. (No p-value: the CvM null
    distribution has no closed tail form — threshold on the statistic
    against its asymptotic critical values, e.g. 0.461 ≈ α 0.05.)

    Decomposition: the SAME guarded distinct-value rank blocks as KS
    (:func:`_rank_blocks` — ``max_values`` default 100k, ``None``
    disables, quantize upstream per the documented contract); per
    block the gap is the exact integer cross-product cum1·n2 − cum2·n1
    over the common denominator n1·n2, so T accumulates as
    decimal(38,0) Σ t·(cum1·n2 − cum2·n1)² with ONE final double
    division by N²·n1·n2 — bit-for-bit replayable in any engine with
    exact decimal/HUGEINT sums (the spearman_rho convention). The
    decimal(38,0) ceiling holds to ~10⁸ pooled rows (terms scale as
    t·N⁴); past that, quantize harder — the same knob the cap
    enforces anyway.
    """
    flag = F.col(group_col).cast("boolean")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    blocks = _rank_blocks(base, value_col, flag, "cvm_two_sample", max_values)
    tot = blocks.agg(
        F.sum("__t1").alias("__n1"),
        F.sum(F.col("__t") - F.col("__t1")).alias("__n2"),
        F.count(F.lit(1)).alias("__nv"),
    )
    dec = "decimal(38,0)"
    cross = (
        F.col("__cum1").cast(dec) * F.col("__n2")
        - (F.col("__cum") - F.col("__cum1")).cast(dec) * F.col("__n1")
    )
    acc = blocks.crossJoin(F.broadcast(tot)).agg(
        F.first("__n1").alias("n1"),
        F.first("__n2").alias("n2"),
        F.first("__nv").alias("n_values"),
        F.sum(F.col("__t").cast(dec) * cross * cross).alias("__s"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    return acc.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.round(
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("__s").cast("double") / (nd * nd * n1d * n2d),
            ),
            6,
        ).alias("cvm"),
    )


def population_stability_index(
    df: DataFrame,
    value_col: str,
    split_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between the two populations named by
    boolean ``split_col`` (False = baseline, True = current):
    PSI = Σ_bins (p_cur − p_base)·ln(p_cur/p_base) — THE model-ops
    drift score (rule of thumb: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted), complementing KS (max CDF gap) with a
    magnitude-weighted whole-distribution summary.

    Equal-width bins over [lo, hi] (two-scalar probe when omitted, the
    histogram convention; values outside an EXPLICIT [lo, hi] clamp
    into the edge bins — both sides, never a negative bin index); bin
    shares are Lidstone-smoothed with ``alpha`` so empty bins cannot
    produce infinite ratios (the txt_source_kl convention). ONE
    partial-agged (bin, split) groupBy collapses the corpus;
    everything downstream is bins-bounded, from exact integer counts.
    Returns EXACTLY ``n_bins`` rows — bins empty in both splits are
    zero-filled, because their smoothed psi_terms are nonzero and
    belong in the caller's sum (bin, n_base, n_cur, p_base, p_cur,
    psi_term). Shares rounded 9 dp before the ln so both engines
    transform identical constants.
    """
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull() & F.col(split_col).isNotNull())
    if lo is None or hi is None:
        mn, mx = base.agg(F.min(x), F.max(x)).first()
        if mn is None or mx is None:
            raise ValueError(
                f"psi: no non-NULL {value_col!r}/{split_col!r} rows to "
                "probe bin edges from — pass explicit lo/hi or supply "
                "non-empty populations"
            )
        lo = float(mn if lo is None else lo)
        hi = float(mx if hi is None else hi)
    if not hi > lo:
        raise ValueError(f"psi: need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((x - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    observed = base.groupBy(b.alias("bin")).agg(
        F.sum(
            F.when(~F.col(split_col).cast("boolean"), 1).otherwise(0)
        ).alias("n_base"),
        F.sum(
            F.when(F.col(split_col).cast("boolean"), 1).otherwise(0)
        ).alias("n_cur"),
    )
    spectrum = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    cells = (
        spectrum.join(F.broadcast(observed), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = cells.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    a = float(alpha)
    k = float(n_bins)
    pb = F.round(
        (F.col("n_base") + a) / (F.col("__tb") + a * k), 9
    )
    pc = F.round(
        (F.col("n_cur") + a) / (F.col("__tc") + a * k), 9
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin"),
            F.col("n_base").cast("bigint").alias("n_base"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            pb.alias("p_base"),
            pc.alias("p_cur"),
            F.round((pc - pb) * F.log(pc / pb), 9).alias("psi_term"),
        )
    )


def _t_p(t_col, df_col):
    """Two-sided Student-t p = I_{df/(df+t²)}(df/2, 1/2), Arrow-batched
    over the single aggregated row."""

    @F.pandas_udf("double")
    def _p(t: pd.Series, dof: pd.Series) -> pd.Series:
        from ..functions.numerics import betainc

        def one(tv, d):
            if tv is None or d is None or pd.isna(tv) or pd.isna(d) or d <= 0:
                return None
            x = float(d) / (float(d) + float(tv) * float(tv))
            return round(float(betainc(float(d) / 2.0, 0.5, x)), 6)

        return pd.Series([one(tv, d) for tv, d in zip(t, dof)], dtype="float64")

    return _p(t_col, df_col)


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Welch's unequal-variance t-test: does the boolean ``group_col``
    split ``value_col`` into samples with different MEANS? Returns ONE
    row: (n1, n2, mean1, mean2, t, dof) — dof is the
    Welch-Satterthwaite effective degrees of freedom; t/means NULL when
    a group is empty or a variance degenerates.

    Decomposition: one partial-agged pass collects per-group
    (n, Σx, Σx²); the sums are rounded to 4 dp BEFORE the moment
    arithmetic (the cross-engine convention — both engines then
    compute means/variances from identical literals, so the statistic
    replays bit-for-bit in SQL). Complete-case on nulls.

    The p column (``with_p``) uses the exact Student-t CDF via the
    regularized incomplete beta (functions/numerics.py betainc) —
    outside the hashed oracle set, pinned in tests.
    """
    flag = F.col(group_col).cast("boolean")
    v = F.col(value_col).cast("double")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    per = base.groupBy(flag.alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum(v), 4).alias("__s1"),
        F.round(F.sum(v * v), 4).alias("__s2"),
    )
    one = per.agg(
        F.sum(F.when(F.col("__g"), F.col("__n"))).alias("n1"),
        F.sum(F.when(F.col("__g"), F.col("__s1"))).alias("__s1a"),
        F.sum(F.when(F.col("__g"), F.col("__s2"))).alias("__s2a"),
        F.sum(F.when(~F.col("__g"), F.col("__n"))).alias("n2"),
        F.sum(F.when(~F.col("__g"), F.col("__s1"))).alias("__s1b"),
        F.sum(F.when(~F.col("__g"), F.col("__s2"))).alias("__s2b"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    m1 = F.col("__s1a") / n1
    m2 = F.col("__s1b") / n2
    # unbiased variance from the rounded sums; guarded n >= 2
    v1 = F.when(n1 > 1, (F.col("__s2a") - F.col("__s1a") * m1) / (n1 - 1))
    v2 = F.when(n2 > 1, (F.col("__s2b") - F.col("__s1b") * m2) / (n2 - 1))
    se2 = v1 / n1 + v2 / n2
    t = F.when(se2 > 0, (m1 - m2) / F.sqrt(se2))
    dof = F.when(
        (v1 > 0) | (v2 > 0),
        (se2 * se2)
        / (
            F.when(n1 > 1, (v1 / n1) * (v1 / n1) / (n1 - 1)).otherwise(0.0)
            + F.when(n2 > 1, (v2 / n2) * (v2 / n2) / (n2 - 1)).otherwise(0.0)
        ),
    )
    out = one.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round(t, 6).alias("t"),
        F.round(dof, 4).alias("dof"),
    )
    if with_p:
        out = out.withColumn("p_value", _t_p(F.col("t"), F.col("dof")))
    return out


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_values: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Spearman rank correlation with average-rank tie handling.
    Returns ONE row: (n, n_distinct_x, n_distinct_y, rho).

    Decomposition: per axis, ONE partial-agged groupBy builds the
    distinct-value blocks; the doubled average rank of a block is the
    integer 2·cum − t + 1 (the shared tie-aware rank identity of
    auc/mannwhitney_u), joined back to the pairs by value — two equi
    joins, bounded by the distinct-value tables. Pearson on the
    doubled ranks then runs entirely in ``decimal(38,0)`` (exact,
    order-independent; terms scale as N³ so int64 would wrap near
    2·10⁶ rows — decimal38 holds to ~10¹² rows), with ONE final
    cast-to-double division rounded to 6 dp: bit-for-bit replayable
    in any engine with exact decimal/HUGEINT sums.

    Continuous inputs: quantize upstream (like auc's score_decimals)
    if the distinct-value tables must stay model-sized at 100 TB; the
    joins themselves shuffle only (value, rank) pairs. That contract
    is runtime-enforced (round-13): EACH axis's distinct-value table
    is persisted and count-probed, raising
    :class:`~.guards.CollapsedTableTooLarge` past ``max_values``
    (default 100k) instead of silently placing a corpus-sized rank
    table on one ``Window.orderBy`` reducer; ``max_values=None``
    disables (the raw arm scripts/scale_stress.py measures
    deliberately).
    """
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )

    def doubled_ranks(col):
        g = base.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__t")
        )
        if max_values is not None:
            g = _persist_tracked(g)
            probe_collapsed(
                g, max_values, f"spearman_rho[{col[-1]}]", "value", "max_values"
            )
        w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
        return g.withColumn(
            f"__u{col[-1]}",
            (2 * F.sum("__t").over(w) - F.col("__t") + 1).cast("bigint"),
        ).select(F.col("__v").alias(col), F.col(f"__u{col[-1]}"))

    rx = doubled_ranks("__x")
    ry = doubled_ranks("__y")
    paired = base.join(rx, "__x").join(ry, "__y")
    dec = "decimal(38,0)"
    acc = paired.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__ux").cast(dec)).alias("__su"),
        F.sum(F.col("__uy").cast(dec)).alias("__sv"),
        F.sum(F.col("__ux").cast(dec) * F.col("__ux")).alias("__suu"),
        F.sum(F.col("__uy").cast(dec) * F.col("__uy")).alias("__svv"),
        F.sum(F.col("__ux").cast(dec) * F.col("__uy")).alias("__suv"),
    )
    n = F.col("n").cast(dec)
    cov = (n * F.col("__suv") - F.col("__su") * F.col("__sv")).cast("double")
    varu = (n * F.col("__suu") - F.col("__su") * F.col("__su")).cast("double")
    varv = (n * F.col("__svv") - F.col("__sv") * F.col("__sv")).cast("double")
    rho = F.when(
        (varu > 0) & (varv > 0), cov / F.sqrt(varu * varv)
    )
    counts = (
        rx.agg(F.count(F.lit(1)).alias("n_distinct_x"))
        .crossJoin(ry.agg(F.count(F.lit(1)).alias("n_distinct_y")))
    )
    return acc.crossJoin(F.broadcast(counts)).select(
        F.col("n").cast("bigint").alias("n"),
        "n_distinct_x",
        "n_distinct_y",
        F.round(rho, 6).alias("rho"),
    )


def _f_p(f_col, d1_col, d2_col):
    """Upper-tail F p = I_{d2/(d2+d1·F)}(d2/2, d1/2), Arrow-batched
    over the single aggregated row."""

    @F.pandas_udf("double")
    def _p(fv: pd.Series, d1: pd.Series, d2: pd.Series) -> pd.Series:
        from ..functions.numerics import betainc

        def one(f, a, b):
            if any(v is None or pd.isna(v) for v in (f, a, b)) or a <= 0 or b <= 0:
                return None
            x = float(b) / (float(b) + float(a) * float(f))
            return round(float(betainc(float(b) / 2.0, float(a) / 2.0, x)), 6)

        return pd.Series(
            [one(f, a, b) for f, a, b in zip(fv, d1, d2)], dtype="float64"
        )

    return _p(f_col, d1_col, d2_col)


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
) -> DataFrame:
    """One-way ANOVA across the k levels of ``group_col``: do the
    groups share a MEAN? Returns ONE row: (n_groups, n, ss_between,
    ss_within, f_stat, eta_sq) — F NULL when the within-variance
    degenerates (all groups constant) or k < 2; eta² = SSB/SST is the
    effect size.

    Decomposition: one partial-agged pass to per-group (n, Σx, Σx²)
    with the sums rounded 4 dp (the welch_ttest discipline — both
    engines derive the sums of squares from identical literals); the
    second aggregation runs over the k-row group table. The exact
    upper-tail F p-value (regularized incomplete beta) rides outside
    the hashed oracle set.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    per = base.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum(v), 4).alias("__s1"),
        F.round(F.sum(v * v), 4).alias("__s2"),
    )
    # per-group within-SS and the global moments in one tiny agg
    acc = per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__n").alias("n"),
        F.sum("__s1").alias("__t1"),
        F.sum("__s2").alias("__t2"),
        F.sum(
            F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n")
        ).alias("__ssw"),
    )
    n = F.col("n").cast("double")
    sst = F.col("__t2") - F.col("__t1") * F.col("__t1") / n
    ssb = sst - F.col("__ssw")
    k = F.col("n_groups").cast("double")
    fstat = F.when(
        (k > 1) & (n > k) & (F.col("__ssw") > 0),
        (ssb / (k - 1)) / (F.col("__ssw") / (n - k)),
    )
    out = acc.select(
        "n_groups",
        "n",
        F.round(ssb, 4).alias("ss_between"),
        F.round(F.col("__ssw"), 4).alias("ss_within"),
        F.round(fstat, 6).alias("f_stat"),
        F.round(F.when(sst > 0, ssb / sst), 6).alias("eta_sq"),
    )
    if with_p:
        out = out.withColumn(
            "p_value",
            _f_p(
                F.col("f_stat"),
                (F.col("n_groups") - 1).cast("double"),
                (F.col("n") - F.col("n_groups")).cast("double"),
            ),
        )
    return out


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Brown-Forsythe variance-equality test (Levene with the robust
    MEDIAN center): one-way ANOVA on the absolute deviations from each
    group's median. The companion to :func:`anova_oneway` — run it
    first; a significant result says the groups differ in SPREAD, so a
    mean test alone under-describes the drift.

    Decomposition: per-group exact medians in ONE group-bounded
    percentile aggregation (the f13/e_latency interpolation-parity
    convention), rounded 6 dp and broadcast back; the deviation frame
    then feeds the anova_oneway moment pass unchanged. Two corpus
    passes total (median probe + moments), both partial-agged; swap to
    approx_percentile per group at extreme per-group cardinality.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__v"))
    med = base.groupBy("__g").agg(
        F.round(F.expr("percentile(__v, 0.5)"), 6).alias("__med")
    )
    dev = base.join(F.broadcast(med), "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__med")).alias("__dev")
    )
    return anova_oneway(dev, "__dev", "__g", with_p=with_p)


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Tie-corrected Kruskal-Wallis rank test across the k levels of
    ``group_col`` — the nonparametric counterpart of
    :func:`anova_oneway` (do the groups share a DISTRIBUTION, judged
    on ranks?). Returns ONE row: (n_groups, n, h_stat) with
    H = [12/(N(N+1)) · Σ_g (2R_g)²/(4n_g) − 3(N+1)] / C and the
    standard tie correction C = 1 − Σ(t³−t)/(N³−N); H is NULL when
    k < 2 or every value is tied (C = 0).

    Decomposition (the mannwhitney_u doubled-rank convention, extended
    to k groups): ONE partial-agged groupBy(value, group) collapses
    the corpus to distinct (value, group) cells; a groupBy(value) over
    that cell table plus one cumulative window gives the midrank blocks,
    and the doubled per-group rank sum 2·R_g = Σ_v t_vg·(2·cum − t + 1)
    is an exact integer accumulated in decimal(38,0) — every term
    replays bit-for-bit in SQL. Downstream of the first pass,
    everything is bounded by distinct values × groups; quantize
    continuous values upstream to keep that table model-sized at
    100 TB (the documented spearman/auc knob).

    P-value: chi-square upper tail with k−1 dof (with_p=True rides
    outside the hashed oracle set, the module convention).
    """
    vd = F.col(value_col).cast("double")
    # NaN is not a measurement: it would rank as the LARGEST distinct
    # value (Spark's NaN ordering) and shift every rank sum — drop it
    # with NULL (the histogram_quantile_gate convention)
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & F.col(group_col).isNotNull()
    )
    cells = base.groupBy(
        vd.alias("__v"),
        F.col(group_col).alias("__g"),
    ).agg(F.count(F.lit(1)).alias("__tg"))
    totals = cells.groupBy("__v").agg(F.sum("__tg").alias("__t"))
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    blocks = totals.withColumn("__cum", F.sum("__t").over(w))
    dec = "decimal(38,0)"
    # doubled per-group rank sums: every value row in group g at
    # distinct value v contributes the block midrank (2·cum − t + 1)/2
    per_g = (
        cells.join(blocks, "__v")
        .groupBy("__g")
        .agg(
            F.sum("__tg").alias("__ng"),
            F.sum(
                F.col("__tg").cast(dec)
                * (2 * F.col("__cum") - F.col("__t") + 1)
            ).alias("__r2"),
        )
    )
    ties = blocks.agg(
        F.sum(
            F.col("__t").cast(dec) * F.col("__t") * F.col("__t")
            - F.col("__t")
        ).alias("__ties")
    )
    acc = per_g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__ng").alias("n"),
        # Σ_g R_g²/n_g = Σ_g (2R_g)²/(4 n_g); the square leaves
        # decimal range (N² per term, N⁴ squared), so it runs in
        # double AFTER the exact doubled sums — the mannwhitney
        # product convention
        F.sum(
            F.col("__r2").cast("double")
            * F.col("__r2").cast("double")
            / (4.0 * F.col("__ng"))
        ).alias("__sr"),
    ).crossJoin(ties)
    n = F.col("n").cast("double")
    k = F.col("n_groups")
    h_raw = 12.0 / (n * (n + 1)) * F.col("__sr") - 3.0 * (n + 1)
    corr = F.lit(1.0) - F.col("__ties").cast("double") / (n * n * n - n)
    h = F.when((k >= 2) & (n > 1) & (corr > 0), h_raw / corr)
    out = acc.select(
        "n_groups",
        "n",
        F.round(h, 6).alias("h_stat"),
    )
    if with_p:
        out = out.withColumn(
            "p_value",
            F.round(
                _chi2_p(
                    F.col("h_stat"),
                    (F.col("n_groups") - 1).cast("double"),
                ),
                6,
            ),
        )
    return out


def kendall_tau_cells(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_cells: int | None = DEFAULT_MAX_CELLS,
) -> DataFrame:
    """Kendall's τ-b from the contingency-cell collapse: ONE
    partial-agged groupBy(x, y) reduces the corpus to cells (x, y,
    count); concordant/discordant pair masses are then an inequality
    join over the CELL table — C² pair terms where C = distinct(x,y)
    cells, never n² rows. Returns ONE row: (n, n_cells, concordant,
    discordant, tau_b), τ-b with the standard tie normalization
    τ = (P − Q)/√((n₀−n₁)(n₀−n₂)), NULL when either margin is fully
    tied.

    This is the quantized-knob design made FIRST-CLASS instead of
    advisory: τ on raw continuous data is inherently O(n log n)
    sequential (merge-sort inversion counting does not distribute),
    but real 100 TB monitoring compares BUCKETED features, where the
    cell table is model-sized by construction and every downstream
    structure is cells-bounded. P and Q are exact integer sums of
    count products accumulated in decimal(38,0) — bit-for-bit
    SQL-replayable.

    The contract is RUNTIME-ENFORCED (round-12): a count probe on the
    persisted cell table raises :class:`~.guards.CollapsedTableTooLarge`
    past ``max_cells`` (default 10k — ~5·10⁷ pair terms) instead of
    letting a raw-continuous input explode the cells² join silently.
    ``max_cells=None`` disables the guard.
    """
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    # NaN rows drop with NULL (not a measurement; Spark would give NaN
    # a real cell and rank it largest — the quantile-gate convention)
    base = df.filter(
        xd.isNotNull() & ~F.isnan(xd) & yd.isNotNull() & ~F.isnan(yd)
    )
    cells = base.groupBy(
        xd.alias("__x"),
        yd.alias("__y"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    from ..cache import persist_tracked

    cells = persist_tracked(cells)
    probe_collapsed(cells, max_cells, "kendall_tau_cells", "cell", "max_cells")
    dec = "decimal(38,0)"
    l, r = cells.alias("l"), cells.alias("r")
    # strict double inequality = concordant; opposite = discordant.
    # Each unordered cell pair is counted once (l < r lexicographic
    # on x keeps the join one-sided).
    pair = (
        l.join(r, F.col("l.__x") < F.col("r.__x"))
        .select(
            (F.col("l.__c").cast(dec) * F.col("r.__c")).alias("__m"),
            (F.col("r.__y") > F.col("l.__y")).alias("__conc"),
            (F.col("r.__y") < F.col("l.__y")).alias("__disc"),
        )
        .agg(
            F.sum(F.when(F.col("__conc"), F.col("__m")).otherwise(
                F.lit(0).cast(dec))).alias("__p"),
            F.sum(F.when(F.col("__disc"), F.col("__m")).otherwise(
                F.lit(0).cast(dec))).alias("__q"),
        )
    )
    margins = cells.agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    tx = (
        cells.groupBy("__x").agg(F.sum("__c").alias("__t"))
        .agg(
            F.sum(
                F.col("__t").cast(dec) * (F.col("__t") - 1)
            ).alias("__tx2")
        )
    )
    ty = (
        cells.groupBy("__y").agg(F.sum("__c").alias("__t"))
        .agg(
            F.sum(
                F.col("__t").cast(dec) * (F.col("__t") - 1)
            ).alias("__ty2")
        )
    )
    acc = margins.crossJoin(pair).crossJoin(tx).crossJoin(ty)
    n = F.col("__n").cast("double")
    # doubled tie masses: n0·2 = n(n−1), n1·2 = Σ tx(tx−1), etc. —
    # the √ of a product of differences is scale-invariant to the
    # common factor 2, so the doubled forms divide out exactly
    d0 = n * (n - 1)
    den = F.sqrt(
        (d0 - F.col("__tx2").cast("double"))
        * (d0 - F.col("__ty2").cast("double"))
    )
    tau = F.when(
        den > 0,
        2.0
        * (F.col("__p").cast("double") - F.col("__q").cast("double"))
        / den,
    )
    # concordant/discordant accumulate exactly in decimal(38,0) and
    # surface as bigint (pair masses reach int64 only near 4·10^9
    # rows; cast the select below back to the decimals for a corpus
    # beyond that). They coalesce to 0: with a constant x margin the
    # inequality join is EMPTY and the sums aggregate over zero rows —
    # the true pair counts are well-defined zeros, not NULL (tau_b
    # still reports NULL via the degenerate-margin denominator guard).
    zero = F.lit(0).cast("bigint")
    return acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        F.coalesce(F.col("__p").cast("bigint"), zero).alias("concordant"),
        F.coalesce(F.col("__q").cast("bigint"), zero).alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


def drift_value_blocks(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """The W₁ sufficient statistic: per distinct 4-dp-quantized value
    (a scaled integer, the gini convention) the pooled count and the
    TRUE-group count — two SUM monoids keyed by value block, which is
    what makes :func:`~..streaming.segments.drift_stream` a legal
    streaming twin (running state after any micro-batch prefix equals
    this batch collapse over the same rows). Returns (value_block, n,
    n_true); NULL/NaN values and NULL groups drop complete-case.
    ONE partial-agged groupBy — the only corpus-scale structure in
    :func:`wasserstein_1d`, which consumes this collapse."""
    vd = F.col(value_col).cast("double")
    g = F.col(group_col).cast("boolean")
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & F.col(group_col).isNotNull()
    ).select(
        F.round(vd * 10000).cast("bigint").alias("value_block"),
        g.alias("__f"),
    )
    return base.groupBy("value_block").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("__f").cast("bigint")).cast("bigint").alias("n_true"),
    )


def wasserstein_1d(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_blocks: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between the TRUE and
    FALSE groups' empirical distributions of ``value_col`` — the
    integral counterpart of the KS max-gap in the drift battery:
    W₁ = ∫|F₁ − F₂| spots total distribution shift that a mean test
    misses and weights it by HOW FAR mass moved, where KS only sees
    the single worst gap. Returns ONE row: (n1, n2, n_values,
    wasserstein); NULL when either group is empty.

    Decomposition (the gini scaled-integer + rank-block conventions
    combined): values quantize to 4 dp once and live as scaled
    integers; ONE groupBy(value) collapses the corpus to distinct-
    value blocks with per-group counts; the trapezoid-free exact
    identity W₁ = Σᵢ |F₁(vᵢ) − F₂(vᵢ)|·(vᵢ₊₁ − vᵢ) accumulates as
    decimal(38,0) cross-products |cum₁·n₂ − cum₂·n₁|·gap (no float
    CDF is ever formed), divided once by n₁·n₂·10⁴ at the end.
    Everything after the first pass is bounded by distinct values —
    quantize continuous inputs upstream (the documented knob). The
    knob is RUNTIME-ENFORCED (round-12): the block table is persisted
    (it feeds both the cumulative windows and the totals — one corpus
    scan, not two) and a count probe raises
    :class:`~.guards.CollapsedTableTooLarge` past ``max_blocks``
    (default 100k) instead of silently placing a corpus-sized
    distinct-value table on ONE ``Window.orderBy`` reducer.
    ``max_blocks=None`` disables the guard.
    """
    blocks = _persist_tracked(
        drift_value_blocks(df, value_col, group_col).select(
            F.col("value_block").alias("__v"),
            F.col("n").alias("__t"),
            F.col("n_true").alias("__t1"),
        )
    )
    probe_collapsed(blocks, max_blocks, "wasserstein_1d", "block", "max_blocks")
    w = Window.orderBy("__v")
    cum = (
        blocks.withColumn(
            "__cum1",
            F.sum("__t1").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "__cum2",
            F.sum(F.col("__t") - F.col("__t1")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("__next", F.lead("__v").over(w))
    )
    tot = blocks.agg(
        F.sum("__t1").alias("__n1"),
        F.sum(F.col("__t") - F.col("__t1")).alias("__n2"),
        F.count(F.lit(1)).alias("n_values"),
    )
    dec = "decimal(38,0)"
    acc = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("__next").isNotNull())
        .agg(
            F.sum(
                F.abs(
                    F.col("__cum1").cast(dec) * F.col("__n2")
                    - F.col("__cum2").cast(dec) * F.col("__n1")
                )
                * (F.col("__next") - F.col("__v"))
            ).alias("__w")
        )
        .crossJoin(F.broadcast(tot))
    )
    n1d = F.col("__n1").cast("double")
    n2d = F.col("__n2").cast("double")
    # __w aggregates to NULL when zero interval rows survive the lead
    # filter (all mass on one shared distinct value) — the true W₁ is a
    # well-defined 0 there, so coalesce INSIDE the both-groups-present
    # branch; the empty-group case stays NULL.
    return acc.select(
        F.col("__n1").cast("bigint").alias("n1"),
        F.col("__n2").cast("bigint").alias("n2"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.round(
            F.when(
                (F.col("__n1") > 0) & (F.col("__n2") > 0),
                F.coalesce(F.col("__w").cast("double"), F.lit(0.0))
                / (n1d * n2d * 10000.0),
            ),
            6,
        ).alias("wasserstein"),
    )


def mcnemar_test(
    df: DataFrame,
    pre_col: str,
    post_col: str,
    with_p: bool = True,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes — "did the same
    subjects flip?": the within-subject counterpart of the
    two-proportion z-test (which assumes independent arms and is
    anti-conservative on before/after data because it ignores the
    pairing). Only the discordant cells carry signal: b = pre-only,
    c = post-only; chi² = (|b − c| − 1)²/(b + c) with the standard
    continuity correction, 1 dof. Returns ONE row: (n, both, neither,
    pre_only, post_only, chi2); chi2 NULL when b + c = 0 (no
    discordance — nothing to test). Complete-case on the boolean CAST
    results (the two_proportion_ztest convention — an unparseable
    flag drops the row, never deflates a cell).

    ONE aggregation over the corpus: four integer cell sums;
    everything downstream is scalar arithmetic, rounded 6 dp.
    """
    a = F.col(pre_col).try_cast("boolean")
    b = F.col(post_col).try_cast("boolean")
    base = df.filter(a.isNotNull() & b.isNotNull())
    acc = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((a & b).cast("int")).cast("bigint").alias("both"),
        F.sum((~a & ~b).cast("int")).cast("bigint").alias("neither"),
        F.sum((a & ~b).cast("int")).cast("bigint").alias("pre_only"),
        F.sum((~a & b).cast("int")).cast("bigint").alias("post_only"),
    )
    bb = F.col("pre_only").cast("double")
    cc = F.col("post_only").cast("double")
    chi2 = F.when(
        (F.col("pre_only") + F.col("post_only")) > 0,
        (F.abs(bb - cc) - 1.0)
        * (F.abs(bb - cc) - 1.0)
        / (bb + cc),
    )
    out = acc.select(
        "n", "both", "neither", "pre_only", "post_only",
        F.round(chi2, 6).alias("chi2"),
    )
    if with_p:
        out = out.withColumn(
            "p_value", F.round(_chi2_p(F.col("chi2"), F.lit(1.0)), 6)
        )
    return out


def dispersion_nb_fit(
    df: DataFrame,
    count_col: str,
) -> DataFrame:
    """Overdispersion audit + negative-binomial method-of-moments fit
    for a count column — the "is Poisson a lie?" probe every
    count-model (and every per-user activity distribution) needs
    first: the Fano factor var/mean is 1 under Poisson; when it
    exceeds 1 the NB moment fit gives the heterogeneity scale
    (q = mean/var, r = mean²/(var − mean); var = mean + mean²/r).
    Returns ONE row: (n, mean, variance, fano, overdispersed, nb_r,
    nb_q); the NB parameters are NULL when variance ≤ mean (under- or
    equi-dispersed — the fit is undefined, not zero). Complete-case
    on NULL counts; negative counts raise nothing here — validate
    upstream.

    ONE aggregation: n, Σk, Σk² as exact integers (decimal(38,0) for
    the square sum); mean/variance/Fano are scalar doubles over those
    sums, rounded 6 dp — any SQL engine replays them bit-for-bit.

    NaN counts drop complete-case like NULLs (round-11 advice item:
    a plain non-ANSI bigint cast turns NaN into 0, silently deflating
    the moments — the double image is NaN-filtered BEFORE the cast).
    Fractional counts still truncate on the bigint grid, documented:
    counts are integers by contract.
    """
    kd = F.col(count_col).cast("double")
    k = F.col(count_col).cast("bigint")
    base = df.filter(kd.isNotNull() & ~F.isnan(kd))
    acc = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("decimal(38,0)").alias("__sk"),
        # decimal(18,0)² -> precision 37: exact, no 38-cap reduction
        F.sum(k.cast("decimal(18,0)") * k.cast("decimal(18,0)")).alias("__skk"),
    )
    n = F.col("n").cast("double")
    sk = F.col("__sk").cast("double")
    m = sk / n
    v = F.when(
        F.col("n") > 1,
        (F.col("__skk").cast("double") - sk * m) / (n - 1.0),
    )
    fano = F.when(m > 0, v / m)
    over = v > m
    return acc.select(
        "n",
        F.round(F.when(F.col("n") > 0, m), 6).alias("mean"),
        F.round(v, 6).alias("variance"),
        F.round(fano, 6).alias("fano"),
        over.alias("overdispersed"),
        F.round(F.when(over, m * m / (v - m)), 6).alias("nb_r"),
        F.round(F.when(over, m / v), 6).alias("nb_q"),
    )


def cochran_q(
    df: DataFrame,
    block_col: str,
    condition_col: str,
    outcome_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Cochran's Q test — "do the k conditions share one success rate
    across matched blocks?": the k-condition generalization of McNemar
    (k = 2 reduces to it) for PAIRED binary outcomes, e.g. "does the
    same user convert on surface A, B and C at the same rate?".
    Q = (k−1)·(k·ΣC_j² − N²) / (k·ΣR_i − ΣR_i²) with C_j the
    per-condition success totals, R_i the per-block success totals,
    N = ΣC_j; chi²-distributed with k−1 dof. Returns ONE row:
    (n_blocks, k, n_successes, q, dof); Q NULL when the denominator
    degenerates (every block all-0 or all-k — no discordance).
    Blocks NOT observed under every condition raise (Cochran requires
    complete blocks; silently dropping or zero-filling them changes
    the hypothesis — build the complete grid upstream).

    Plan shape: one (block, condition) collapse is the caller's job
    (the input is long-format one row per block×condition); here ONE
    per-block sum + ONE scalar aggregation, all exact integers.
    """
    b = F.col(block_col)
    c = F.col(condition_col)
    o = F.col(outcome_col).cast("boolean").cast("int")
    base = df.filter(b.isNotNull() & c.isNotNull() & o.isNotNull())
    k_count = base.select(c).distinct().count()
    if k_count < 2:
        raise ValueError("cochran_q: need at least 2 conditions")
    incomplete = (
        base.groupBy(b.alias("__b"))
        .agg(
            F.count_distinct(c).alias("__kc"),
            F.count(F.lit(1)).alias("__ct"),
        )
        # a duplicated (block, condition) row would pass a
        # distinct-only check while double-counting the block total
        .filter((F.col("__kc") != k_count) | (F.col("__ct") != k_count))
        .count()
    )
    if incomplete:
        raise ValueError(
            f"cochran_q: {incomplete} block(s) without exactly one "
            f"outcome per condition (all {k_count} required) — Cochran "
            f"requires complete blocks; build the full grid upstream"
        )
    rows = base.groupBy(b.alias("__b")).agg(F.sum(o).alias("__r"))
    row_acc = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("__r").cast("bigint").alias("__sr"),
        F.sum(F.col("__r") * F.col("__r")).cast("bigint").alias("__srr"),
    )
    cols = base.groupBy(c.alias("__c")).agg(F.sum(o).alias("__cj"))
    col_acc = cols.agg(
        # (18,0) x (18,0) -> precision 37: exact in Spark AND DuckDB
        F.sum(
            F.col("__cj").cast("decimal(18,0)")
            * F.col("__cj").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("__scc"),
    )
    j = row_acc.crossJoin(F.broadcast(col_acc))
    kk = F.lit(k_count).cast("double")
    n_tot = F.col("__sr").cast("double")
    num = (kk - 1.0) * (
        kk * F.col("__scc").cast("double") - n_tot * n_tot
    )
    den = kk * n_tot - F.col("__srr").cast("double")
    q = F.when(den > 0, num / den)
    out = j.select(
        "n_blocks",
        F.lit(k_count).cast("bigint").alias("k"),
        F.col("__sr").alias("n_successes"),
        F.round(q, 6).alias("q"),
        F.lit(k_count - 1).cast("bigint").alias("dof"),
    )
    if with_p:
        out = out.withColumn(
            "p_value",
            F.round(_chi2_p(F.col("q"), F.lit(float(k_count - 1))), 6),
        )
    return out


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Friedman test — "do the k treatments share one distribution
    across matched blocks?": the nonparametric repeated-measures
    ANOVA (rank within each block, compare rank sums across
    treatments), with the standard tie correction
    C = 1 − Σ(t³−t) / (n·(k³−k)). Returns ONE row: (n_blocks, k,
    chi2, dof); chi2 NULL when ties degenerate C to 0 (every block
    constant). Incomplete blocks raise (same contract as
    :func:`cochran_q`).

    Decomposition (the mannwhitney doubled-rank convention, per
    block): the within-block midranks live as DOUBLED ranks — exact
    integers under ties — via one (block, value) tie-block collapse
    and a per-block cumulative window; rank sums and the tie term are
    exact integer aggregations, so the statistic replays bit-for-bit.
    The windows partition BY BLOCK (model-bounded per block, corpus
    distributed across blocks) — never a single global sort.
    """
    b = F.col(block_col)
    t = F.col(treatment_col)
    v = F.col(value_col).cast("double")
    base = df.filter(
        b.isNotNull() & t.isNotNull() & v.isNotNull() & ~F.isnan(v)
    ).select(b.alias("__b"), t.alias("__t"), v.alias("__v"))
    k_count = base.select("__t").distinct().count()
    if k_count < 2:
        raise ValueError("friedman_test: need at least 2 treatments")
    incomplete = (
        base.groupBy("__b")
        .agg(F.count_distinct("__t").alias("__kc"), F.count(F.lit(1)).alias("__ct"))
        .filter((F.col("__kc") != k_count) | (F.col("__ct") != k_count))
        .count()
    )
    if incomplete:
        raise ValueError(
            f"friedman_test: {incomplete} block(s) without exactly one "
            f"value per treatment — build the complete grid upstream"
        )
    # doubled midrank of value v within its block: 2·(#less) + (#tied
    # at v) + 1 — exact integers under ties (the mannwhitney
    # convention), from one (block, value) tie collapse
    blocks = base.groupBy("__b", "__v").agg(
        F.count(F.lit(1)).alias("__tie")
    )
    wb = Window.partitionBy("__b").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = blocks.withColumn("__cum", F.sum("__tie").over(wb)).select(
        "__b",
        "__v",
        "__tie",
        (
            2 * (F.col("__cum") - F.col("__tie")) + F.col("__tie") + 1
        ).alias("__dr"),
    )
    scored = base.join(ranked, ["__b", "__v"])
    per_treatment = scored.groupBy("__t").agg(
        F.sum("__dr").cast("bigint").alias("__sdr")
    )
    acc = per_treatment.agg(
        F.sum(
            F.col("__sdr").cast("decimal(18,0)")
            * F.col("__sdr").cast("decimal(18,0)")
        ).cast("decimal(38,0)").alias("__sdrr"),
    )
    ties = blocks.agg(
        F.count_distinct("__b").cast("bigint").alias("__n"),
        # tie <= k (tiny): bigint cubes are exact, no decimal dance
        F.sum(
            F.col("__tie") * F.col("__tie") * F.col("__tie")
            - F.col("__tie")
        ).cast("decimal(38,0)").alias("__t3t"),
    )
    j = acc.crossJoin(F.broadcast(ties))
    n = F.col("__n").cast("double")
    kk = float(k_count)
    # Σ R_j² from doubled rank sums: R_j = DR_j/2 → Σ R_j² = ΣDR_j²/4
    srr = F.col("__sdrr").cast("double") / 4.0
    fr = (
        12.0 / (n * kk * (kk + 1.0)) * srr - 3.0 * n * (kk + 1.0)
    )
    corr = 1.0 - F.col("__t3t").cast("double") / (
        n * (kk * kk * kk - kk)
    )
    chi2 = F.when(corr > 0, fr / corr)
    out = j.select(
        F.col("__n").alias("n_blocks"),
        F.lit(k_count).cast("bigint").alias("k"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(k_count - 1).cast("bigint").alias("dof"),
    )
    if with_p:
        out = out.withColumn(
            "p_value",
            F.round(_chi2_p(F.col("chi2"), F.lit(kk - 1.0)), 6),
        )
    return out


def runs_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a sequence around
    its median: too FEW runs of above/below-median values means the
    series is trending or sticky (autocorrelated residuals, regime
    drift); too MANY means oscillation. Values EQUAL to the median
    drop (the standard convention — they belong to neither side).
    Returns ONE row: (n_above, n_below, n_runs, z) with the normal
    approximation z = (R − μ)/σ, μ = 2·n1·n2/(n1+n2) + 1; z NULL when
    either side is empty.

    Decomposition: ONE exact-percentile median probe (rounded to the
    6-dp literal grid — the theil_sen convention), one ordered lag
    window over the model-bounded sequence counting sign changes as
    exact integers, one scalar projection.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        F.col(order_col).alias("__o"), v.alias("__v")
    )
    med = base.agg(
        F.round(F.expr("percentile(__v, 0.5)"), 6).alias("__med")
    )
    signed = (
        base.crossJoin(F.broadcast(med))
        .filter(F.col("__v") != F.col("__med"))
        .select("__o", (F.col("__v") > F.col("__med")).alias("__up"))
    )
    wo = Window.orderBy("__o")
    runs = signed.withColumn(
        "__new_run",
        F.when(
            F.lag("__up").over(wo).isNull()
            | (F.lag("__up").over(wo) != F.col("__up")),
            1,
        ).otherwise(0),
    )
    acc = runs.agg(
        F.sum(F.col("__up").cast("int")).cast("bigint").alias("n_above"),
        F.sum((~F.col("__up")).cast("int")).cast("bigint").alias("n_below"),
        F.sum("__new_run").cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    r = F.col("n_runs").cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = F.when(
        (F.col("n_above") > 0) & (F.col("n_below") > 0) & (var > 0),
        (r - mu) / F.sqrt(var),
    )
    out = acc.select(
        "n_above", "n_below", "n_runs", F.round(z, 6).alias("z")
    )
    if with_p:
        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def cochran_armitage_trend(
    df: DataFrame,
    score_col: str,
    success_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Cochran-Armitage trend test — "does the success rate move
    MONOTONICALLY with the ordered dose/exposure score?": the
    dose-response read-out a plain chi-square independence test wastes
    power on (it ignores the ordering). Z = Σs_i·(x_i − n_i·p̄) /
    √(p̄(1−p̄)·(Σs_i²n_i − (Σs_i n_i)²/N)) over score groups with
    integer scores s_i, sizes n_i, successes x_i. Returns ONE row:
    (n, n_groups, n_successes, z); z NULL when p̄ or the score spread
    degenerates. Complete-case on the boolean CAST result (the
    two_proportion convention).

    ONE (score) collapse bounds everything downstream by the number
    of distinct scores; every sum is an exact integer (decimal
    products for s²n), one scalar projection at the end.
    """
    s = F.col(score_col).cast("bigint")
    x = F.col(success_col).try_cast("boolean").cast("int")
    base = df.filter(s.isNotNull() & x.isNotNull())
    g = base.groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).cast("bigint").alias("__x"),
    )
    dec = "decimal(18,0)"
    acc = g.agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("__x").cast("bigint").alias("n_successes"),
        # (18,0) x (18,0) products: precision <= 37, exact in Spark
        # AND DuckDB (a 19+20 width errors on the DuckDB side)
        F.sum(
            F.col("__s").cast(dec) * F.col("__x").cast(dec)
        ).cast("decimal(38,0)").alias("__sx"),
        F.sum(
            F.col("__s").cast(dec) * F.col("__n").cast(dec)
        ).cast("decimal(38,0)").alias("__sn"),
        F.sum(
            (F.col("__s") * F.col("__s")).cast(dec)
            * F.col("__n").cast(dec)
        ).cast("decimal(38,0)").alias("__ssn"),
    )
    nd = F.col("n").cast("double")
    pbar = F.col("n_successes").cast("double") / nd
    num = F.col("__sx").cast("double") - pbar * F.col("__sn").cast("double")
    spread = F.col("__ssn").cast("double") - (
        F.col("__sn").cast("double") * (F.col("__sn").cast("double") / nd)
    )
    var = pbar * (1.0 - pbar) * spread
    z = F.when((pbar > 0) & (pbar < 1) & (spread > 0), num / F.sqrt(var))
    out = acc.select(
        "n", "n_groups", "n_successes", F.round(z, 6).alias("z")
    )
    if with_p:
        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    score_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test — "does
    ``value_col`` shift monotonically UP across the ordered groups?":
    the continuous-response companion of the Cochran-Armitage trend
    test (which handles proportions) and the ordered upgrade of
    Kruskal-Wallis (which wastes power ignoring the group order).
    JT = Σ_{i<j} U_ij over group pairs in score order, with the
    standard ½ tie credit; z uses the tie-corrected null variance
    (Hollander & Wolfe — verified against a Monte-Carlo permutation
    null in tests). Returns ONE row: (n, n_groups, n_values,
    jt2 — the DOUBLED statistic, an exact integer — e2_jt, z); z NULL
    when the variance degenerates.

    Decomposition: ONE (score, value) cell collapse bounds everything
    downstream by k × distinct values; the cross-group "less-than"
    mass accumulates on the DENSE (value × group) grid via two
    cumulative windows (strictly-lower groups within value, then
    strictly-lower values within group — the dense zero-filled grid is
    what makes the value prefix complete), all exact integers;
    variance moments are decimal products ≤ precision 38. Quantize
    continuous values upstream to bound the grid (the documented
    spearman/wasserstein knob).
    """
    v = F.col(value_col).cast("double")
    s = F.col(score_col).cast("bigint")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & s.isNotNull()
    ).select(s.alias("__s"), v.alias("__v"))
    cells = base.groupBy("__s", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    cells = _persist_tracked(cells)
    groups = cells.select("__s").distinct()
    values = cells.select("__v").distinct()
    grid = (
        values.crossJoin(groups)
        .join(cells, ["__s", "__v"], "left")
        .select(
            "__s",
            "__v",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("__n"),
        )
    )
    wg = Window.partitionBy("__v").orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wv = Window.partitionBy("__s").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dense = grid.withColumn(
        "__cumg", F.coalesce(F.sum("__n").over(wg), F.lit(0))
    ).withColumn(
        "__l", F.coalesce(F.sum("__cumg").over(wv), F.lit(0))
    )
    dec12 = "decimal(12,0)"
    dec18 = "decimal(18,0)"
    term1 = dense.agg(
        # (2n) folds into ONE bigint first: a decimal triple product
        # would exceed width 38 on the DuckDB side
        F.sum(
            (F.lit(2) * F.col("__n")).cast(dec18)
            * F.col("__l").cast(dec18)
        ).cast("decimal(38,0)").alias("__t1")
    )
    # per-value pair mass in BIGINT (exact while per-value counts stay
    # below ~3e9 — the gini scaled-integer bound convention); the
    # halving is an exact shift (T^2 - sum n^2 is always even)
    vblocks = cells.groupBy("__v").agg(
        F.sum("__n").cast("bigint").alias("__t"),
        F.sum(F.col("__n") * F.col("__n")).cast("bigint").alias("__snn"),
    )
    tacc = vblocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum(
            F.shiftright(
                F.col("__t") * F.col("__t") - F.col("__snn"), 1
            )
        ).cast("decimal(38,0)").alias("__tie2h"),
        F.sum(
            F.col("__t").cast(dec12)
            * (F.col("__t") - 1).cast(dec12)
            * (2 * F.col("__t") + 5).cast(dec12)
        ).cast("decimal(38,0)").alias("__tv25"),
        F.sum(
            F.col("__t").cast(dec12)
            * (F.col("__t") - 1).cast(dec12)
            * (F.col("__t") - 2).cast(dec12)
        ).cast("decimal(38,0)").alias("__tv12"),
        F.sum(
            F.col("__t").cast(dec18) * (F.col("__t") - 1).cast(dec18)
        ).cast("decimal(38,0)").alias("__tv1"),
    )
    gsizes = cells.groupBy("__s").agg(F.sum("__n").cast("bigint").alias("__gn"))
    gacc = gsizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("__gn").cast("bigint").alias("n"),
        F.sum(
            F.col("__gn").cast(dec18) * F.col("__gn").cast(dec18)
        ).cast("decimal(38,0)").alias("__gnn"),
        F.sum(
            F.col("__gn").cast(dec12)
            * (F.col("__gn") - 1).cast(dec12)
            * (2 * F.col("__gn") + 5).cast(dec12)
        ).cast("decimal(38,0)").alias("__gn25"),
        F.sum(
            F.col("__gn").cast(dec12)
            * (F.col("__gn") - 1).cast(dec12)
            * (F.col("__gn") - 2).cast(dec12)
        ).cast("decimal(38,0)").alias("__gn12"),
        F.sum(
            F.col("__gn").cast(dec18) * (F.col("__gn") - 1).cast(dec18)
        ).cast("decimal(38,0)").alias("__gn1"),
    )
    acc = gacc.crossJoin(F.broadcast(term1)).crossJoin(F.broadcast(tacc))
    nd = F.col("n").cast("double")
    # doubled statistic and doubled null mean (exact integers)
    jt2 = F.col("__t1").cast("double") + F.col("__tie2h").cast("double")
    e2 = (nd * nd - F.col("__gnn").cast("double")) / 2.0
    var = (
        (
            nd * (nd - 1.0) * (2.0 * nd + 5.0)
            - F.col("__gn25").cast("double")
            - F.col("__tv25").cast("double")
        )
        / 72.0
        + F.col("__gn12").cast("double")
        * F.col("__tv12").cast("double")
        / (36.0 * nd * (nd - 1.0) * (nd - 2.0))
        + F.col("__gn1").cast("double")
        * F.col("__tv1").cast("double")
        / (8.0 * nd * (nd - 1.0))
    )
    z = F.when(
        (F.col("n") > 2) & (var > 0),
        (jt2 / 2.0 - e2 / 2.0) / F.sqrt(var),
    )
    out = acc.select(
        "n",
        "n_groups",
        "n_values",
        (F.col("__t1") + F.col("__tie2h")).cast("bigint").alias("jt2"),
        F.round(e2, 6).alias("e2_jt"),
        F.round(z, 6).alias("z"),
    )
    if with_p:
        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def effect_sizes(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_values: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Standardized effect sizes for the TRUE-vs-FALSE split of
    ``value_col`` — the magnitude read-out every significance test
    needs beside it (a p-value says "not noise"; the effect size says
    "big enough to care"): Cohen's d on the pooled SD, the small-sample
    Hedges' g correction g = d·(1 − 3/(4(n1+n2) − 9)), and the
    Vargha-Delaney A (the common-language effect: P(X1 > X2) +
    ½P(X1 = X2)) — A is EXACT from the doubled rank decomposition, no
    normality assumption. Returns ONE row: (n1, n2, mean_diff,
    cohens_d, hedges_g, vd_a); d/g NULL when the pooled variance
    degenerates, A NULL when either group is empty.

    Decomposition: the welch_ttest moment convention (per-group sums
    rounded to 4 dp before the arithmetic) + the mannwhitney
    distinct-value rank blocks for the doubled U — both exact in SQL.

    Complete-case on the POST-cast group flag (try_cast — the
    two_proportion convention) and on NaN values: a row whose group
    value casts to NULL boolean is excluded from BOTH the moment sums
    and the pooled tie counts, so vd_a's rank decomposition and n1/n2
    always describe the same population (round-11 advice item).

    The quantize-upstream contract on vd_a's distinct-value table is
    runtime-enforced via ``max_values`` (default 100k; ``None``
    disables) — see :func:`_rank_blocks`.
    """
    flag = F.col(group_col).try_cast("boolean")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v) & flag.isNotNull())
    per = base.groupBy(flag.alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum(v), 4).alias("__s1"),
        F.round(F.sum(v * v), 4).alias("__s2"),
    )
    one = per.agg(
        F.sum(F.when(F.col("__g"), F.col("__n"))).alias("n1"),
        F.sum(F.when(F.col("__g"), F.col("__s1"))).alias("__s1a"),
        F.sum(F.when(F.col("__g"), F.col("__s2"))).alias("__s2a"),
        F.sum(F.when(~F.col("__g"), F.col("__n"))).alias("n2"),
        F.sum(F.when(~F.col("__g"), F.col("__s1"))).alias("__s1b"),
        F.sum(F.when(~F.col("__g"), F.col("__s2"))).alias("__s2b"),
    )
    # doubled rank sum for the TRUE group over distinct-value blocks:
    # 2*R1 = sum t1*(2*cum - t + 1); 2*U1 = 2*R1 - n1*(n1+1)
    blocks = _rank_blocks(base, value_col, flag, "effect_sizes", max_values)
    u = blocks.agg(
        F.sum(
            F.col("__t1").cast("decimal(18,0)")
            * (2 * F.col("__cum") - F.col("__t") + 1).cast("decimal(18,0)")
        ).cast("decimal(38,0)").alias("__r2")
    )
    j = one.crossJoin(F.broadcast(u))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("__s1a") / n1
    m2 = F.col("__s1b") / n2
    v1 = F.when(n1 > 1, (F.col("__s2a") - F.col("__s1a") * m1) / (n1 - 1))
    v2 = F.when(n2 > 1, (F.col("__s2b") - F.col("__s1b") * m2) / (n2 - 1))
    pooled = F.when(
        (F.col("n1") > 1) & (F.col("n2") > 1),
        ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0),
    )
    d = F.when(pooled > 0, (m1 - m2) / F.sqrt(pooled))
    jcorr = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    u2 = F.col("__r2").cast("double") - n1 * (n1 + 1.0)
    vd_a = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0),
        u2 / (2.0 * n1 * n2),
    )
    return j.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(
            F.when((F.col("n1") > 0) & (F.col("n2") > 0), m1 - m2), 6
        ).alias("mean_diff"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * jcorr, 6).alias("hedges_g"),
        F.round(vd_a, 6).alias("vd_a"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two categorical
    label columns (two annotators, a model vs a gold set, two dedup
    heuristics): κ = (p_o − p_e)/(1 − p_e) with p_o the observed
    agreement share and p_e the chance agreement Σ_c (row_c/n)(col_c/n)
    over the shared category set. Returns ONE row: (n, n_categories,
    po, pe, kappa); κ NULL when p_e = 1 (every rating in one category
    — agreement is undefined, not zero). Complete-case on NULL labels.

    Decomposition (the chi2_independence convention): ONE (a, b) cell
    collapse bounds everything downstream by categories²; margins are
    cell-table aggregations; p_o/p_e/κ are scalar doubles rounded 6 dp
    — bit-for-bit SQL-replayable.
    """
    base = df.filter(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    )
    cells = base.groupBy(
        F.col(rater_a_col).cast("string").alias("__a"),
        F.col(rater_b_col).cast("string").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__o"))
    from ..cache import persist_tracked

    cells = persist_tracked(cells)
    rt = cells.groupBy("__a").agg(F.sum("__o").alias("__r"))
    ct = cells.groupBy("__b").agg(F.sum("__o").alias("__c"))
    glob = cells.agg(
        F.sum("__o").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__o"))
              .otherwise(F.lit(0))).alias("__agree"),
    )
    # chance agreement over the UNION of category sets via a full
    # outer margin join (a category only one rater used contributes 0)
    pe_tab = rt.join(ct, F.col("__a") == F.col("__b"), "full_outer").select(
        F.coalesce(F.col("__r"), F.lit(0)).alias("__r"),
        F.coalesce(F.col("__c"), F.lit(0)).alias("__c"),
    )
    # n_categories rides INSIDE the one aggregation (glob is a single
    # row, so the crossJoin row count IS the category count — exactly
    # what the oracle's acc CTE computes); a separate count() would be
    # an extra eager job re-deriving the margin join (review finding,
    # round 12)
    acc = (
        pe_tab.crossJoin(F.broadcast(glob))
        .agg(
            F.first("__n").alias("__n"),
            F.first("__agree").alias("__agree"),
            F.count(F.lit(1)).alias("__ncat"),
            F.sum(
                (F.col("__r").cast("double") / F.col("__n"))
                * (F.col("__c").cast("double") / F.col("__n"))
            ).alias("__pe"),
        )
    )
    po = F.col("__agree").cast("double") / F.col("__n")
    pe = F.col("__pe")
    return acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__ncat").cast("bigint").alias("n_categories"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (1.0 - pe)), 6
        ).alias("kappa"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Mutual information between two categorical columns, with the
    marginal entropies and the normalized MI — the association scale
    chi² lacks (MI is in nats, comparable across tables; NMI =
    MI/√(H_a·H_b) lands in [0,1]). Returns ONE row: (n, mi, h_a, h_b,
    nmi); NMI NULL when either marginal entropy is 0 (a constant
    column carries no information to normalize by). Complete-case on
    NULLs.

    Decomposition: ONE (a, b) cell collapse; marginals aggregate the
    cell table; MI = Σ (o/n)·ln(o·n/(r·c)) and the entropies are ln
    sums over cells/margins rounded 6 dp (ln ulp noise sits far below
    the grid — the txt_source_kl convention).
    """
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = base.groupBy(
        F.col(col_a).cast("string").alias("__a"),
        F.col(col_b).cast("string").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__o"))
    from ..cache import persist_tracked

    cells = persist_tracked(cells)
    rt = cells.groupBy("__a").agg(F.sum("__o").alias("__r"))
    ct = cells.groupBy("__b").agg(F.sum("__o").alias("__c"))
    glob = cells.agg(F.sum("__o").alias("__n"))
    joined = (
        cells.join(F.broadcast(rt), "__a")
        .join(F.broadcast(ct), "__b")
        .crossJoin(F.broadcast(glob))
    )
    n = F.col("__n").cast("double")
    o = F.col("__o").cast("double")
    mi = F.sum(
        (o / n)
        * F.log(
            o * n / (F.col("__r").cast("double") * F.col("__c").cast("double"))
        )
    )
    ha_tab = rt.crossJoin(F.broadcast(glob)).agg(
        F.sum(
            -(F.col("__r").cast("double") / F.col("__n").cast("double"))
            * F.log(F.col("__r").cast("double") / F.col("__n").cast("double"))
        ).alias("__ha")
    )
    hb_tab = ct.crossJoin(F.broadcast(glob)).agg(
        F.sum(
            -(F.col("__c").cast("double") / F.col("__n").cast("double"))
            * F.log(F.col("__c").cast("double") / F.col("__n").cast("double"))
        ).alias("__hb")
    )
    acc = (
        joined.agg(F.first("__n").alias("__n"), mi.alias("__mi"))
        .crossJoin(F.broadcast(ha_tab))
        .crossJoin(F.broadcast(hb_tab))
    )
    # Spark's greatest SKIPS nulls, so a bare greatest(__mi, 0.0) would
    # turn the degenerate/empty-input NULL into 0.0 — guard it behind
    # isNotNull so empty input yields NULL mi, consistent with the NULL
    # convention everywhere else (and with the nmi guard below); the
    # clamp itself only absorbs negative FP dust from the ln sums
    mi_clamped = F.when(
        F.col("__mi").isNotNull(), F.greatest(F.col("__mi"), F.lit(0.0))
    )
    return acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.round(mi_clamped, 6).alias("mi"),
        F.round(F.col("__ha"), 6).alias("h_a"),
        F.round(F.col("__hb"), 6).alias("h_b"),
        F.round(
            F.when(
                (F.col("__ha") > 0) & (F.col("__hb") > 0),
                mi_clamped / F.sqrt(F.col("__ha") * F.col("__hb")),
            ),
            6,
        ).alias("nmi"),
    )


def levene_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Levene variance-equality test with the classic MEAN center —
    the companion of :func:`brown_forsythe` (median center): one-way
    ANOVA on the absolute deviations from each group's mean. Use
    Levene when the groups are near-symmetric (more power);
    Brown-Forsythe when they are skewed/heavy-tailed (robust center).

    Decomposition: per-group exact means from ONE partial-agged moment
    pass (n, Σx on the 4-dp grid — the welch_ttest convention),
    rounded 6 dp and broadcast back; the deviation frame then feeds
    the anova_oneway moment pass unchanged. Two corpus passes, both
    partial-agged — the brown_forsythe shape with the percentile
    replaced by a cheaper plain aggregation.
    """
    vd = F.col(value_col).cast("double")
    v = F.round(vd, 4)
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__v"))
    means = base.groupBy("__g").agg(
        F.round(
            F.sum(F.col("__v").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("__mean")
    )
    dev = base.join(F.broadcast(means), "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__mean")).alias("__dev")
    )
    return anova_oneway(dev, "__dev", "__g", with_p=with_p)


def concordance_ccc(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Lin's concordance correlation coefficient — agreement between
    two continuous measurements (a model's predictions vs ground
    truth, two instruments): CCC = 2·s_xy / (s_x² + s_y² + (x̄ − ȳ)²).
    Pearson's r asks "linear?", CCC asks "on the 45° line?" — a
    calibration-sensitive agreement scale in [−1, 1]. Returns ONE row:
    (n, mean_x, mean_y, pearson_r, ccc); both NULL when either
    variance degenerates. Complete-case on NULL/NaN pairs.

    ONE partial-agged moment pass on the 4-dp decimal grid (the
    cuped_adjust convention: sums decimal(18,4), cross/square moments
    decimal(37,8) — exact, order-independent); every statistic is a
    scalar double over those sums, rounded 6 dp. Population (1/n)
    moments throughout — the standard CCC estimator.
    """
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    x = F.round(xd, 4).cast("decimal(18,4)")
    y = F.round(yd, 4).cast("decimal(18,4)")
    base = df.filter(
        xd.isNotNull() & ~F.isnan(xd) & yd.isNotNull() & ~F.isnan(yd)
    ).select(x.alias("__x"), y.alias("__y"))
    acc = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    mx = F.col("__sx").cast("double") / n
    my = F.col("__sy").cast("double") / n
    vx = F.col("__sxx").cast("double") / n - mx * mx
    vy = F.col("__syy").cast("double") / n - my * my
    cov = F.col("__sxy").cast("double") / n - mx * my
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    ccc = F.when(
        (vx > 0) & (vy > 0),
        2.0 * cov / (vx + vy + (mx - my) * (mx - my)),
    )
    return acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.round(F.when(F.col("__n") > 0, mx), 6).alias("mean_x"),
        F.round(F.when(F.col("__n") > 0, my), 6).alias("mean_y"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc, 6).alias("ccc"),
    )


def hodges_lehmann_shift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_pairs: int | None = 10_000_000,
) -> DataFrame:
    """Hodges–Lehmann shift estimate between the TRUE and FALSE
    groups: the MEDIAN of all pairwise differences x_i − y_j — the
    robust "how far did the distribution move" number that belongs
    next to :func:`mannwhitney_u`'s p-value (a location shift with
    50% breakdown, no normality assumption; the Wilcoxon-consistent
    point estimate). Returns ONE row: (n1, n2, n_pairs, hl_shift);
    NULL when either group is empty.

    Decomposition: NO pair explosion — each axis collapses to its
    distinct-value blocks (value, count) in one partial-agged groupBy;
    the difference multiset is the blocks_x × blocks_y cross join
    with weight t_x·t_y, re-collapsed by difference, and the weighted
    median reads the two middle order statistics (k = (N+1) div 2 and
    (N+2) div 2 over N = n1·n2) off ONE cumulative-weight window over
    the difference table. All counts are exact integers (decimal(38,0)
    cumulative weights — N scales as corpus², past int64 near 3·10⁹
    rows per side), so the median replays exactly in any engine; the
    final averaging of the two middle diffs is one double expression
    rounded 6 dp.

    The cells² contract is RUNTIME-ENFORCED (the kendall_tau_cells
    discipline): both persisted block tables are count-probed and the
    call raises :class:`~.guards.CollapsedTableTooLarge` when
    |blocks_x| · |blocks_y| exceeds ``max_pairs`` (default 10⁷ cell
    pairs — a few seconds of join work) — quantize continuous values
    upstream, or pass a higher ``max_pairs`` / ``None`` to accept the
    cost explicitly.
    """
    flag = F.col(group_col).cast("boolean")
    vd = F.col(value_col).cast("double")
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & F.col(group_col).isNotNull()
    ).select(vd.alias("__v"), flag.alias("__f"))

    def blocks(is_true):
        g = (
            base.filter(F.col("__f") == is_true)
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__t"))
        )
        if max_pairs is not None:
            g = _persist_tracked(g)
        return g

    bx, by = blocks(True), blocks(False)
    if max_pairs is not None:
        nx = bx.count()
        ny = by.count()
        if nx * ny > max_pairs:
            from .guards import CollapsedTableTooLarge

            raise CollapsedTableTooLarge(
                f"hodges_lehmann_shift: the difference table is "
                f"{nx:,} x {ny:,} = {nx * ny:,} cell pairs, past the "
                f"{max_pairs:,} cap. Quantize/bucket the value column "
                f"upstream so the distinct-value tables are model-sized, "
                f"or pass max_pairs=None / a higher max_pairs to accept "
                f"the cost explicitly."
            )
    dec = "decimal(38,0)"
    diffs = (
        bx.select(F.col("__v").alias("__x"), F.col("__t").alias("__tx"))
        .crossJoin(
            by.select(F.col("__v").alias("__y"), F.col("__t").alias("__ty"))
        )
        .groupBy((F.col("__x") - F.col("__y")).alias("__d"))
        .agg(
            F.sum(F.col("__tx").cast(dec) * F.col("__ty")).alias("__w")
        )
    )
    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    cum = diffs.withColumn("__cum", F.sum("__w").over(w))
    tot = base.agg(
        F.sum(F.when(F.col("__f"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("__f"), 1).otherwise(0)).alias("n2"),
    )
    n1, n2 = F.col("n1").cast(dec), F.col("n2").cast(dec)
    npairs = n1 * n2
    k1 = (npairs + 1) / 2
    k2 = (npairs + 2) / 2
    acc = cum.crossJoin(F.broadcast(tot)).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.min(
            F.when(F.col("__cum") >= F.floor(k1), F.col("__d"))
        ).alias("__lo"),
        F.min(
            F.when(F.col("__cum") >= F.floor(k2), F.col("__d"))
        ).alias("__hi"),
    )
    return acc.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        (F.col("n1").cast(dec) * F.col("n2")).cast("bigint").alias(
            "n_pairs"
        ),
        F.round(
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                (F.col("__lo") + F.col("__hi")) / 2.0,
            ),
            6,
        ).alias("hl_shift"),
    )
