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


def _rank_blocks(df: DataFrame, value_col: str, flag):
    """(value, n, p) distinct-value blocks plus the running pooled
    count — the shared tie-aware rank decomposition of AUC, U and KS:
    one partial-agged groupBy bounds everything downstream by the
    number of DISTINCT values."""
    g = df.groupBy(F.col(value_col).cast("double").alias("__v")).agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum(flag.cast("bigint")).alias("__t1"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    return g.withColumn("__cum", F.sum("__t").over(w)).withColumn(
        "__cum1", F.sum("__t1").over(w)
    )


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    with_p: bool = True,
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
    """
    flag = F.col(group_col).cast("boolean")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    blocks = _rank_blocks(base, value_col, flag)
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
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D: the max gap between the two
    empirical CDFs — THE distribution-drift test for continuous
    features. Returns ONE row: (n1, n2, d, ks_stat) with ks_stat =
    sqrt(n1·n2/(n1+n2))·D, the scale-free quantity monitoring systems
    threshold (1.36 ≈ α 0.05).

    Same distinct-value decomposition as :func:`mannwhitney_u`; both
    CDFs are exact integer ratios evaluated at every distinct pooled
    value, so D is engine-exact before the final rounding.
    """
    flag = F.col(group_col).cast("boolean")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    blocks = _rank_blocks(base, value_col, flag)
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
