"""A/B experimentation analytics: two-proportion z-test, CUPED
variance reduction, sample-ratio-mismatch guard — the statistics an
experimentation platform runs next to the drift battery
(operators/stats_tests.py). SURVEY §2 extension scope, same status as
operators/events.py: the reference has no experimentation surface.

Scale shape shared by all three: the corpus collapses in ONE
partial-agged pass (per-variant counts / moments); every statistic is
scalar double arithmetic over exact sums, so any SQL engine replays
it bit-for-bit. The welch_ttest discipline applies: continuous values
round to 4 dp ONCE so the moment sums sit on the decimal grid in both
engines; p-values (with_p=True) ride OUTSIDE the hashed oracle set
(the stats_tests convention — their special functions have no
cross-engine-exact form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .guards import DEFAULT_MAX_STEPS, probe_collapsed
from .stats_tests import _chi2_p, _z_p


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    with_p: bool = True,
) -> DataFrame:
    """Two-proportion z-test — the conversion-rate A/B read-out: does
    the TRUE group of boolean ``group_col`` convert at a different
    rate than the FALSE group? Returns ONE row: (n1, x1, n2, x2,
    rate1, rate2, lift, z) with the pooled-variance statistic
    z = (p1 − p2) / √(p̂(1−p̂)(1/n1 + 1/n2)); z NULL when either arm
    is empty or the pooled rate is degenerate (0 or 1 — no variance).
    Rows whose group or success flag is NULL *after the boolean cast*
    drop (complete-case): an unparseable success string must not count
    toward the arm size while being excluded from the conversions.

    ONE aggregation over the corpus: four integer sums. Everything
    downstream is scalar arithmetic on them, rounded 6 dp.
    """
    g = F.col(group_col).try_cast("boolean")
    sb = F.col(success_col).try_cast("boolean")
    s = sb.cast("int")
    base = df.filter(g.isNotNull() & sb.isNotNull())
    acc = base.agg(
        F.sum(g.cast("int")).cast("bigint").alias("n1"),
        F.sum(F.when(g, s).otherwise(0)).cast("bigint").alias("x1"),
        F.sum((~g).cast("int")).cast("bigint").alias("n2"),
        F.sum(F.when(~g, s).otherwise(0)).cast("bigint").alias("x2"),
    )
    n1, x1 = F.col("n1").cast("double"), F.col("x1").cast("double")
    n2, x2 = F.col("n2").cast("double"), F.col("x2").cast("double")
    p1 = x1 / n1
    p2 = x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    var = pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)
    z = F.when((F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0),
               (p1 - p2) / F.sqrt(var))
    out = acc.select(
        "n1", "x1", "n2", "x2",
        F.round(F.when(F.col("n1") > 0, p1), 6).alias("rate1"),
        F.round(F.when(F.col("n2") > 0, p2), 6).alias("rate2"),
        F.round(
            F.when((F.col("n2") > 0) & (p2 > 0), p1 / p2 - 1.0), 6
        ).alias("lift"),
        F.round(z, 6).alias("z"),
    )
    if with_p:
        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    group_col: str,
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data,
    Deng et al. 2013): shrink each unit's metric by its pre-period
    covariate, y′ = y − θ·(x − x̄) with θ = cov(y, x)/var(x) fitted on
    the POOLED data — the standard experimentation-platform variance
    reducer (a well-correlated covariate cuts the metric variance by
    corr², tightening every confidence interval for free). Returns one
    row per group: (group, n, mean_raw, mean_adjusted, theta,
    var_reduction) ordered by group, where var_reduction =
    1 − var(y′)/var(y) pooled (≈ corr(y,x)²); theta/adjustment NULL
    when var(x) degenerates.

    Decomposition: values round to 4 dp once and accumulate as EXACT
    DECIMALS — sums as decimal(18,4), cross/square moments as
    decimal(37,8) products (exact: 18+18+1 = 37 ≤ 38, no Spark
    precision-loss reduction) — so every moment is order-independent
    and both engines derive the statistics from identical literals
    (a float Σxy would differ in the last ulp between partition
    orders). Two partial-agged passes over the UNIT-level input
    (typically an already-collapsed per-user table): pooled moments
    (n, Σx, Σy, Σxy, Σx², Σy²) and per-group sums (n, Σy, Σx);
    everything downstream is scalar double arithmetic over the
    groups-bounded table. Mean-centering is algebraically eliminated
    (the timeseries convention): mean(y′) = ȳ_g − θ·(x̄_g − x̄).
    """
    y = F.round(F.col(metric_col).cast("double"), 4).cast("decimal(18,4)")
    x = F.round(F.col(covariate_col).cast("double"), 4).cast(
        "decimal(18,4)"
    )
    base = df.filter(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"), y.alias("__y"), x.alias("__x")
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__sy"),
        F.sum("__x").alias("__sx"),
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("__tn"),
        F.sum("__y").alias("__ty"),
        F.sum("__x").alias("__tx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__txy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__txx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__tyy"),
    )
    j = per.crossJoin(F.broadcast(glob))
    tn = F.col("__tn").cast("double")
    tx = F.col("__tx").cast("double")
    ty = F.col("__ty").cast("double")
    sxx = F.col("__txx").cast("double") - tx * tx / tn
    sxy = F.col("__txy").cast("double") - tx * ty / tn
    syy = F.col("__tyy").cast("double") - ty * ty / tn
    theta = F.when(sxx > 0, sxy / sxx)
    mean_x = tx / tn
    mean_g_y = F.col("__sy").cast("double") / F.col("__n")
    mean_g_x = F.col("__sx").cast("double") / F.col("__n")
    adj = mean_g_y - theta * (mean_g_x - mean_x)
    vr = F.when((sxx > 0) & (syy > 0), sxy * sxy / (sxx * syy))
    return j.select(
        F.col("__g").alias("group"),
        F.col("__n").cast("bigint").alias("n"),
        F.round(mean_g_y, 6).alias("mean_raw"),
        F.round(adj, 6).alias("mean_adjusted"),
        F.round(theta, 6).alias("theta"),
        F.round(vr, 6).alias("var_reduction"),
    ).orderBy("group")


def srm_check(
    df: DataFrame,
    group_col: str,
    expected_weights: dict,
    with_p: bool = True,
) -> DataFrame:
    """Sample-ratio-mismatch guard: chi-square goodness-of-fit of the
    observed per-variant counts against the DESIGNED allocation — the
    first validity check any experiment read-out must pass (an SRM
    means the assignment or logging pipeline is biased and every
    downstream statistic is suspect). Returns one row per variant:
    (group, n_observed, n_expected, chi2_term) plus the per-row total
    columns (n, chi2, dof) repeated for single-scan consumption,
    ordered by group. The variant SPINE is the DESIGNED weight table,
    not the observed counts: an arm that logged zero rows — the most
    severe SRM possible — still contributes its full (0−E)²/E term and
    still counts toward dof = len(expected_weights) − 1. Variants in
    the data but absent from ``expected_weights`` raise, and so does
    any non-positive designed weight (a zero-weight "arm" makes the
    goodness-of-fit expected count 0 — same broken-weight-table
    condition).

    ONE per-variant count collapse left-joined onto the weight spine;
    the expected counts derive from the weight literals both engines
    embed; chi² terms are scalar doubles rounded 6 dp.
    """
    if not expected_weights:
        raise ValueError("srm_check: expected_weights must be non-empty")
    if any(not float(v) > 0 for v in expected_weights.values()):
        raise ValueError(
            "srm_check: every designed weight must be > 0 — a zero-weight "
            "variant has expected count 0 (chi² undefined); drop it from "
            "the design or fix the weight table"
        )
    total_w = float(sum(expected_weights.values()))
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).cast("string").alias("group"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_observed"))
    )
    known = [str(k) for k in expected_weights]
    unknown = counts.filter(~F.col("group").isin(known)).count()
    if unknown:
        raise ValueError(
            f"srm_check: {unknown} observed variant(s) missing from "
            f"expected_weights {sorted(known)} — fix the weight table, "
            f"do not silently drop data"
        )
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(str(k), float(v) / total_w) for k, v in sorted(expected_weights.items())],
        "group string, __w double",
    )
    # right-outer keeps every designed arm; counts (variants-bounded)
    # is the broadcastable build side for that join shape.
    full = F.broadcast(counts).join(spine, "group", "right").select(
        "group",
        "__w",
        F.coalesce(F.col("n_observed"), F.lit(0)).cast("bigint").alias(
            "n_observed"
        ),
    )
    tot = full.agg(F.sum("n_observed").alias("__n"))
    j = full.crossJoin(F.broadcast(tot)).withColumn(
        "n_expected", F.round(F.col("__w") * F.col("__n"), 6)
    )
    term = F.when(
        F.col("n_expected") > 0,
        (F.col("n_observed") - F.col("n_expected"))
        * (F.col("n_observed") - F.col("n_expected"))
        / F.col("n_expected"),
    )
    j = j.withColumn("chi2_term", F.round(term, 6))
    agg = j.agg(F.round(F.sum("chi2_term"), 6).alias("chi2"))
    out = (
        j.crossJoin(F.broadcast(agg))
        .select(
            "group",
            "n_observed",
            "n_expected",
            "chi2_term",
            F.col("__n").cast("bigint").alias("n"),
            "chi2",
            F.lit(len(expected_weights) - 1).cast("bigint").alias("dof"),
        )
        .orderBy("group")
    )
    if with_p:
        out = out.withColumn(
            "p_value",
            F.round(
                _chi2_p(F.col("chi2"), F.col("dof").cast("double")), 6
            ),
        )
    return out


def winsorized_metrics(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized and trimmed per-variant means — the heavy-tail
    defense every revenue experiment needs (one whale order moves a
    raw mean by more than the treatment effect; capping at the
    [lo, hi] percentile band restores sensitivity without dropping
    the rows). Returns one row per group: (group, n, mean_raw,
    p_lo, p_hi, mean_winsorized, n_trimmed, mean_trimmed) ordered by
    group; winsorized = values clamped to the band, trimmed = values
    outside the band dropped.

    Decomposition: values round to 4 dp once (the cuped_adjust decimal
    grid); per-group band edges are EXACT interpolated percentiles
    (Spark ``percentile`` == DuckDB ``quantile_cont`` — the f13
    parity convention), themselves rounded back to the 4-dp grid so
    clamped values stay exact decimals; every mean is an exact decimal
    sum over one corpus pass + one groups-bounded broadcast join.
    """
    if not (0.0 <= lo < hi <= 1.0):
        raise ValueError("winsorized_metrics: need 0 <= lo < hi <= 1")
    vd = F.col(metric_col).cast("double")
    v = F.round(vd, 4).cast("decimal(18,4)")
    # NaN drops like NULL (complete-case): a NaN would raise on the
    # ANSI decimal cast and corrupt the percentile edges regardless
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), v.alias("__v"))
    # percentile over the DOUBLE image of the 4-dp grid: Spark's exact
    # `percentile` and DuckDB's `quantile_cont` then interpolate the
    # identical IEEE values (the f13 parity convention)
    edges = base.groupBy("__g").agg(
        F.round(
            F.expr(f"percentile(cast(__v as double), {float(lo)!r})"), 4
        ).cast("decimal(18,4)").alias("__lo"),
        F.round(
            F.expr(f"percentile(cast(__v as double), {float(hi)!r})"), 4
        ).cast("decimal(18,4)").alias("__hi"),
    )
    j = base.join(F.broadcast(edges), "__g")
    clamped = F.least(F.greatest(F.col("__v"), F.col("__lo")), F.col("__hi"))
    inside = (F.col("__v") >= F.col("__lo")) & (F.col("__v") <= F.col("__hi"))
    acc = j.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").alias("__sv"),
        F.first("__lo").alias("__flo"),
        F.first("__hi").alias("__fhi"),
        F.sum(clamped).alias("__sw"),
        F.sum(F.when(inside, 1).otherwise(0)).cast("bigint").alias("n_trimmed"),
        F.sum(F.when(inside, F.col("__v")).otherwise(F.lit(0).cast("decimal(18,4)"))).alias("__st"),
    )
    return acc.select(
        F.col("__g").alias("group"),
        "n",
        F.round(F.col("__sv").cast("double") / F.col("n"), 6).alias("mean_raw"),
        F.col("__flo").cast("double").alias("p_lo"),
        F.col("__fhi").cast("double").alias("p_hi"),
        F.round(F.col("__sw").cast("double") / F.col("n"), 6).alias(
            "mean_winsorized"
        ),
        "n_trimmed",
        F.round(
            F.when(
                F.col("n_trimmed") > 0,
                F.col("__st").cast("double") / F.col("n_trimmed"),
            ),
            6,
        ).alias("mean_trimmed"),
    ).orderBy("group")


def ratio_metric_delta(
    df: DataFrame,
    numer_col: str,
    denom_col: str,
    group_col: str,
    z: float = 1.959963985,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue
    per session, clicks per impression) — the read-out naive per-unit
    averaging gets wrong: the estimand is Σx/Σy (a ratio of means),
    and its sampling variance needs the numerator-denominator
    covariance, var(r) ≈ (s_xx − 2r·s_xy + r²·s_yy)/(n·ȳ²) (Deng et
    al. 2017's experimentation-standard linearization). Returns one
    row per group: (group, n, sum_numer, sum_denom, ratio, se, ci_lo,
    ci_hi) ordered by group; se/CI NULL when n < 2 or ȳ degenerates.

    ONE partial-agged pass: per-group moments accumulate as exact
    decimals (the cuped_adjust discipline — 4-dp grid, decimal(37,8)
    cross/square products); everything downstream is scalar double
    arithmetic over the groups-bounded table, rounded 6 dp.
    """
    xd = F.col(numer_col).cast("double")
    yd = F.col(denom_col).cast("double")
    x = F.round(xd, 4).cast("decimal(18,4)")
    y = F.round(yd, 4).cast("decimal(18,4)")
    # NaN drops like NULL (complete-case — the winsorized_metrics
    # ANSI-decimal-cast rationale)
    base = df.filter(
        xd.isNotNull()
        & ~F.isnan(xd)
        & yd.isNotNull()
        & ~F.isnan(yd)
        & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), x.alias("__x"), y.alias("__y"))
    acc = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    mx = sx / n
    my = sy / n
    sxx = (F.col("__sxx").cast("double") - sx * mx) / (n - 1.0)
    syy = (F.col("__syy").cast("double") - sy * my) / (n - 1.0)
    sxy = (F.col("__sxy").cast("double") - sx * my) / (n - 1.0)
    r = F.when(sy != 0, sx / sy)
    var = F.when(
        (F.col("__n") > 1) & (my != 0.0),
        (sxx - F.lit(2.0) * r * sxy + r * r * syy) / (n * my * my),
    )
    se = F.when(var >= 0, F.sqrt(var))
    return acc.select(
        F.col("__g").alias("group"),
        F.col("__n").cast("bigint").alias("n"),
        F.col("__sx").cast("double").alias("sum_numer"),
        F.col("__sy").cast("double").alias("sum_denom"),
        F.round(r, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(r - F.lit(float(z)) * se, 6).alias("ci_lo"),
        F.round(r + F.lit(float(z)) * se, 6).alias("ci_hi"),
    ).orderBy("group")


def covariate_balance(
    df: DataFrame,
    covariate_cols: list,
    group_col: str,
) -> DataFrame:
    """Standardized mean difference (SMD) per covariate between the
    TRUE and FALSE arms — the pre-experiment randomization audit
    (|SMD| < 0.1 is the conventional "balanced" bar; an imbalanced
    covariate says the split is confounded BEFORE any outcome is
    read). Returns one row per covariate: (covariate, n1, n2, mean1,
    mean2, smd, balanced) ordered by covariate name; SMD NULL when
    either arm degenerates (n < 2 or zero pooled variance).

    Plan shape: ONE corpus scan — the covariates unpivot through an
    Expand stage (the dq_completeness_profile convention) so k
    covariates do NOT mean k scans; per-(covariate, arm) moments
    accumulate as exact decimals, then a covariates-bounded collapse.
    Rows with a NULL group drop; NULL covariate values drop per-cell
    (complete-case per covariate, not per row).
    """
    if not covariate_cols:
        raise ValueError("covariate_balance: need at least one covariate")
    g = F.col(group_col).cast("boolean")
    pairs = ", ".join(
        f"'{c}', round(cast(`{c}` as double), 4)" for c in covariate_cols
    )
    base = (
        df.filter(g.isNotNull())
        .select(
            g.alias("__g"),
            F.expr(
                f"stack({len(covariate_cols)}, {pairs}) as (__cov, __x)"
            ),
        )
        .filter(F.col("__x").isNotNull() & ~F.isnan(F.col("__x")))
        .select(
            "__g", "__cov", F.col("__x").cast("decimal(18,4)").alias("__x")
        )
    )
    acc = base.groupBy("__cov").agg(
        F.sum(F.when(F.col("__g"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~F.col("__g"), 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("__g"), F.col("__x"))).alias("__s1"),
        F.sum(F.when(~F.col("__g"), F.col("__x"))).alias("__s2"),
        F.sum(
            F.when(F.col("__g"), F.col("__x") * F.col("__x"))
        ).alias("__q1"),
        F.sum(
            F.when(~F.col("__g"), F.col("__x") * F.col("__x"))
        ).alias("__q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("__s1").cast("double") / n1
    m2 = F.col("__s2").cast("double") / n2
    v1 = (F.col("__q1").cast("double") - n1 * m1 * m1) / (n1 - 1.0)
    v2 = (F.col("__q2").cast("double") - n2 * m2 * m2) / (n2 - 1.0)
    pooled = (v1 + v2) / 2.0
    smd = F.when(
        (F.col("n1") > 1) & (F.col("n2") > 1) & (pooled > 0),
        (m1 - m2) / F.sqrt(pooled),
    )
    return acc.select(
        F.col("__cov").alias("covariate"),
        "n1",
        "n2",
        F.round(F.when(F.col("n1") > 0, m1), 6).alias("mean1"),
        F.round(F.when(F.col("n2") > 0, m2), 6).alias("mean2"),
        F.round(smd, 6).alias("smd"),
        (F.abs(F.round(smd, 6)) < 0.1).alias("balanced"),
    ).orderBy("covariate")


def eb_rate_shrinkage(
    df: DataFrame,
    key_col: str,
    trials_col: str,
    successes_col: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-key rates —
    the small-n defense for per-item CTR/conversion tables: a key with
    2/2 successes must NOT outrank one with 180/200, so every raw rate
    shrinks toward the pooled rate with strength K (the
    method-of-moments prior precision à la Kleinman 1973): shrunk =
    (x + K·m)/(n + K) with m the pooled rate and K from the excess of
    the observed rate variance over binomial noise. Input is an
    ALREADY-COLLAPSED per-key table (n_i, x_i) — collapse the event
    log upstream. Returns one row per key: (key, trials, successes,
    rate_raw, rate_shrunk) plus the repeated prior columns
    (pooled_rate, prior_strength); when the between-key variance does
    not exceed the sampling noise (no real heterogeneity) K is NULL
    and every rate shrinks fully to the pool. The opposite extreme —
    between-key variance past the binomial ceiling m(1−m), where the
    MoM solution turns negative — clamps K at 0 and leaves every rate
    RAW: extreme heterogeneity means the prior carries no information
    (round-11 advice item; previously that branch fell into the
    full-pool shrink reserved for the no-heterogeneity case).

    Decomposition: per-key rates and inverse trials round to 9 dp and
    accumulate as exact decimals in ONE keys-bounded pass (rate
    squares exact at decimal(38,18)); K and m are scalar doubles both
    engines derive from those sums; the shrunk rates are one
    multiply-add per key, rounded 6 dp.
    """
    n_i = F.col(trials_col).cast("bigint")
    x_i = F.col(successes_col).cast("bigint")
    base = df.filter(
        n_i.isNotNull() & x_i.isNotNull() & (n_i > 0)
    ).select(
        F.col(key_col).alias("key"),
        n_i.alias("trials"),
        x_i.alias("successes"),
        # rates/inverse-trials sit in [0, 1]: decimal(10,9) keeps the
        # square product at precision 21 — exact, no Spark 38-cap
        # reduction (the ewma precision-rule lesson)
        F.round(x_i.cast("double") / n_i.cast("double"), 9)
        .cast("decimal(10,9)")
        .alias("__p"),
        F.round(F.lit(1.0) / n_i.cast("double"), 9)
        .cast("decimal(10,9)")
        .alias("__inv"),
    )
    # the per-key table feeds BOTH the prior moments and the shrink
    # projection: persist it so the moment probe does not re-run the
    # caller's upstream collapse (one pass over the keys, not two)
    from ..cache import persist_tracked

    base = persist_tracked(base)
    glob = base.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("trials").alias("__tn"),
        F.sum("successes").alias("__tx"),
        F.sum("__p").alias("__sp"),
        F.sum(F.col("__p") * F.col("__p")).alias("__spp"),
        F.sum("__inv").alias("__sinv"),
    )
    k = F.col("__k").cast("double")
    m = F.col("__tx").cast("double") / F.col("__tn").cast("double")
    sp = F.col("__sp").cast("double")
    var_p = F.when(
        F.col("__k") > 1,
        (F.col("__spp").cast("double") - sp * sp / k) / (k - 1.0),
    )
    h = F.col("__sinv").cast("double") / k
    strength = F.when(
        var_p > m * (1.0 - m) * h,
        (m * (1.0 - m) - var_p) / (var_p - m * (1.0 - m) * h),
    )
    j = base.crossJoin(F.broadcast(glob))
    # K is clamped at 0 (round-11 advice item): when the between-key
    # variance exceeds m(1−m) the MoM numerator goes negative — that
    # is EXTREME heterogeneity, so the prior carries no information
    # and every rate stays raw (K→0), NOT the full-pool branch that
    # the no-heterogeneity NULL case takes.
    kk = F.when(strength.isNotNull(), F.greatest(strength, F.lit(0.0)))
    shrunk = (
        F.when(
            kk.isNotNull() & (kk > 0),
            (F.col("successes").cast("double") + kk * m)
            / (F.col("trials").cast("double") + kk),
        )
        .when(kk.isNotNull(), F.col("__p").cast("double"))
        .otherwise(m)
    )
    return j.select(
        "key",
        "trials",
        "successes",
        F.round(F.col("__p").cast("double"), 6).alias("rate_raw"),
        F.round(shrunk, 6).alias("rate_shrunk"),
        F.round(m, 6).alias("pooled_rate"),
        F.round(kk, 6).alias("prior_strength"),
    ).orderBy("key")


def paired_conversion_state(
    df: DataFrame,
    boundary_ts: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    event_value: str = "purchase",
) -> DataFrame:
    """Per-user paired (pre, post) conversion flags around a FIXED
    boundary timestamp — the McNemar sufficient statistic, and two
    boolean-max monoids: a streaming aggregation's running state after
    any prefix of micro-batches equals this batch collapse over the
    same rows (streaming/segments.py paired_flags_stream delegates
    here — the user_spans convention). The boundary must be a KNOWN
    constant (campaign launch, feature flag flip): a data-derived
    midpoint is a global property of the full log and belongs in the
    batch pass (the stat_mcnemar query computes one from min/max
    probes). The McNemar cells/chi² stay in foreachBatch — global
    functions of the state."""
    is_ev = F.col(event_type_col) == event_value
    return df.groupBy(F.col(user_col)).agg(
        F.max(
            (is_ev & (F.col(ts_col) <= F.lit(boundary_ts))).cast("int")
        ).alias("pre"),
        F.max(
            (is_ev & (F.col(ts_col) > F.lit(boundary_ts))).cast("int")
        ).alias("post"),
    )


def variant_counts(
    df: DataFrame,
    group_col: str,
    success_col: str | None = None,
) -> DataFrame:
    """Per-variant (n, conversions) — the sufficient statistic behind
    the whole experimentation read-out (two_proportion_ztest consumes
    the four sums; srm_check the counts), and a pure SUM monoid: a
    streaming aggregation's running counters after any prefix of
    micro-batches equal this batch collapse over the same rows
    (streaming/segments.py ab_counts_stream delegates here — the
    rfm_state convention). The z/chi² statistics stay in foreachBatch
    or the batch pass: they are global functions of the counters, not
    of the stream."""
    base = df.filter(F.col(group_col).isNotNull())
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    if success_col is not None:
        base = base.filter(F.col(success_col).isNotNull())
        aggs.append(
            F.sum(F.col(success_col).cast("boolean").cast("int"))
            .cast("bigint")
            .alias("conversions")
        )
    return base.groupBy(F.col(group_col).alias("variant")).agg(*aggs)


def msprt_monitor(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    success_col: str,
    tau2: float = 0.01,
    alpha: float = 0.05,
    period_ns: int = 3_600_000_000_000,
    max_buckets: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT, Johari et
    al. 2017 "Peeking at A/B tests") — the ALWAYS-VALID p-value for a
    running two-proportion experiment: classic z-tests are only valid
    at a pre-committed sample size, and peeking hourly inflates false
    positives several-fold; the mSPRT's p_t = 1 / max_{s≤t} Λ_s is
    valid at EVERY look, so the dashboard can stop the moment it
    crosses α. The bucket table must stay model-sized (pick period_ns
    at dashboard granularity) — RUNTIME-ENFORCED by a ``max_buckets``
    count probe (default 100k; None disables). Λ uses the normal mixture prior N(0, τ²) over the
    effect: Λ_t = √(V_t/(V_t+τ²)) · exp(τ²·δ_t² / (2·V_t·(V_t+τ²)))
    with δ_t the running rate difference and V_t the pooled variance
    of δ_t. Returns one row per period bucket, ordered: (bucket, n1,
    x1, n2, x2 — running totals — lambda, p_always_valid,
    significant).

    Determinism: the running totals are exact integer cumulative
    windows over the bucket-bounded increment table (ONE corpus
    collapse); Λ is a fixed IEEE chain over them, the running max and
    the reciprocal ride the identical ordered double sequence in both
    engines (the KM ordered-fold argument), and ``significant``
    compares the 6-dp ROUNDED p to α so the decision column is
    grid-deterministic. The √/exp libm ulp noise sits far below the
    6-dp grid (the txt_source_kl ln() convention).
    """
    g = F.col(group_col).try_cast("boolean")
    s = F.col(success_col).try_cast("boolean").cast("int")
    base = df.filter(g.isNotNull() & s.isNotNull()).select(
        # exact integer div: float(epoch-ns) > 2^53 rounds by up to
        # ~128 ns, enough to flip a bucket boundary (the st_events
        # lesson)
        F.expr(
            f"cast({ts_col} as bigint) div {int(period_ns)}"
        ).alias("__bucket"),
        g.alias("__g"),
        s.alias("__s"),
    )
    from ..cache import persist_tracked

    # the bucket table is persisted and count-probed (round-12): its
    # cumulative windows and running max all ride ONE unpartitioned
    # ordered window, sound only while buckets stay model-sized —
    # period_ns too fine (or a raw-timestamp bucket) now fails loud
    # instead of going single-reducer silently
    inc = persist_tracked(base.groupBy("__bucket").agg(
        F.sum(F.when(F.col("__g"), 1).otherwise(0)).alias("__dn1"),
        F.sum(F.when(F.col("__g"), F.col("__s")).otherwise(0)).alias("__dx1"),
        F.sum(F.when(~F.col("__g"), 1).otherwise(0)).alias("__dn2"),
        F.sum(F.when(~F.col("__g"), F.col("__s")).otherwise(0)).alias("__dx2"),
    ))
    probe_collapsed(inc, max_buckets, "msprt_monitor", "bucket", "max_buckets")
    w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        inc.withColumn("n1", F.sum("__dn1").over(w).cast("bigint"))
        .withColumn("x1", F.sum("__dx1").over(w).cast("bigint"))
        .withColumn("n2", F.sum("__dn2").over(w).cast("bigint"))
        .withColumn("x2", F.sum("__dx2").over(w).cast("bigint"))
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    p1 = F.col("x1").cast("double") / n1
    p2 = F.col("x2").cast("double") / n2
    pp = (F.col("x1") + F.col("x2")).cast("double") / (n1 + n2)
    v = pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)
    t2 = float(tau2)
    lam = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (v > 0),
        F.sqrt(v / (v + t2))
        * F.exp(
            t2 * (p1 - p2) * (p1 - p2) / (2.0 * v * (v + t2))
        ),
    )
    scored = cum.withColumn("__lam", lam).withColumn(
        "__runmax", F.max("__lam").over(w)
    )
    p_av = F.when(
        F.col("__runmax") > 1.0, 1.0 / F.col("__runmax")
    ).otherwise(F.lit(1.0))
    return scored.select(
        F.col("__bucket").alias("bucket"),
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(F.col("__lam"), 6).alias("lambda"),
        F.round(p_av, 6).alias("p_always_valid"),
        (F.round(p_av, 6) < F.lit(float(alpha))).alias("significant"),
    ).orderBy("bucket")


def quantile_treatment_effect(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    quantiles: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects — WHERE in the distribution did the
    treatment act? A mean lift of +2% can be the whole tail moving or
    every user moving; the per-quantile differences q_treat(τ) −
    q_control(τ) disaggregate it (the heavy-tail companion of
    :func:`winsorized_metrics`). Returns one row per requested
    quantile, ordered: (q, q_treatment, q_control, qte).

    ONE per-arm aggregation: the exact interpolated percentile at the
    whole quantile VECTOR (Spark ``percentile(col, array(...))`` ==
    DuckDB ``quantile_cont(col, [...])`` — the f13 parity convention
    applied element-wise over the 4-dp double grid), then a
    quantiles-bounded explode. NaN/NULL metrics drop complete-case.
    An EMPTY arm yields NULL quantiles on that side, not an empty
    frame: the percentile arrays coalesce to all-NULL arrays of
    len(quantiles) so the per-quantile spine always survives
    (round-11 advice item — a NULL array would zip/posexplode to
    zero rows and silently collapse the whole result).
    """
    if not quantiles:
        raise ValueError("quantile_treatment_effect: need quantiles")
    qs = [float(q) for q in quantiles]
    if not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantile_treatment_effect: quantiles in [0,1]")
    vd = F.col(metric_col).cast("double")
    g = F.col(group_col).try_cast("boolean")
    base = df.filter(
        vd.isNotNull() & ~F.isnan(vd) & g.isNotNull()
    ).select(g.alias("__g"), F.round(vd, 4).alias("__v"))
    arr = "array(" + ", ".join(repr(q) for q in qs) + ")"
    nulls = F.array(*[F.lit(None).cast("double") for _ in qs])
    acc = base.agg(
        F.expr(
            f"percentile(CASE WHEN __g THEN __v END, {arr})"
        ).alias("__qt"),
        F.expr(
            f"percentile(CASE WHEN NOT __g THEN __v END, {arr})"
        ).alias("__qc"),
    ).select(
        F.coalesce(F.col("__qt"), nulls).alias("__qt"),
        F.coalesce(F.col("__qc"), nulls).alias("__qc"),
    )
    qdf = acc.select(
        F.posexplode(
            F.arrays_zip(F.col("__qt"), F.col("__qc"))
        ).alias("__i", "__z")
    )
    qlit = F.array(*[F.lit(q) for q in qs])
    return qdf.select(
        F.element_at(qlit, F.col("__i") + 1).alias("q"),
        F.round(F.col("__z.__qt"), 6).alias("q_treatment"),
        F.round(F.col("__z.__qc"), 6).alias("q_control"),
        F.round(F.col("__z.__qt") - F.col("__z.__qc"), 6).alias("qte"),
    ).orderBy("q")


def diff_in_diff(
    df: DataFrame,
    metric_col: str,
    treated_col: str,
    post_col: str,
) -> DataFrame:
    """Difference-in-differences — the quasi-experimental estimator
    when assignment was NOT randomized (a staged rollout, a region
    launch): the treatment effect is the treated group's pre→post
    change MINUS the control group's, netting out the common time
    trend that a naive post-only comparison absorbs. Input is
    unit-period level (one row per unit per period). Returns ONE row:
    the four cell means (mean_treated_pre, mean_treated_post,
    mean_control_pre, mean_control_post), their counts, did, se and
    the 95% CI, with se = √(Σ s²_cell/n_cell) (the standard
    unpooled four-cell variance); se/CI NULL when any cell has n < 2.

    ONE partial-agged pass: per-cell decimal moments (the
    cuped_adjust 4-dp grid + decimal(37,8) squares); everything
    downstream is scalar doubles over the 4-cell table, rounded 6 dp.
    Complete-case on NULL/NaN metrics and NULL flags (try_cast — the
    two_proportion convention).
    """
    yd = F.col(metric_col).cast("double")
    y = F.round(yd, 4).cast("decimal(18,4)")
    t = F.col(treated_col).try_cast("boolean")
    p = F.col(post_col).try_cast("boolean")
    base = df.filter(
        yd.isNotNull() & ~F.isnan(yd) & t.isNotNull() & p.isNotNull()
    ).select(t.alias("__t"), p.alias("__p"), y.alias("__y"))

    def cell(tt, pp, what):
        cond = (F.col("__t") == tt) & (F.col("__p") == pp)
        if what == "n":
            return F.sum(cond.cast("int")).cast("bigint")
        if what == "s":
            return F.sum(F.when(cond, F.col("__y")))
        return F.sum(F.when(cond, F.col("__y") * F.col("__y")))

    acc = base.agg(
        *[
            expr.alias(f"__{name}")
            for name, expr in [
                ("n_tp", cell(True, False, "n")),
                ("s_tp", cell(True, False, "s")),
                ("q_tp", cell(True, False, "q")),
                ("n_ta", cell(True, True, "n")),
                ("s_ta", cell(True, True, "s")),
                ("q_ta", cell(True, True, "q")),
                ("n_cp", cell(False, False, "n")),
                ("s_cp", cell(False, False, "s")),
                ("q_cp", cell(False, False, "q")),
                ("n_ca", cell(False, True, "n")),
                ("s_ca", cell(False, True, "s")),
                ("q_ca", cell(False, True, "q")),
            ]
        ]
    )

    def mean(s, n):
        return F.col(f"__{s}").cast("double") / F.col(f"__{n}").cast(
            "double"
        )

    def varm(q, s, n):
        nn = F.col(f"__{n}").cast("double")
        ss = F.col(f"__{s}").cast("double")
        return (F.col(f"__{q}").cast("double") - ss * (ss / nn)) / (
            nn - 1.0
        )

    m_tp = mean("s_tp", "n_tp")
    m_ta = mean("s_ta", "n_ta")
    m_cp = mean("s_cp", "n_cp")
    m_ca = mean("s_ca", "n_ca")
    did = (m_ta - m_tp) - (m_ca - m_cp)
    all_n2 = (
        (F.col("__n_tp") > 1)
        & (F.col("__n_ta") > 1)
        & (F.col("__n_cp") > 1)
        & (F.col("__n_ca") > 1)
    )
    var = (
        varm("q_tp", "s_tp", "n_tp") / F.col("__n_tp").cast("double")
        + varm("q_ta", "s_ta", "n_ta") / F.col("__n_ta").cast("double")
        + varm("q_cp", "s_cp", "n_cp") / F.col("__n_cp").cast("double")
        + varm("q_ca", "s_ca", "n_ca") / F.col("__n_ca").cast("double")
    )
    se = F.when(all_n2 & (var >= 0), F.sqrt(var))
    any_n0 = (
        (F.col("__n_tp") > 0)
        & (F.col("__n_ta") > 0)
        & (F.col("__n_cp") > 0)
        & (F.col("__n_ca") > 0)
    )
    did_g = F.when(any_n0, did)
    return acc.select(
        F.col("__n_tp").alias("n_treated_pre"),
        F.col("__n_ta").alias("n_treated_post"),
        F.col("__n_cp").alias("n_control_pre"),
        F.col("__n_ca").alias("n_control_post"),
        F.round(F.when(F.col("__n_tp") > 0, m_tp), 6).alias(
            "mean_treated_pre"
        ),
        F.round(F.when(F.col("__n_ta") > 0, m_ta), 6).alias(
            "mean_treated_post"
        ),
        F.round(F.when(F.col("__n_cp") > 0, m_cp), 6).alias(
            "mean_control_pre"
        ),
        F.round(F.when(F.col("__n_ca") > 0, m_ca), 6).alias(
            "mean_control_post"
        ),
        F.round(did_g, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did_g - F.lit(1.959963985) * se, 6).alias("ci_lo"),
        F.round(did_g + F.lit(1.959963985) * se, 6).alias("ci_hi"),
    )


def proportion_power_mde(
    df: DataFrame,
    unit_col: str,
    outcome_col: str,
    alpha_z: float = 1.959963985,
    power_z: float = 0.841621234,
) -> DataFrame:
    """Experiment planning from the observed baseline: given the
    current per-unit conversion rate p̂ and an even 50/50 split of the
    observed population, the minimum detectable ABSOLUTE effect at the
    classic two-proportion z-test operating point —
    MDE = (z_{α/2} + z_β)·√(2·p̂(1−p̂)/n_arm) — the "is this experiment
    even worth running" number every A/B test needs BEFORE
    two_proportion_ztest reads its result. Returns ONE row: (n_units,
    n_per_arm, base_rate, mde_abs, mde_rel); NULL MDE when the
    baseline degenerates (p̂ ∈ {0, 1} — no binomial variance to power
    against) or the population is empty.

    The z constants default to α = 0.05 two-sided (1.959963985 — the
    diff_in_diff literal) and power = 0.80 (0.841621234); both are
    passed as LITERALS into the plan so any engine replays the exact
    double arithmetic. Decomposition: one per-unit boolean-max
    collapse (a unit converts if ANY of its rows did — the
    two_proportion complete-case convention on the cast flag), one
    scalar aggregation; nothing downstream of the unit table.
    """
    flag = F.col(outcome_col).try_cast("boolean")
    per = (
        df.filter(F.col(unit_col).isNotNull() & flag.isNotNull())
        .groupBy(F.col(unit_col).alias("__u"))
        .agg(F.max(flag.cast("int")).alias("__c"))
    )
    acc = per.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__c").alias("__conv"),
    )
    n = F.col("n_units").cast("double")
    n_arm = F.floor(F.col("n_units") / 2).cast("bigint")
    p = F.col("__conv").cast("double") / n
    mde = F.when(
        (F.col("n_units") >= 2) & (p > 0) & (p < 1),
        F.lit(float(alpha_z) + float(power_z))
        * F.sqrt(2.0 * p * (1.0 - p) / n_arm.cast("double")),
    )
    return acc.select(
        F.col("n_units").cast("bigint").alias("n_units"),
        n_arm.alias("n_per_arm"),
        F.round(F.when(F.col("n_units") > 0, p), 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(F.when(p > 0, mde / p), 6).alias("mde_rel"),
    )


def wilson_ci(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z: float = 1.959963985,
) -> DataFrame:
    """Per-group Wilson score interval for a binomial rate — the
    CI that stays inside [0, 1] and behaves at small n / extreme p
    where the naive Wald interval collapses (the dashboard-grade
    uncertainty band for per-segment conversion/defect rates; Brown,
    Cai & DasGupta 2001 recommend it as the default). Returns one row
    per group: (group, n, successes, rate, ci_lo, ci_hi); CI NULL for
    empty groups (never happens — groups come from observed rows —
    but guarded for n = 0 anyway).

    Decomposition: ONE per-group (n, k) collapse (complete-case on
    the try_cast boolean, the two_proportion convention); the Wilson
    arithmetic — center (p̂ + z²/2n)/(1 + z²/n), half-width
    z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n) — is a scalar double
    expression over the two integers, with z passed as a LITERAL so
    any engine replays it exactly.
    """
    flag = F.col(success_col).try_cast("boolean")
    base = df.filter(F.col(group_col).isNotNull() & flag.isNotNull())
    per = base.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(flag.cast("bigint")).alias("successes"),
    )
    zl = F.lit(float(z))
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    denom = 1.0 + zl * zl / n
    center = (p + zl * zl / (2.0 * n)) / denom
    half = (
        zl
        * F.sqrt(p * (1.0 - p) / n + zl * zl / (4.0 * n * n))
        / denom
    )
    return per.select(
        "group",
        F.col("n").cast("bigint").alias("n"),
        F.col("successes").cast("bigint").alias("successes"),
        F.round(F.when(F.col("n") > 0, p), 6).alias("rate"),
        F.round(F.when(F.col("n") > 0, center - half), 6).alias("ci_lo"),
        F.round(F.when(F.col("n") > 0, center + half), 6).alias("ci_hi"),
    )
