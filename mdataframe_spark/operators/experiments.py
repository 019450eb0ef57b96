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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
