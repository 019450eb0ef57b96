"""Time-series analytics over bucketed event streams: autocorrelation,
CUSUM changepoint scan, truncated exponentially-weighted smoothing.

These close the classic "is my metric drifting / periodic / smoothed"
battery that product-analytics engines expose next to funnels and
rate anomalies (reference scope: mdataframe's transformation verbs,
ref transformations.py, have no time-series surface — this is part of
the large-scale pipeline extension, same status as operators/events.py).

Scale shape shared by all three: the corpus collapses in ONE
partial-agged groupBy(bucket) — everything downstream runs on the
series table, whose size is time-span/period (model-bounded: a year of
hourly buckets is 8,760 rows no matter how many trillion events fed
them). The only windows are over that bounded series (the spearman
rank-table justification); joins are lag-explodes of a constant-size
lag list.

Determinism contract (the OLS/spearman discipline): per-bucket values
are EXACT DECIMALS (counts, or value sums rounded to 4 dp), every
accumulation is a decimal sum (order-independent, replayed exactly by
the DuckDB oracles), and mean-centering is algebraically eliminated
(Σ(x−m)(y−m) = Σxy − m·Σx − m·Σy + n·m²) so no engine ever subtracts
a float mean inside an aggregate. Final statistics are scalar double
arithmetic on identical decimal inputs, rounded to 6 dp.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .events import _bucket, _ns

_NS_PER_HOUR = 3_600_000_000_000


def bucket_series(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
) -> DataFrame:
    """Collapse an event stream to its bucketed series: (bucket, x)
    with x = row count (``value_col=None``) or the per-bucket value sum
    rounded to 4 dp — in BOTH cases an exact DECIMAL(18,4), so every
    downstream accumulation is order-independent. Empty/NULL-value rows
    are excluded when a value column is used (complete-case, one
    denominator — the events.py convention). The ONE corpus-scale
    shuffle of the whole module happens here (partial-agged groupBy)."""
    d = _ns(df, ts_col)
    b = _bucket(ts_col, period_ns).alias("bucket")
    if value_col is None:
        agg = d.groupBy(b).agg(
            F.count(F.lit(1)).cast("decimal(18,4)").alias("x")
        )
    else:
        agg = (
            d.filter(F.col(value_col).isNotNull())
            .groupBy(b)
            .agg(
                F.round(F.sum(F.col(value_col).cast("double")), 4)
                .cast("decimal(18,4)")
                .alias("x")
            )
        )
    return agg


def acf_lags(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    max_lag: int = 6,
    series: DataFrame | None = None,
) -> DataFrame:
    """Sample autocorrelation of the bucketed series at lags 1..k:
    r_k = Σ(x_t − m)(x_{t+k} − m) / Σ(x_t − m)² with m the full-series
    mean (the standard ACF estimator; pairs where bucket t+k has no
    events are skipped — gaps are absent rows, not zeros). Returns
    (lag, n_pairs, acf) ordered by lag.

    Mean-centering is expanded algebraically: the per-lag pieces
    (Σx_t·x_{t+k}, Σx_t, Σx_{t+k}, n_pairs over the joined pairs) and
    the global pieces (n, Σx, Σx²) are all exact decimal sums; the
    final r_k is one scalar double expression over them. The lag join
    is series ⋈ series on bucket+k — the series is model-bounded, so
    Catalyst broadcasts it. Pass ``series`` (a prebuilt, typically
    persisted :func:`bucket_series` frame) to share ONE corpus
    collapse with a composing caller (:func:`ljung_box`)."""
    s = (
        series
        if series is not None
        else bucket_series(df, ts_col, value_col, period_ns)
    )
    glob = s.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("x").alias("__sx"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
    )
    lags = s.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = s.select(F.col("bucket").alias("__ba"), F.col("x").alias("__xa"))
    b = s.select(F.col("bucket").alias("__bb"), F.col("x").alias("__xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("__bb") == F.col("__ba") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("__np"),
            F.sum(F.col("__xa") * F.col("__xb")).alias("__sab"),
            F.sum("__xa").alias("__sa"),
            F.sum("__xb").alias("__sb"),
        )
    )
    m = F.col("__sx").cast("double") / F.col("__n")
    num = (
        F.col("__sab").cast("double")
        - m * F.col("__sa").cast("double")
        - m * F.col("__sb").cast("double")
        + F.col("__np") * m * m
    )
    den = F.col("__sxx").cast("double") - F.col("__n") * m * m
    return (
        pairs.crossJoin(F.broadcast(glob))
        .select(
            "lag",
            F.col("__np").cast("bigint").alias("n_pairs"),
            F.when(den > 0, F.round(num / den, 6)).alias("acf"),
        )
        .orderBy("lag")
    )


def cross_correlation(
    df_x: DataFrame,
    df_y: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    max_lag: int = 6,
) -> DataFrame:
    """Sample cross-correlation (CCF) between two bucketed event
    series at lags −k..k: r_k = Pearson correlation of the pairs
    (x_t, y_{t+k}) over the buckets where BOTH series have data —
    "does the views series lead the purchases series, and by how many
    hours?", the two-stream companion of :func:`acf_lags` (positive
    lag = x leads y). Returns EXACTLY 2k+1 rows (lag, n_pairs, ccf)
    ordered by lag — a lag with no aligned buckets keeps its spine
    row with n_pairs 0 (round-13 review fix: the inner series join
    used to drop it); ccf NULL when either side's variance over the
    shared buckets degenerates or fewer than 2 pairs align.

    Decomposition (the acf_lags conventions): each stream collapses
    once via :func:`bucket_series` (exact DECIMAL(18,4) per-bucket
    sums — the only corpus-scale shuffles); the lag spine is a
    2k+1-row range crossed against the model-bounded series, the
    pair join is series ⋈ series on bucket+lag (Catalyst broadcasts
    both sides), and the per-lag Pearson pieces (n, Σx, Σy, Σxy, Σx²,
    Σy²) are exact decimal sums with ONE final double expression per
    lag, rounded 6 dp — engine-exact. Unlike the ACF (whose
    denominator is the full-series variance), the CCF here uses the
    textbook PAIRED estimator: moments over the aligned pairs only,
    so absent buckets (gaps are absent rows, not zeros) never bias
    the means.

    Extends the reference's capability surface (no cross-stream
    statistics in MarcoMernberger/mdataframe; its pandas users would
    call Series.corr on shifted frames driver-side)."""
    sx = bucket_series(df_x, ts_col, value_col, period_ns)
    sy = bucket_series(df_y, ts_col, value_col, period_ns)
    lags = sx.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = sx.select(F.col("bucket").alias("__ba"), F.col("x").alias("__xa"))
    b = sy.select(F.col("bucket").alias("__bb"), F.col("x").alias("__xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("__bb") == F.col("__ba") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("__np"),
            F.sum("__xa").alias("__sa"),
            F.sum("__xb").alias("__sb"),
            F.sum(F.col("__xa") * F.col("__xb")).alias("__sab"),
            F.sum(F.col("__xa") * F.col("__xa")).alias("__saa"),
            F.sum(F.col("__xb") * F.col("__xb")).alias("__sbb"),
        )
    )
    n = F.col("__np").cast("double")
    num = n * F.col("__sab").cast("double") - F.col("__sa").cast(
        "double"
    ) * F.col("__sb").cast("double")
    vx = n * F.col("__saa").cast("double") - F.col("__sa").cast(
        "double"
    ) * F.col("__sa").cast("double")
    vy = n * F.col("__sbb").cast("double") - F.col("__sb").cast(
        "double"
    ) * F.col("__sb").cast("double")
    return (
        lags.join(pairs, "lag", "left")
        .select(
            "lag",
            F.coalesce(F.col("__np"), F.lit(0)).cast("bigint").alias(
                "n_pairs"
            ),
            F.when(
                (F.col("__np") >= 2) & (vx > 0) & (vy > 0),
                F.round(num / F.sqrt(vx * vy), 6),
            ).alias("ccf"),
        )
        .orderBy("lag")
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
) -> DataFrame:
    """CUSUM changepoint scan: S_t = Σ_{i≤t} x_i − t·m over the
    bucketed series (m = series mean). The bucket with the largest |S_t|
    is the classic single-changepoint estimate (Page's CUSUM / binary
    segmentation's first cut). Returns per-bucket
    (bucket, x, cusum, is_changepoint) ordered by bucket, with
    is_changepoint true exactly once (max |S_t|, ties → lowest bucket).

    The cumulative sum is an exact decimal window over the
    model-bounded series (single-partition by construction — the
    spearman rank-table justification: the series, not the corpus);
    t·m is rank × (Σx/n) in scalar double arithmetic, so both engines
    replay S_t identically."""
    s = bucket_series(df, ts_col, value_col, period_ns)
    glob = s.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("x").alias("__sx")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = F.col("__sx").cast("double") / F.col("__n")
    cum = (
        s.crossJoin(F.broadcast(glob))
        .withColumn("__cs", F.sum("x").over(w))
        .withColumn("__t", F.row_number().over(Window.orderBy("bucket")))
        .select(
            "bucket",
            F.col("x").cast("double").alias("x"),
            F.round(F.col("__cs").cast("double") - F.col("__t") * m, 6).alias(
                "cusum"
            ),
        )
    )
    peak = cum.agg(
        F.min(
            F.struct(
                (-F.abs(F.col("cusum"))).alias("__negabs"),
                F.col("bucket").alias("__b"),
            )
        ).alias("__peak")
    )
    return (
        cum.crossJoin(F.broadcast(peak))
        .select(
            "bucket",
            "x",
            "cusum",
            (F.col("bucket") == F.col("__peak.__b")).alias("is_changepoint"),
        )
        .orderBy("bucket")
    )


def ewma_weights(alpha: float, max_lag: int) -> list[str]:
    """The truncated-EWMA weight ladder (1−α)^k for k = 0..max_lag as
    EXACT decimal strings (α must have ≤4 decimal digits so the powers
    stay exact). ONE implementation shared by the Spark plan and the
    SQL-oracle builder — both sides embed the same literals, so there
    is no pow()-ulp divergence between engines."""
    base = Decimal(str(alpha))
    if base != base.quantize(Decimal("0.0001")):
        raise ValueError("alpha must have at most 4 decimal digits")
    one = Decimal(1)
    w = one - base
    out = []
    for k in range(max_lag + 1):
        out.append(str(w**k))
    return out


def ewma_smooth(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    alpha: float = 0.3,
    max_lag: int = 12,
) -> DataFrame:
    """Truncated exponentially-weighted moving average of the bucketed
    series: y_b = Σ_{k=0..L} w_k·x_{b−k} / Σ_{k present} w_k with
    w_k = (1−α)^k, the adjust=True EWM estimator cut off at L lags
    (beyond L=12 at α=0.3 the dropped tail weight is (1−α)^13 < 1%).
    Missing buckets contribute neither numerator nor denominator.
    Returns (bucket, n_terms, ewma) ordered by bucket.

    Truncation is what makes this distributable AND exact: the full
    recursive EWM needs either a sequential scan or (1−α)^(−i) rescaling
    that overflows doubles, while the truncated form is a constant-size
    lag-explode join — per-term products of exact decimals (weights from
    :func:`ewma_weights`, x from :func:`bucket_series`), summed as
    decimals, one double division at the end."""
    s = bucket_series(df, ts_col, value_col, period_ns)
    weights = ewma_weights(alpha, max_lag)
    # minimal decimal type for the ladder: product precision is
    # 18 (x) + prec (w), and Spark silently ROUNDS decimal products
    # past precision 38 (DuckDB keeps them exact) — so the ladder must
    # stay narrow enough that both engines multiply exactly
    frac = max(len(w.split(".")[1]) if "." in w else 0 for w in weights)
    prec = frac + 2
    # Spark's multiply-result precision is p1 + p2 + 1 (the carry
    # digit), so the guard must include the +1: at 18 + prec == 38 the
    # x*w product is precision 39 and Spark silently rounds while
    # DuckDB stays exact — voiding the oracle-parity contract
    if 18 + prec + 1 > 38:
        raise ValueError(
            f"ewma_smooth: weight ladder needs DECIMAL({prec},{frac}); "
            f"the x*w product would exceed decimal precision 38 — lower "
            f"max_lag or use an alpha with fewer decimal digits"
        )
    wlad = s.sparkSession.createDataFrame(
        [(k, Decimal(w)) for k, w in enumerate(weights)],
        f"lag INT, w DECIMAL({prec},{frac})",
    )
    targets = s.select(F.col("bucket").alias("__tb"))
    contrib = (
        s.crossJoin(F.broadcast(wlad))
        .select(
            (F.col("bucket") + F.col("lag")).alias("__tb"),
            (F.col("x") * F.col("w")).alias("__wx"),
            F.col("w").alias("__w"),
        )
        .join(F.broadcast(targets), "__tb")
        .groupBy("__tb")
        .agg(
            F.count(F.lit(1)).alias("__nt"),
            F.sum("__wx").alias("__swx"),
            F.sum("__w").alias("__sw"),
        )
    )
    return contrib.select(
        F.col("__tb").alias("bucket"),
        F.col("__nt").cast("bigint").alias("n_terms"),
        F.round(
            F.col("__swx").cast("double") / F.col("__sw").cast("double"), 6
        ).alias("ewma"),
    ).orderBy("bucket")


def seasonal_naive_mase(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    season_lag: int = 24,
) -> DataFrame:
    """Seasonality-strength diagnostic on the bucketed series: the
    MASE-style ratio of the one-step naive forecast's MAE to the
    seasonal-naive forecast's MAE,
    mase = mean|x_b − x_{b−1}| / mean|x_b − x_{b−season_lag}|.
    A ratio well above 1 means the season-ago value predicts the
    series better than the last observation — strong seasonality at
    ``season_lag`` buckets; ≈1 means none. Returns ONE row:
    (n_naive, n_seasonal, mae_naive, mae_seasonal, mase); mase NULL
    when the seasonal MAE is zero or either term set is empty.

    Each forecast's error set is complete-case over the bucket pairs
    that BOTH exist (missing buckets contribute no term — the
    ewma_smooth convention), so the two means may run over different
    counts; both counts are reported.

    Plan shape: the corpus collapses once in :func:`bucket_series`
    (exact DECIMAL cells); the two lag comparisons are equi-joins of
    the bucket table against itself on (bucket − lag) — bucket-
    bounded, no windows, no global sort. The |diff| terms are exact
    decimal subtractions summed as decimals; the two divisions and
    the final ratio are the only double arithmetic, rounded 6 dp.
    """
    if season_lag < 2:
        raise ValueError("seasonal_naive_mase: season_lag must be >= 2")
    s = bucket_series(df, ts_col, value_col, period_ns)
    cur = s.select(F.col("bucket").alias("__b"), F.col("x").alias("__x"))

    def _mae(lag: int, nname: str, mname: str) -> DataFrame:
        prev = s.select(
            (F.col("bucket") + lag).alias("__b"), F.col("x").alias("__p")
        )
        return cur.join(prev, "__b").agg(
            F.count(F.lit(1)).cast("bigint").alias(nname),
            F.sum(F.abs(F.col("__x") - F.col("__p"))).alias(mname),
        )

    naive = _mae(1, "n_naive", "__s1")
    seasonal = _mae(int(season_lag), "n_seasonal", "__ss")
    acc = naive.crossJoin(seasonal)
    mae1 = F.col("__s1").cast("double") / F.col("n_naive")
    maes = F.col("__ss").cast("double") / F.col("n_seasonal")
    return acc.select(
        "n_naive",
        "n_seasonal",
        F.round(F.when(F.col("n_naive") > 0, mae1), 6).alias("mae_naive"),
        F.round(F.when(F.col("n_seasonal") > 0, maes), 6).alias(
            "mae_seasonal"
        ),
        F.round(
            F.when(
                (F.col("n_naive") > 0) & (F.col("n_seasonal") > 0)
                & (maes > 0),
                mae1 / maes,
            ),
            6,
        ).alias("mase"),
    )


def mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    with_p: bool = True,
) -> DataFrame:
    """Mann-Kendall trend test on the bucketed series: S = Σ_{i<j}
    sgn(x_j − x_i) over time-ordered buckets, tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    continuity-corrected z — the standard nonparametric "is this
    metric monotonically drifting" answer (no linearity or normality
    assumed; the CUSUM scan finds WHERE, this says WHETHER). Returns
    ONE row: (n, s_stat, var_s, z); z NULL when the variance
    degenerates (all values tied or n < 2).

    Plan shape: the corpus collapses once in :func:`bucket_series`;
    the pair comparison is an inequality self-join of the SERIES table
    (time-span-bounded², never corpus²) producing exact integer sign
    sums; ties aggregate over the distinct-value blocks. All double
    arithmetic is scalar over exact integers, rounded 6 dp.
    """
    s = bucket_series(df, ts_col, value_col, period_ns)
    a = s.select(F.col("bucket").alias("__ba"), F.col("x").alias("__xa"))
    b = s.select(F.col("bucket").alias("__bb"), F.col("x").alias("__xb"))
    pairs = a.join(b, F.col("__bb") > F.col("__ba")).agg(
        F.sum(
            F.when(F.col("__xb") > F.col("__xa"), 1)
            .when(F.col("__xb") < F.col("__xa"), -1)
            .otherwise(0)
        ).cast("bigint").alias("s_stat")
    )
    ties = (
        s.groupBy("x")
        .agg(F.count(F.lit(1)).alias("__t"))
        .agg(
            F.count(F.lit(1)).alias("__nv"),
            F.sum("__t").alias("__n"),
            F.sum(
                F.col("__t").cast("decimal(38,0)")
                * (F.col("__t") - 1)
                * (2 * F.col("__t") + 5)
            ).alias("__tie"),
        )
    )
    acc = pairs.crossJoin(F.broadcast(ties))
    n = F.col("__n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__tie").cast("double")
    ) / 18.0
    sc = F.col("s_stat").cast("double")
    z = F.when(
        (F.col("__n") >= 2) & (var_s > 0),
        F.when(F.col("s_stat") > 0, (sc - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sc + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    out = acc.select(
        F.col("__n").cast("bigint").alias("n"),
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )
    if with_p:
        from .stats_tests import _z_p

        out = out.withColumn("p_value", _z_p(F.col("z")))
    return out


def theil_sen(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
) -> DataFrame:
    """Theil-Sen robust trend line over the bucketed series: slope =
    median of all pairwise slopes (x_j − x_i)/(b_j − b_i), intercept =
    median of (x_i − slope·b_i) — the 29%-breakdown alternative to OLS
    for drifting metrics with outlier spikes (one wild hour corrupts a
    least-squares slope; it is one vote among n²/2 here). Returns ONE
    row: (n_points, n_pairs, slope, intercept); NULL slope when the
    series has < 2 points.

    Plan shape: one :func:`bucket_series` collapse; the pair-slope
    set is an inequality self-join of the series table (time-span-
    bounded², never corpus²); both medians are exact ``percentile``
    aggregations (the f13/e_latency interpolation-parity convention).
    The slope is rounded to 6 dp BEFORE the residual median, so both
    engines compute residuals from the identical literal.
    """
    s = bucket_series(df, ts_col, value_col, period_ns)
    a = s.select(F.col("bucket").alias("__ba"), F.col("x").alias("__xa"))
    b = s.select(F.col("bucket").alias("__bb"), F.col("x").alias("__xb"))
    slopes = a.join(b, F.col("__bb") > F.col("__ba")).select(
        (
            (F.col("__xb") - F.col("__xa")).cast("double")
            / (F.col("__bb") - F.col("__ba")).cast("double")
        ).alias("__m")
    )
    med = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.expr("percentile(__m, 0.5)"), 6).alias("slope"),
    )
    resid = (
        s.crossJoin(F.broadcast(med))
        .withColumn(
            "__r",
            F.col("x").cast("double") - F.col("slope") * F.col("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.first("n_pairs").alias("n_pairs"),
            F.first("slope").alias("slope"),
            F.round(F.expr("percentile(__r, 0.5)"), 6).alias("intercept"),
        )
    )
    return resid.select("n_points", "n_pairs", "slope", "intercept")


def page_hinkley(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    delta: float = 0.0,
    lam: float = 50.0,
) -> DataFrame:
    """Page-Hinkley drift detector over the bucketed series — the
    sequential "has the mean shifted UP?" monitor (Page 1954, the
    streaming-drift standard next to the CUSUM single-changepoint
    scan): U_t = Σ_{i≤t} (x_i − m_i − δ) with m_i the RUNNING prefix
    mean, PH_t = U_t − min_{s≤t} U_s, alarm when PH_t > λ. Returns
    per-bucket (bucket, x, u, ph, alarm) ordered by bucket.

    Determinism: the prefix means derive from the exact decimal
    cumulative sum (x_i − m_i = d_i/i with d_i = x_i·i − CS_i exact
    decimals, one double division per step); the U cumulative and
    running-min windows then fold the IDENTICAL double sequence in the
    IDENTICAL bucket order in both engines (the KM ordered-fold
    argument — correctly-rounded IEEE ops in the same sequence), so
    alarms compare bit-for-bit. Outputs round to 6 dp AFTER the alarm
    compare. The series is model-bounded (the bucket_series
    single-shuffle contract); the windows are single-partition by
    construction — series-sized, never corpus-sized.
    """
    s = bucket_series(df, ts_col, value_col, period_ns)
    wo = Window.orderBy("bucket")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        s.withColumn("__cs", F.sum("x").over(w))
        .withColumn("__i", F.row_number().over(wo))
        .withColumn(
            "__dev",
            # (23,4) x int(10,0) -> precision 34: exact, no 38-cap
            # reduction (the ewma precision-rule lesson)
            (
                F.col("x").cast("decimal(23,4)") * F.col("__i")
                - F.col("__cs")
            ).cast("double")
            / F.col("__i")
            - F.lit(float(delta)),
        )
        .withColumn("__u", F.sum("__dev").over(w))
        .withColumn("__runmin", F.min("__u").over(w))
        .withColumn("__ph", F.col("__u") - F.col("__runmin"))
    )
    return cum.select(
        "bucket",
        F.col("x").cast("double").alias("x"),
        F.round(F.col("__u"), 6).alias("u"),
        F.round(F.col("__ph"), 6).alias("ph"),
        (F.col("__ph") > F.lit(float(lam))).alias("alarm"),
    ).orderBy("bucket")


def ljung_box(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    max_lag: int = 6,
    with_p: bool = True,
) -> DataFrame:
    """Ljung-Box portmanteau test — "is the series white noise?": the
    joint read-out over :func:`acf_lags`'s per-lag autocorrelations,
    Q = n(n+2)·Σ_{k≤h} r_k²/(n−k), chi²(h) under the null. One
    significant r_k says "structure at lag k"; Q says whether the
    autocorrelation STRUCTURE as a whole is real — the standard
    residual-whiteness gate after any forecast fit (the MASE
    companion). Returns ONE row: (n, h, q_stat); Q NULL when the
    series is shorter than max_lag + 1 or every value is tied (no
    variance). Gap buckets are absent rows (the acf_lags convention).

    Decomposition: the acf_lags 6-dp per-lag table (model-bounded: h
    rows) plus the series length — Q is one sum over it, rounded 6 dp;
    everything replays exactly in SQL over the same lag pieces.
    """
    from ..cache import persist_tracked

    # ONE corpus collapse: the persisted series feeds acf_lags' lag
    # join, its global moments, AND the length probe here
    s = persist_tracked(bucket_series(df, ts_col, value_col, period_ns))
    ac = acf_lags(df, ts_col, value_col, period_ns, max_lag, series=s)
    glob = s.agg(F.count(F.lit(1)).alias("__n"))
    # n rides OUTSIDE the lag aggregation (second crossJoin): with an
    # empty lag table (single-bucket series) first("__n") over the
    # empty frame would be NULL while the series length is a real 1 —
    # the oracle takes n from the series moments, so must Spark
    # (review finding, round 12)
    acc = (
        ac.crossJoin(F.broadcast(glob))
        .agg(
            F.count(F.when(F.col("acf").isNotNull(), 1)).alias("__h"),
            F.sum(
                F.col("acf")
                * F.col("acf")
                / (F.col("__n").cast("double") - F.col("lag"))
            ).alias("__s"),
        )
        .crossJoin(F.broadcast(glob))
    )
    n = F.col("__n").cast("double")
    q = F.when(
        (F.col("__h") >= max_lag) & (F.col("__n") > max_lag),
        n * (n + 2.0) * F.col("__s"),
    )
    out = acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__h").cast("bigint").alias("h"),
        F.round(q, 6).alias("q_stat"),
    )
    if with_p:
        from .stats_tests import _chi2_p

        out = out.withColumn(
            "p_value",
            F.round(_chi2_p(F.col("q_stat"), F.col("h").cast("double")), 6),
        )
    return out


def durbin_watson(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
) -> DataFrame:
    """Durbin-Watson first-order autocorrelation statistic over the
    mean-centered bucketed series: DW = Σ_t (d_t − d_{t−1})² / Σ_t d_t²
    with d = x − x̄, over CONSECUTIVE present buckets (gaps are absent
    rows and contribute no difference term — the acf_lags convention).
    DW ≈ 2 means no lag-1 autocorrelation, → 0 positive, → 4 negative
    — the one-number residual-independence check next to
    :func:`ljung_box`'s joint test. Returns ONE row: (n, n_pairs, dw);
    NULL when the variance degenerates.

    Decomposition: mean-centering expands algebraically (the module
    convention); the squared step accumulates as EXACT SCALED INTEGERS
    (the gini convention): (x_t − x_{t−1})·10⁴ is an exact
    decimal(19,0) integer, its square exact decimal(38,0) — scale-0
    decimals never lose fractional digits to Spark's 38-precision cap
    (a direct decimal square rounded sub-1e-7 steps to zero; review
    finding, round 12) — and the sum divides by 10⁸ once at the end.
    The global pass gives n, Σx, Σx²; DW's
    numerator needs no mean at all ((d_t − d_{t−1}) = (x_t − x_{t−1}))
    and the denominator is Σx² − n·x̄². ONE corpus collapse + one
    model-bounded self-join.
    """
    s = bucket_series(df, ts_col, value_col, period_ns)
    from ..cache import persist_tracked

    s = persist_tracked(s)
    a = s.select(F.col("bucket").alias("__ba"), F.col("x").alias("__xa"))
    b = s.select(F.col("bucket").alias("__bb"), F.col("x").alias("__xb"))
    # the squared step rides the SCALED-INTEGER grid (the gini
    # convention): a direct (xb − xa)² would widen decimal(18,4) to
    # (19,4)², overflow Spark's 38-precision cap down to scale 7, and
    # silently round a 1e-8 step (two 4-dp values 0.0001 apart) to
    # ZERO — reproduced in review; the expanded-moments form rescales
    # the same way on the ×2 term. Scale-0 decimals never lose
    # fractional digits to the cap: diff·10⁴ is an exact integer in
    # decimal(19,0), its square is exact in decimal(38,0), and the
    # sum divides back by 10⁸ once at the end — the oracle replays
    # the identical scaled arithmetic.
    dsc = (
        (F.col("__xb") - F.col("__xa")) * 10000
    ).cast("decimal(19,0)")
    pairs = a.join(
        F.broadcast(b), F.col("__bb") == F.col("__ba") + 1
    ).agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum(dsc * dsc).alias("__sd2"),
    )
    glob = s.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("x").alias("__sx"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
    )
    acc = pairs.crossJoin(F.broadcast(glob))
    n = F.col("__n").cast("double")
    m = F.col("__sx").cast("double") / n
    den = F.col("__sxx").cast("double") - n * m * m
    return acc.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__np").cast("bigint").alias("n_pairs"),
        F.round(
            F.when(
                (den > 0) & (F.col("__np") > 0),
                (F.col("__sd2").cast("double") / 100000000.0) / den,
            ),
            6,
        ).alias("dw"),
    )


def seasonal_strength(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    period_ns: int = _NS_PER_HOUR,
    cycle: int = 24,
) -> DataFrame:
    """Seasonal strength of the bucketed series — "how much of the
    variance is the daily shape": the hour-of-cycle ANOVA
    decomposition SST = SSB + SSW over buckets grouped by
    bucket mod ``cycle``, with strength = SSB/SST (the eta² of the
    seasonal factor — 0 means the cycle explains nothing, near 1
    means the series IS its seasonal profile). The one-number
    forecasting audit beside :func:`seasonal_naive_mase`: a high
    strength says the seasonal-naive baseline is the one to beat.
    Returns ONE row: (n_buckets, n_phases, var_total, var_within,
    seasonal_strength); NULL when the variance degenerates.

    Decomposition: ONE corpus collapse (bucket_series) + one
    cycle-bounded groupBy(phase) with exact decimal moments (sums
    decimal(18,4), squares (37,8) — the anova convention); SSB falls
    out as SST − SSW, all scalar doubles over the ≤cycle-row table,
    rounded 6 dp.
    """
    if cycle < 2:
        raise ValueError("seasonal_strength: need cycle >= 2")
    s = bucket_series(df, ts_col, value_col, period_ns)
    per = s.groupBy(
        F.pmod(F.col("bucket"), F.lit(cycle)).alias("__phase")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("x").alias("__s1"),
        F.sum(F.col("x") * F.col("x")).alias("__s2"),
    )
    acc = per.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__n").alias("__nn"),
        F.sum("__s1").alias("__t1"),
        F.sum("__s2").alias("__t2"),
        F.sum(
            F.col("__s2").cast("double")
            - F.col("__s1").cast("double")
            * F.col("__s1").cast("double")
            / F.col("__n")
        ).alias("__ssw"),
    )
    nn = F.col("__nn").cast("double")
    sst = (
        F.col("__t2").cast("double")
        - F.col("__t1").cast("double") * F.col("__t1").cast("double") / nn
    )
    ssw = F.col("__ssw")
    return acc.select(
        F.col("__nn").cast("bigint").alias("n_buckets"),
        F.col("__k").cast("bigint").alias("n_phases"),
        F.round(F.when(F.col("__nn") > 1, sst / (nn - 1.0)), 6).alias(
            "var_total"
        ),
        F.round(
            F.when(F.col("__nn") > F.col("__k"), ssw / (nn - F.col("__k"))),
            6,
        ).alias("var_within"),
        F.round(
            F.when(sst > 0, (sst - ssw) / sst), 6
        ).alias("seasonal_strength"),
    )
