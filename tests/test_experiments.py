"""Unit tests for the round-10 experimentation & drift wave:
two_proportion_ztest, cuped_adjust, srm_check, wasserstein_1d — each
pinned against a definitional replay on fixtures."""

import math

import numpy as np
import pytest

from mdataframe_spark.operators.experiments import (
    cuped_adjust,
    srm_check,
    two_proportion_ztest,
)
from mdataframe_spark.operators.stats_tests import wasserstein_1d


# --- two-proportion z ------------------------------------------------

def test_two_proportion_matches_closed_form(spark):
    rows = [(True, 1)] * 30 + [(True, 0)] * 70 + [(False, 1)] * 20 + [
        (False, 0)
    ] * 80
    df = spark.createDataFrame(rows, "g BOOLEAN, s INT")
    r = two_proportion_ztest(df, "g", "s").collect()[0]
    assert (r["n1"], r["x1"], r["n2"], r["x2"]) == (100, 30, 100, 20)
    assert r["rate1"] == 0.3 and r["rate2"] == 0.2
    assert r["lift"] == pytest.approx(0.5, abs=1e-6)
    pp = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert 0.0 < r["p_value"] < 1.0


def test_two_proportion_degenerate_cases(spark):
    # one arm empty -> z NULL
    one_arm = spark.createDataFrame(
        [(True, 1), (True, 0)], "g BOOLEAN, s INT"
    )
    assert two_proportion_ztest(one_arm, "g", "s").collect()[0]["z"] is None
    # everyone converts -> pooled variance 0 -> z NULL
    allconv = spark.createDataFrame(
        [(True, 1), (False, 1)], "g BOOLEAN, s INT"
    )
    assert two_proportion_ztest(allconv, "g", "s").collect()[0]["z"] is None


# --- CUPED -----------------------------------------------------------

def test_cuped_matches_numpy_replay(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(0, 100, 200), 4)
    noise = np.round(rng.normal(0, 5, 200), 4)
    y = np.round(0.8 * x + noise + 10, 4)
    grp = np.where(np.arange(200) % 2 == 0, "A", "B")
    df = spark.createDataFrame(
        [(g, float(a), float(b)) for g, a, b in zip(grp, y, x)],
        "g STRING, y DOUBLE, x DOUBLE",
    )
    out = {r["group"]: r for r in cuped_adjust(df, "y", "x", "g").collect()}
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    for g in ("A", "B"):
        m = grp == g
        assert out[g]["n"] == int(m.sum())
        assert out[g]["mean_raw"] == pytest.approx(y[m].mean(), abs=1e-4)
        assert out[g]["theta"] == pytest.approx(theta, abs=1e-4)
        adj = y[m].mean() - theta * (x[m].mean() - x.mean())
        assert out[g]["mean_adjusted"] == pytest.approx(adj, abs=1e-4)
        corr2 = np.corrcoef(x, y)[0, 1] ** 2
        assert out[g]["var_reduction"] == pytest.approx(corr2, abs=1e-4)
    # the adjustment must shrink the between-run noise while keeping
    # the treatment contrast: a strongly correlated covariate gives a
    # large reduction
    assert out["A"]["var_reduction"] > 0.9


def test_cuped_degenerate_covariate(spark):
    df = spark.createDataFrame(
        [("A", 1.0, 5.0), ("A", 2.0, 5.0), ("B", 3.0, 5.0)],
        "g STRING, y DOUBLE, x DOUBLE",
    )
    out = cuped_adjust(df, "y", "x", "g").collect()
    for r in out:
        assert r["theta"] is None and r["mean_adjusted"] is None
        assert r["mean_raw"] is not None


# --- SRM -------------------------------------------------------------

def test_srm_check_on_design_and_mismatch(spark):
    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "v STRING")
    out = {
        r["group"]: r
        for r in srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()
    }
    assert out["a"]["n_expected"] == 50.0 and out["a"]["chi2_term"] == 0.0
    assert out["a"]["chi2"] == 0.0 and out["a"]["dof"] == 1
    assert out["a"]["p_value"] == 1.0
    skew = spark.createDataFrame([("a",)] * 80 + [("b",)] * 20, "v STRING")
    bad = srm_check(skew, "v", {"a": 0.5, "b": 0.5}).collect()[0]
    # chi2 = (80-50)^2/50 + (20-50)^2/50 = 36
    assert bad["chi2"] == pytest.approx(36.0, abs=1e-6)
    assert bad["p_value"] < 1e-6


def test_srm_check_rejects_unknown_variant_and_bad_weights(spark):
    df = spark.createDataFrame([("a",), ("zzz",)], "v STRING")
    with pytest.raises(ValueError, match="missing from"):
        srm_check(df, "v", {"a": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        srm_check(df, "v", {})


# --- Wasserstein -----------------------------------------------------

def test_wasserstein_shifted_uniform(spark):
    # moving {0,1} onto {1,2} costs exactly 1 per unit of mass
    rows = [(0.0, True), (1.0, True), (1.0, False), (2.0, False)]
    df = spark.createDataFrame(rows, "v DOUBLE, g BOOLEAN")
    r = wasserstein_1d(df, "v", "g").collect()[0]
    assert (r["n1"], r["n2"]) == (2, 2)
    assert r["wasserstein"] == pytest.approx(1.0, abs=1e-6)
    # identical distributions -> 0
    same = spark.createDataFrame(
        [(1.0, True), (2.0, True), (1.0, False), (2.0, False)],
        "v DOUBLE, g BOOLEAN",
    )
    assert wasserstein_1d(same, "v", "g").collect()[0][
        "wasserstein"
    ] == 0.0


def test_wasserstein_matches_sorted_quantile_replay(spark):
    rng = np.random.RandomState(3)
    a = np.round(rng.uniform(0, 10, 40), 2)
    b = np.round(rng.uniform(2, 12, 40), 2)
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    df = spark.createDataFrame(rows, "v DOUBLE, g BOOLEAN")
    got = wasserstein_1d(df, "v", "g").collect()[0]["wasserstein"]
    # equal sample sizes: W1 = mean |sorted_a - sorted_b|
    expect = float(np.mean(np.abs(np.sort(a) - np.sort(b))))
    assert got == pytest.approx(expect, abs=1e-6)


# --- Mann-Kendall / Theil-Sen ---------------------------------------

HOUR_NS = 3_600_000_000_000


def _series_df(spark, counts):
    rows = []
    for b, n in enumerate(counts):
        for j in range(n):
            rows.append((b * HOUR_NS + j * 1_000_000,))
    return spark.createDataFrame(rows, "ts BIGINT")


def _mk_reference(xs):
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
    )
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, var, z


def test_mann_kendall_matches_definitional_replay(spark):
    from mdataframe_spark.operators.timeseries import mann_kendall

    counts = [3, 5, 4, 6, 8, 7, 9, 9, 11, 10]
    df = _series_df(spark, counts)
    r = mann_kendall(df, with_p=False).collect()[0]
    s, var, z = _mk_reference(counts)
    assert r["n"] == len(counts)
    assert r["s_stat"] == s
    assert r["var_s"] == pytest.approx(var, abs=1e-6)
    assert r["z"] == pytest.approx(z, abs=1e-6)
    assert r["z"] > 2  # clearly increasing


def test_mann_kendall_flat_series_z_zero_or_null(spark):
    from mdataframe_spark.operators.timeseries import mann_kendall

    df = _series_df(spark, [4, 4, 4, 4])
    r = mann_kendall(df, with_p=False).collect()[0]
    assert r["s_stat"] == 0
    assert r["z"] is None  # all tied -> zero variance


def test_theil_sen_matches_numpy_replay(spark):
    from mdataframe_spark.operators.timeseries import theil_sen

    counts = [3, 5, 4, 9, 8, 7, 12, 11, 30, 14]  # one outlier spike
    df = _series_df(spark, counts)
    r = theil_sen(df).collect()[0]
    xs = np.array(counts, dtype=float)
    bs = np.arange(len(counts), dtype=float)
    slopes = [
        (xs[j] - xs[i]) / (bs[j] - bs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    slope = round(float(np.median(slopes)), 6)
    assert r["n_points"] == len(counts)
    assert r["n_pairs"] == len(slopes)
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    intercept = float(np.median(xs - slope * bs))
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    # robustness: the outlier must not drag the slope toward OLS
    ols = float(np.polyfit(bs, xs, 1)[0])
    assert abs(r["slope"] - 1.0) < abs(ols - 1.0)
