"""Round-11 wave: survival inference (log-rank, RMST), paired and
count-dispersion tests (McNemar, NB moment fit), experimentation
metrics (winsorized/trimmed means, delta-method ratio CI, covariate
balance, EB rate shrinkage), and corpus-coverage text audits (Chao1 /
Good-Turing, Jensen-Shannon). Each operator is pinned against an
independent plain-Python/numpy computation on hand-checkable data;
the relational oracles live in queries.py (parity-checked at both
SFs)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.experiments import (
    covariate_balance,
    eb_rate_shrinkage,
    ratio_metric_delta,
    winsorized_metrics,
)
from mdataframe_spark.operators.stats_tests import (
    dispersion_nb_fit,
    mcnemar_test,
)
from mdataframe_spark.operators.survival import log_rank_test, rmst
from mdataframe_spark.operators.text import source_token_jsd, vocab_richness

SURV_ROWS = [
    (6.0, 1, True), (6.0, 1, True), (6.0, 1, True), (6.0, 0, True),
    (7.0, 1, True), (9.0, 0, True), (10.0, 1, True), (10.0, 0, True),
    (1.0, 1, False), (1.0, 1, False), (2.0, 1, False), (2.0, 1, False),
    (3.0, 1, False), (4.0, 1, False), (4.0, 1, False), (5.0, 1, False),
]


def _logrank_reference(rows):
    times = sorted(set(t for t, _, _ in rows))
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for d, _, g in rows if d >= t and g)
        n2 = sum(1 for d, _, g in rows if d >= t and not g)
        d1 = sum(1 for d, e, g in rows if d == t and e and g)
        d2 = sum(1 for d, e, g in rows if d == t and e and not g)
        n, dd = n1 + n2, d1 + d2
        if n > 0:
            e1 += dd * n1 / n
        if n > 1:
            v += dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)
        o1 += d1
    return o1, e1, v


def test_log_rank_matches_reference(spark):
    df = spark.createDataFrame(SURV_ROWS, "dur double, ev int, grp boolean")
    row = log_rank_test(df, "dur", "ev", "grp").collect()[0]
    o1, e1, v = _logrank_reference(SURV_ROWS)
    assert row["n1"] == 8 and row["n2"] == 8
    assert row["observed1"] == o1
    assert row["expected1"] == pytest.approx(e1, abs=1e-5)
    assert row["variance"] == pytest.approx(v, abs=1e-5)
    assert row["chi2"] == pytest.approx((o1 - e1) ** 2 / v, abs=1e-4)
    assert row["p_value"] is not None and row["p_value"] < 0.001
    # observed + expected bookkeeping: E1 + E2 = total events
    assert row["expected1"] + row["expected2"] == pytest.approx(
        row["observed1"] + row["observed2"], abs=1e-5
    )


def test_log_rank_identical_groups_is_null_or_tiny(spark):
    # same durations in both arms -> O1 ~= E1, chi2 ~ 0
    rows = [(float(t), 1, g) for t in range(1, 9) for g in (True, False)]
    row = log_rank_test(
        spark.createDataFrame(rows, "dur double, ev int, grp boolean"),
        "dur", "ev", "grp", with_p=False,
    ).collect()[0]
    assert row["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_rmst_hand_value_and_bounds(spark):
    df = spark.createDataFrame(SURV_ROWS, "dur double, ev int, grp boolean")
    r8 = rmst(df, "dur", "ev", tau=8.0).collect()[0]
    assert r8["rmst"] == pytest.approx(4.921875, abs=1e-6)
    assert r8["tau"] == 8.0
    # RMST can never exceed the horizon
    assert 0.0 < r8["rmst"] <= 8.0
    # tau=None integrates to the last step; wider horizons never shrink
    rfull = rmst(df, "dur", "ev").collect()[0]
    r20 = rmst(df, "dur", "ev", tau=20.0).collect()[0]
    assert rfull["tau"] == 10.0
    assert r20["rmst"] >= rfull["rmst"] - 1e-9


def test_mcnemar_hand_value_and_degenerate(spark):
    mc = spark.createDataFrame(
        [(True, True)] * 10
        + [(True, False)] * 6
        + [(False, True)] * 2
        + [(False, False)] * 12,
        "pre boolean, post boolean",
    )
    row = mcnemar_test(mc, "pre", "post").collect()[0]
    assert (row["n"], row["both"], row["neither"]) == (30, 10, 12)
    assert (row["pre_only"], row["post_only"]) == (6, 2)
    assert row["chi2"] == pytest.approx((abs(6 - 2) - 1) ** 2 / 8, abs=1e-9)
    # concordant-only data: nothing to test
    conc = spark.createDataFrame(
        [(True, True)] * 5 + [(False, False)] * 5,
        "pre boolean, post boolean",
    )
    row2 = mcnemar_test(conc, "pre", "post").collect()[0]
    assert row2["chi2"] is None and row2["p_value"] is None


def test_dispersion_nb_poisson_vs_overdispersed(spark):
    rng = np.random.default_rng(11)
    pois = [(int(v),) for v in rng.poisson(5.0, 4000)]
    row = dispersion_nb_fit(
        spark.createDataFrame(pois, "k long"), "k"
    ).collect()[0]
    assert row["fano"] == pytest.approx(1.0, abs=0.15)
    nb = [(int(v),) for v in rng.negative_binomial(2, 0.3, 4000)]
    row2 = dispersion_nb_fit(
        spark.createDataFrame(nb, "k long"), "k"
    ).collect()[0]
    assert row2["overdispersed"] is True and row2["fano"] > 1.5
    # the moment fit reconstructs the variance: v = m + m^2/r
    assert row2["mean"] + row2["mean"] ** 2 / row2["nb_r"] == pytest.approx(
        row2["variance"], rel=1e-4
    )
    assert row2["nb_q"] == pytest.approx(
        row2["mean"] / row2["variance"], abs=1e-6
    )


def test_winsorized_metrics_caps_outlier(spark):
    vals = [float(v) for v in range(1, 21)] + [10000.0]
    df = spark.createDataFrame([("A", v) for v in vals], "g string, x double")
    row = winsorized_metrics(df, "x", "g", lo=0.05, hi=0.95).collect()[0]
    assert row["n"] == 21
    assert row["mean_raw"] == pytest.approx(sum(vals) / 21, abs=1e-4)
    # the cap pulls the winsorized mean 3 orders below the raw mean
    assert row["mean_winsorized"] < 25.0
    assert row["p_lo"] == pytest.approx(np.percentile(vals, 5), abs=1e-4)
    assert row["p_hi"] == pytest.approx(np.percentile(vals, 95), abs=1e-4)
    clipped = np.clip(vals, row["p_lo"], row["p_hi"])
    assert row["mean_winsorized"] == pytest.approx(clipped.mean(), abs=1e-4)
    inside = [v for v in vals if row["p_lo"] <= v <= row["p_hi"]]
    assert row["n_trimmed"] == len(inside)
    assert row["mean_trimmed"] == pytest.approx(
        sum(inside) / len(inside), abs=1e-4
    )
    with pytest.raises(ValueError, match="lo < hi"):
        winsorized_metrics(df, "x", "g", lo=0.9, hi=0.1)


def test_ratio_delta_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = np.round(rng.gamma(2.0, 10.0, 500), 4)
    y = np.round(rng.uniform(1.0, 9.0, 500), 4)
    df = spark.createDataFrame(
        [("A", float(a), float(b)) for a, b in zip(x, y)],
        "g string, x double, y double",
    )
    row = ratio_metric_delta(df, "x", "y", "g").collect()[0]
    r = x.sum() / y.sum()
    n = len(x)
    vxx, vyy = x.var(ddof=1), y.var(ddof=1)
    vxy = np.cov(x, y, ddof=1)[0, 1]
    var = (vxx - 2 * r * vxy + r * r * vyy) / (n * y.mean() ** 2)
    assert row["ratio"] == pytest.approx(r, abs=1e-5)
    assert row["se"] == pytest.approx(math.sqrt(var), abs=1e-5)
    assert row["ci_lo"] == pytest.approx(r - 1.959963985 * math.sqrt(var), abs=1e-4)
    assert row["ci_hi"] == pytest.approx(r + 1.959963985 * math.sqrt(var), abs=1e-4)
    assert row["ci_lo"] < row["ratio"] < row["ci_hi"]


def test_covariate_balance_detects_shift(spark):
    rows = []
    for i in range(400):
        g = i % 2 == 0
        balanced_cov = float((i * 13) % 50)
        shifted_cov = float((i * 7) % 30) + (25.0 if g else 0.0)
        rows.append((g, balanced_cov, shifted_cov))
    df = spark.createDataFrame(rows, "g boolean, ok double, bad double")
    got = {r["covariate"]: r for r in
           covariate_balance(df, ["ok", "bad"], "g").collect()}
    assert got["ok"]["balanced"] is True
    assert abs(got["ok"]["smd"]) < 0.1
    assert got["bad"]["balanced"] is False
    assert abs(got["bad"]["smd"]) > 1.0
    # numpy cross-check on the shifted covariate
    g1 = np.array([r[2] for r in rows if r[0]])
    g2 = np.array([r[2] for r in rows if not r[0]])
    smd = (g1.mean() - g2.mean()) / math.sqrt(
        (g1.var(ddof=1) + g2.var(ddof=1)) / 2
    )
    assert got["bad"]["smd"] == pytest.approx(smd, abs=1e-4)
    with pytest.raises(ValueError, match="at least one covariate"):
        covariate_balance(df, [], "g")


def test_eb_shrinkage_orders_by_evidence(spark):
    # heterogeneous true rates so the prior strength is finite
    rows = [(1, 4, 4), (2, 400, 160), (3, 10, 1), (4, 200, 100),
            (5, 50, 5), (6, 300, 240), (7, 8, 0), (8, 150, 30)]
    df = spark.createDataFrame(rows, "k long, n long, x long")
    got = {r["key"]: r for r in
           eb_rate_shrinkage(df, "k", "n", "x").collect()}
    m = got[1]["pooled_rate"]
    for k, n, x in rows:
        raw, shr = got[k]["rate_raw"], got[k]["rate_shrunk"]
        # shrunk always sits between the raw rate and the pool
        lo, hi = min(raw, m), max(raw, m)
        assert lo - 1e-9 <= shr <= hi + 1e-9
    # the 4/4 key moves proportionally farther toward the pool than
    # the 240/300 key (less evidence, more shrinkage)
    pull = lambda k: abs(got[k]["rate_shrunk"] - got[k]["rate_raw"]) / (
        abs(got[k]["rate_raw"] - m) + 1e-12
    )
    assert pull(1) > pull(6)
    # homogeneous data: between-key variance below binomial noise ->
    # full shrink to the pool, NULL prior strength
    homog = spark.createDataFrame(
        [(i, 100, 50 + (i % 2)) for i in range(10)], "k long, n long, x long"
    )
    hr = eb_rate_shrinkage(homog, "k", "n", "x").collect()
    assert all(r["prior_strength"] is None for r in hr)
    assert all(r["rate_shrunk"] == r["pooled_rate"] for r in hr)


def test_vocab_richness_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "a a a b b c d"),       # counts: a3 b2 c1 d1
            ("s2", "x y x y z z w"),       # counts: x2 y2 z2 w1
        ],
        "source string, text string",
    )
    got = {r["source"]: r for r in vocab_richness(docs).collect()}
    r1 = got["s1"]
    assert (r1["vocab"], r1["n_tokens"], r1["f1"], r1["f2"]) == (4, 7, 2, 1)
    assert r1["chao1"] == pytest.approx(4 + 2 * 1 / (2 * 2), abs=1e-9)
    assert r1["gt_unseen_mass"] == pytest.approx(2 / 7, abs=1e-6)
    r2 = got["s2"]
    assert (r2["vocab"], r2["f1"], r2["f2"]) == (4, 1, 3)
    assert r2["chao1"] == pytest.approx(4 + 0.0, abs=1e-9)


def test_source_jsd_bounded_and_orders_divergence(spark):
    rows = []
    for i in range(60):
        rows.append(("mixed", "alpha beta gamma delta epsilon"))
    for i in range(60):
        rows.append(("same", "alpha beta gamma delta epsilon"))
    for i in range(60):
        rows.append(("off", "zeta eta theta iota kappa"))
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in
           source_token_jsd(docs, top_k=64).collect()}
    for r in got.values():
        assert 0.0 <= r["jsd_vs_corpus"] <= math.log(2.0) + 1e-9
    # the off-domain source diverges more than the blend members
    assert got["off"]["jsd_vs_corpus"] > got["same"]["jsd_vs_corpus"]


def test_winsorized_and_ratio_drop_nan(spark):
    df = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", float("nan"), 1.0),
         ("A", 3.0, float("nan")), ("A", 4.0, 8.0)],
        "g string, x double, y double",
    )
    w = winsorized_metrics(df, "x", "g", 0.0, 1.0).collect()[0]
    assert w["n"] == 4  # only the x-NaN row drops for the metric
    r = ratio_metric_delta(df, "x", "y", "g").collect()[0]
    assert r["n"] == 3  # both NaN rows drop complete-case
    assert r["ratio"] == pytest.approx((1 + 2 + 4) / (2 + 4 + 8), abs=1e-6)
