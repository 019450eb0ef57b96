"""Randomized property tests for the round-10 statistics (fixed
seeds, definitional invariants — the test_round9_properties model):
symmetry/scaling of Wasserstein, antisymmetry of Mann-Kendall,
Kendall-vs-brute on random data, Gini bounds, KM monotonicity."""

import numpy as np
import pytest

from mdataframe_spark.operators.diagnostics import gini_index
from mdataframe_spark.operators.stats_tests import (
    kendall_tau_cells,
    wasserstein_1d,
)


def _vg_df(spark, a, b):
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    return spark.createDataFrame(rows, "v DOUBLE, g BOOLEAN")


def test_wasserstein_symmetry_and_scaling(spark):
    rng = np.random.RandomState(11)
    a = np.round(rng.exponential(3, 30), 2)
    b = np.round(rng.exponential(5, 45), 2)
    w_ab = wasserstein_1d(_vg_df(spark, a, b), "v", "g").collect()[0][
        "wasserstein"
    ]
    # symmetry: swapping the group labels leaves the distance fixed
    w_ba = wasserstein_1d(_vg_df(spark, b, a), "v", "g").collect()[0][
        "wasserstein"
    ]
    assert w_ab == w_ba
    # positive homogeneity: scaling all values by c scales W1 by c
    w_scaled = wasserstein_1d(
        _vg_df(spark, 3 * a, 3 * b), "v", "g"
    ).collect()[0]["wasserstein"]
    assert w_scaled == pytest.approx(3 * w_ab, abs=5e-6)
    # translation invariance
    w_shift = wasserstein_1d(
        _vg_df(spark, a + 7, b + 7), "v", "g"
    ).collect()[0]["wasserstein"]
    assert w_shift == pytest.approx(w_ab, abs=5e-6)


def test_mann_kendall_reversal_negates_s(spark):
    from tests.test_experiments import _series_df

    from mdataframe_spark.operators.timeseries import mann_kendall

    counts = [3, 5, 4, 6, 8, 7, 9, 2, 11, 10]
    fwd = mann_kendall(_series_df(spark, counts), with_p=False).collect()[0]
    rev = mann_kendall(
        _series_df(spark, list(reversed(counts))), with_p=False
    ).collect()[0]
    assert fwd["s_stat"] == -rev["s_stat"]
    assert fwd["var_s"] == rev["var_s"]


def test_kendall_random_vs_brute(spark):
    from tests.test_experiments import np as _np  # noqa: F401
    from tests.test_round10_wave import _tau_b_reference

    rng = np.random.RandomState(23)
    for seed in range(3):
        x = rng.randint(0, 6, 25).astype(float)
        y = rng.randint(0, 6, 25).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x DOUBLE, y DOUBLE",
        )
        row = kendall_tau_cells(df, "x", "y").collect()[0]
        p, q, tau = _tau_b_reference(x, y)
        assert row["concordant"] == p and row["discordant"] == q
        if not np.isnan(tau):
            assert row["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_gini_bounds_and_replication_invariance(spark):
    rng = np.random.RandomState(5)
    vals = np.round(rng.exponential(10, 50), 2)
    df = spark.createDataFrame([(float(v),) for v in vals], "v DOUBLE")
    g1 = gini_index(df, "v").collect()[0]["gini"]
    assert 0.0 <= g1 < 1.0
    # the rank identity equals Σ|xᵢ−xⱼ|/(2n²μ) (verified on the [1,1,2]
    # fixture in test_round10_wave), which is REPLICATION-INVARIANT:
    # tripling every row scales both Σ|diff| and n²μ by 9
    rep = spark.createDataFrame(
        [(float(v),) for v in np.repeat(vals, 3)], "v DOUBLE"
    )
    g3 = gini_index(rep, "v").collect()[0]["gini"]
    assert g3 == pytest.approx(g1, abs=1e-6)
    # and it matches the pairwise definition directly
    md = np.abs(vals[:, None] - vals[None, :]).mean()
    assert g1 == pytest.approx(md / (2 * vals.mean()), abs=1e-6)


def test_kaplan_meier_monotone_on_random_censored_data(spark):
    from mdataframe_spark.operators.survival import kaplan_meier

    rng = np.random.RandomState(9)
    dur = rng.randint(1, 20, 60).astype(float)
    ev = rng.randint(0, 2, 60)
    df = spark.createDataFrame(
        [(float(d), int(e)) for d, e in zip(dur, ev)],
        "dur DOUBLE, ev INT",
    )
    rows = kaplan_meier(df, "dur", "ev").collect()
    surv = [r["survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in surv)
    # risk sets strictly decrease along the curve
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert rows[0]["n_at_risk"] == 60
