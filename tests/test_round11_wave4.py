"""Round-11 wave 4: difference-in-differences and Jonckheere-Terpstra.
DiD is pinned against numpy cell means/variances; JT's doubled
statistic against a brute-force pairwise count, and its tie-corrected
null VARIANCE against a Monte-Carlo permutation null (the formula has
no simpler independent check)."""

import math
import random

import numpy as np
import pytest

from mdataframe_spark.operators.experiments import diff_in_diff
from mdataframe_spark.operators.stats_tests import jonckheere_terpstra


# --- diff-in-diff -------------------------------------------------------

def test_did_matches_numpy_cells(spark):
    rng = np.random.default_rng(17)
    rows = []
    cells = {}
    for treated in (True, False):
        for post in (True, False):
            base = 10.0 + (3.0 if post else 0.0) + (2.0 if treated else 0.0)
            eff = 5.0 if (treated and post) else 0.0
            ys = np.round(base + eff + rng.normal(0, 2.0, 200), 4)
            cells[(treated, post)] = ys
            rows += [(treated, post, float(y)) for y in ys]
    df = spark.createDataFrame(rows, "t boolean, p boolean, y double")
    got = diff_in_diff(df, "y", "t", "p").collect()[0]
    m = {k: v.mean() for k, v in cells.items()}
    did = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    se = math.sqrt(sum(v.var(ddof=1) / len(v) for v in cells.values()))
    assert got["mean_treated_post"] == pytest.approx(m[(True, True)], abs=1e-4)
    assert got["did"] == pytest.approx(did, abs=1e-4)
    assert got["se"] == pytest.approx(se, abs=1e-4)
    # the planted interaction effect (+5) is recovered inside the CI
    assert got["ci_lo"] < 5.0 < got["ci_hi"]
    assert got["ci_lo"] > 3.0  # and the effect is significant


def test_did_missing_cell_yields_null(spark):
    df = spark.createDataFrame(
        [(True, True, 1.0), (True, False, 2.0), (False, True, 3.0)],
        "t boolean, p boolean, y double",
    )
    got = diff_in_diff(df, "y", "t", "p").collect()[0]
    assert got["n_control_pre"] == 0
    assert got["did"] is None and got["se"] is None


# --- Jonckheere-Terpstra --------------------------------------------------

def _jt_brute(pairs):
    """pairs: list of (score, value). Returns DOUBLED JT."""
    d = 0
    for s1, v1 in pairs:
        for s2, v2 in pairs:
            if s1 < s2:
                if v1 < v2:
                    d += 2
                elif v1 == v2:
                    d += 1
    return d


def test_jt_statistic_matches_brute_force(spark):
    rnd = random.Random(11)
    pairs = [
        (rnd.randint(0, 3), float(rnd.randint(0, 6)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(pairs, "s long, v double")
    got = jonckheere_terpstra(df, "v", "s").collect()[0]
    assert got["jt2"] == _jt_brute(pairs)
    assert got["n"] == 60
    # doubled null mean: (N^2 - sum n_i^2)/2
    from collections import Counter

    sizes = Counter(s for s, _ in pairs)
    e2 = (60 ** 2 - sum(n * n for n in sizes.values())) / 2
    assert got["e2_jt"] == pytest.approx(e2, abs=1e-6)


def test_jt_variance_matches_permutation_null(spark):
    # tie-heavy data: the tie-corrected variance formula must match
    # the empirical variance of JT under random relabeling
    rnd = random.Random(7)
    scores = [i % 3 for i in range(45)]
    values = [float(rnd.randint(0, 4)) for _ in range(45)]
    df = spark.createDataFrame(
        list(zip(scores, values)), "s long, v double"
    )
    got = jonckheere_terpstra(df, "v", "s", with_p=False).collect()[0]
    var_formula = ((got["jt2"] / 2 - got["e2_jt"] / 2) / got["z"]) ** 2
    jts = []
    perm = values[:]
    for _ in range(4000):
        rnd.shuffle(perm)
        jts.append(_jt_brute(list(zip(scores, perm))) / 2)
    emp_mean = sum(jts) / len(jts)
    emp_var = sum((j - emp_mean) ** 2 for j in jts) / (len(jts) - 1)
    assert emp_mean == pytest.approx(got["e2_jt"] / 2, rel=0.02)
    assert var_formula == pytest.approx(emp_var, rel=0.1)


def test_jt_detects_planted_trend(spark):
    rnd = random.Random(3)
    rows = []
    for s in range(4):
        for _ in range(40):
            rows.append((s, float(s * 2 + rnd.randint(0, 3))))
    df = spark.createDataFrame(rows, "s long, v double")
    got = jonckheere_terpstra(df, "v", "s").collect()[0]
    assert got["z"] > 5.0
    assert got["p_value"] is not None and got["p_value"] < 1e-6
    # reversed scores flip the sign
    rev = spark.createDataFrame(
        [(3 - s, v) for s, v in rows], "s long, v double"
    )
    got2 = jonckheere_terpstra(rev, "v", "s", with_p=False).collect()[0]
    assert got2["z"] == pytest.approx(-got["z"], abs=1e-6)
