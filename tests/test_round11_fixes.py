"""Regression tests for the round-11 ADVICE items:

1. srm_check builds the variant spine from the DESIGNED weight table,
   so an arm with zero logged rows (the most severe SRM possible)
   contributes its full (0−E)²/E term and its dof slot — the guard
   must fail LOUD, not open.
2. srm_check raises a descriptive ValueError on a non-positive
   designed weight (expected count 0 → chi² undefined) instead of an
   ANSI divide-by-zero or a silently-dropped term.
3. two_proportion_ztest is complete-case on the boolean CAST result:
   an unparseable success string must not count toward the arm size
   while being excluded from the conversions.
4. count_min_join_size certifies the DOCUMENTED classic bound
   e·N_A·N_B/width (not a looser 3.0 slack).
5. wasserstein_1d returns 0 (not NULL) when both groups' mass sits on
   one shared distinct value — the true W₁ there is a well-defined 0.
"""

import math

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.experiments import (
    srm_check,
    two_proportion_ztest,
)
from mdataframe_spark.operators.sketches import count_min_join_size
from mdataframe_spark.operators.stats_tests import wasserstein_1d


# --- 1. SRM spine includes zero-observation designed arms ------------

def test_srm_missing_arm_contributes_full_term(spark):
    # 50/50 design, only arm 'a' observed: chi2 must be the true 100
    # over dof=1, not 50 over dof=0 with a NULL p-value.
    df = spark.createDataFrame([("a",)] * 100, "variant string")
    rows = srm_check(
        df, "variant", {"a": 0.5, "b": 0.5}, with_p=True
    ).collect()
    assert [r["group"] for r in rows] == ["a", "b"]
    by = {r["group"]: r for r in rows}
    assert by["b"]["n_observed"] == 0
    assert by["b"]["n_expected"] == pytest.approx(50.0)
    assert by["b"]["chi2_term"] == pytest.approx(50.0)
    for r in rows:
        assert r["n"] == 100
        assert r["dof"] == 1
        assert r["chi2"] == pytest.approx(100.0)
        assert r["p_value"] is not None and r["p_value"] < 1e-6


def test_srm_all_arms_observed_matches_old_semantics(spark):
    rows = srm_check(
        spark.createDataFrame(
            [("a",)] * 60 + [("b",)] * 40, "variant string"
        ),
        "variant",
        {"a": 0.5, "b": 0.5},
        with_p=False,
    ).collect()
    by = {r["group"]: r for r in rows}
    assert by["a"]["chi2_term"] == pytest.approx(2.0)
    assert by["b"]["chi2_term"] == pytest.approx(2.0)
    assert rows[0]["chi2"] == pytest.approx(4.0)
    assert rows[0]["dof"] == 1


# --- 2. non-positive designed weight fails loud -----------------------

def test_srm_zero_weight_raises(spark):
    df = spark.createDataFrame([("a",), ("b",)], "variant string")
    with pytest.raises(ValueError, match="weight must be > 0"):
        srm_check(df, "variant", {"a": 1.0, "b": 0.0})


def test_srm_unknown_variant_still_raises(spark):
    df = spark.createDataFrame([("a",), ("zzz",)], "variant string")
    with pytest.raises(ValueError, match="missing from"):
        srm_check(df, "variant", {"a": 1.0})


# --- 3. two-proportion complete-case on the CAST result ---------------

def test_two_proportion_drops_unparseable_success(spark):
    # arm TRUE: 2 clean successes, 1 clean failure, 1 unparseable;
    # arm FALSE: 1 success, 1 failure. The unparseable row must drop
    # entirely: n1=3 (not 4), rate1=2/3.
    df = spark.createDataFrame(
        [
            (True, "true"),
            (True, "true"),
            (True, "false"),
            (True, "not-a-bool"),
            (False, "true"),
            (False, "false"),
        ],
        "variant boolean, converted string",
    )
    row = two_proportion_ztest(
        df, "variant", "converted", with_p=False
    ).collect()[0]
    assert (row["n1"], row["x1"], row["n2"], row["x2"]) == (3, 2, 2, 1)
    assert row["rate1"] == pytest.approx(2.0 / 3.0, abs=1e-6)


# --- 4. count-min join-size certifies the documented e-bound ----------

def test_join_size_bound_constant_is_e(spark):
    # width=1: every key collides into one bucket, so each depth row's
    # estimate is exactly N_A·N_B. overcount = N_A·N_B − J. With A = B
    # = 6 distinct singleton keys: est = 36, exact J = 6, overcount =
    # 30. e·36/1 ≈ 97.9 → within_bound true; but with the old 3.0 the
    # threshold was 108 — pick sizes where the two constants disagree:
    # need e·NANB < overcount ≤ 3·NANB, impossible since overcount ≤
    # NANB. So instead certify the emitted bound arithmetic directly
    # on a case that must PASS under e (sanity) and assert the column
    # semantics via a hand computation.
    a = spark.range(6).select(F.col("id").alias("k"))
    b = spark.range(6).select(F.col("id").alias("k"))
    row = count_min_join_size(a, b, "k", depth=3, width=1).collect()[0]
    assert row["n_a"] == 6 and row["n_b"] == 6
    assert row["exact_join_size"] == 6
    assert row["cm_estimate"] == 36
    assert row["overcount"] == 30
    assert row["within_bound"] is True
    assert 30 <= math.ceil(math.e * 36 / 1)


# --- 5. degenerate wasserstein is 0, not NULL ------------------------

def test_wasserstein_single_shared_value_is_zero(spark):
    df = spark.createDataFrame(
        [(5.0, True)] * 4 + [(5.0, False)] * 3, "x double, g boolean"
    )
    row = wasserstein_1d(df, "x", "g").collect()[0]
    assert (row["n1"], row["n2"], row["n_values"]) == (4, 3, 1)
    assert row["wasserstein"] == pytest.approx(0.0)


def test_wasserstein_empty_group_stays_null(spark):
    df = spark.createDataFrame(
        [(1.0, True), (2.0, True)], "x double, g boolean"
    )
    row = wasserstein_1d(df, "x", "g").collect()[0]
    assert row["n2"] == 0
    assert row["wasserstein"] is None
