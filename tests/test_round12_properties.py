"""Structural properties of the round-12 operators — invariants that
hold for ANY input, checked on randomized-but-seeded frames (the
hypothesis-style guard layer above the hand-pinned math in
tests/test_round12_wave.py)."""

import random

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.functions.stats import bh_adjust, holm_adjust
from mdataframe_spark.operators.stats_tests import (
    concordance_ccc,
    mutual_information,
)


def _rand_pairs(seed, n=60, ka=4, kb=3):
    rng = random.Random(seed)
    return [
        (f"a{rng.randrange(ka)}", f"b{rng.randrange(kb)}")
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_mi_symmetric_and_bounded(spark, seed):
    rows = _rand_pairs(seed)
    df = spark.createDataFrame(rows, "a string, b string")
    ab = mutual_information(df, "a", "b").collect()[0]
    ba = mutual_information(df, "b", "a").collect()[0]
    # MI is symmetric; marginal entropies swap
    assert ab["mi"] == ba["mi"]
    assert ab["h_a"] == ba["h_b"] and ab["h_b"] == ba["h_a"]
    # 0 <= MI <= min(H_a, H_b); NMI in [0, 1]
    assert 0.0 <= ab["mi"] <= min(ab["h_a"], ab["h_b"]) + 1e-9
    if ab["nmi"] is not None:
        assert -1e-9 <= ab["nmi"] <= 1.0 + 1e-9


@pytest.mark.parametrize("seed", [3, 11])
def test_ccc_bounded_by_pearson(spark, seed):
    rng = random.Random(seed)
    rows = [
        (x := rng.uniform(0, 100), 0.7 * x + rng.uniform(-5, 5) + 3.0)
        for _ in range(80)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r = concordance_ccc(df, "x", "y").collect()[0]
    # |CCC| <= |r| always (Lin 1989): agreement cannot exceed linearity
    assert abs(r["ccc"]) <= abs(r["pearson_r"]) + 1e-6
    assert -1.0 - 1e-9 <= r["ccc"] <= 1.0 + 1e-9


@pytest.mark.parametrize("seed", [5, 13])
def test_holm_between_raw_and_bonferroni_and_monotone(spark, seed):
    rng = random.Random(seed)
    ps = [round(rng.random(), 4) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "k long, p double"
    )
    got = {r["k"]: r["p_holm"] for r in
           holm_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    n = len(ps)
    order = sorted(range(n), key=lambda i: (ps[i], i))
    prev = 0.0
    for idx in order:
        # raw <= holm <= bonferroni
        assert ps[idx] - 1e-12 <= got[idx] <= min(ps[idx] * n, 1.0) + 1e-12
        # monotone in the sort order (step-down running max)
        assert got[idx] >= prev - 1e-12
        prev = got[idx]


@pytest.mark.parametrize("seed", [9])
def test_holm_fwer_vs_bh_fdr_ordering(spark, seed):
    """Holm (FWER) is never more liberal than BH (FDR) on the same
    family: adjusted Holm >= adjusted BH row-wise."""
    rng = random.Random(seed)
    ps = [round(rng.random() ** 2, 4) for _ in range(30)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "k long, p double"
    )
    holm = {r["k"]: r["p_holm"] for r in
            holm_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    bh = {r["k"]: r["fdr"] for r in
          bh_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    for k in range(len(ps)):
        assert holm[k] >= bh[k] - 1e-9
