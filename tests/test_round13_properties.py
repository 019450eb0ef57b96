"""Structural properties of the round-13 operators — invariants that
hold for ANY input, checked on randomized-but-seeded frames (the
guard layer above the hand-pinned math in tests/test_round13_wave.py,
following the round-12 convention)."""

import random

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.functions.stats import bh_adjust, storey_qvalue
from mdataframe_spark.operators.events import interevent_stats
from mdataframe_spark.operators.experiments import wilson_ci
from mdataframe_spark.operators.stats_tests import (
    cvm_two_sample,
    hodges_lehmann_shift,
    ks_two_sample,
)
from mdataframe_spark.operators.text import heaps_law_fit


def _two_sample_rows(seed, n=80, grid=12):
    rng = random.Random(seed)
    return [
        (float(rng.randrange(grid)) + rng.choice((0.0, 0.5)),
         rng.random() < 0.45)
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [2, 9, 31])
def test_cvm_symmetric_nonnegative_and_below_one(spark, seed):
    rows = _two_sample_rows(seed)
    df = spark.createDataFrame(rows, "v double, g boolean")
    flipped = df.select("v", (~F.col("g")).alias("g"))
    ab = cvm_two_sample(df, "v", "g").collect()[0]
    ba = cvm_two_sample(flipped, "v", "g").collect()[0]
    # group swap leaves the squared-gap integral unchanged
    assert ab["cvm"] == ba["cvm"]
    assert ab["n1"] == ba["n2"] and ab["n2"] == ba["n1"]
    # 0 <= T <= n1*n2/N (the gap is <= 1 pointwise)
    n1, n2 = ab["n1"], ab["n2"]
    assert 0.0 <= ab["cvm"] <= n1 * n2 / (n1 + n2) + 1e-9


@pytest.mark.parametrize("seed", [5, 17])
def test_cvm_invariant_under_monotone_transform(spark, seed):
    # CvM depends only on the ORDER of pooled values: any strictly
    # increasing transform leaves it unchanged
    rows = _two_sample_rows(seed)
    df = spark.createDataFrame(rows, "v double, g boolean")
    mono = df.select((F.col("v") * 3.0 + 7.0).alias("v"), "g")
    a = cvm_two_sample(df, "v", "g").collect()[0]
    b = cvm_two_sample(mono, "v", "g").collect()[0]
    assert a["cvm"] == b["cvm"]
    assert a["n_values"] == b["n_values"]


@pytest.mark.parametrize("seed", [4, 13])
def test_cvm_bounded_by_ks_square_relation(spark, seed):
    # the mean of squared gaps cannot exceed the max squared gap:
    # T <= (n1 n2 / N) * D^2 is the exact relation
    rows = _two_sample_rows(seed)
    df = spark.createDataFrame(rows, "v double, g boolean")
    c = cvm_two_sample(df, "v", "g").collect()[0]
    k = ks_two_sample(df, "v", "g", with_p=False).collect()[0]
    n1, n2 = c["n1"], c["n2"]
    assert c["cvm"] <= n1 * n2 / (n1 + n2) * k["d"] ** 2 + 1e-6


@pytest.mark.parametrize("seed", [6, 19])
def test_hl_antisymmetric_and_shift_equivariant(spark, seed):
    rng = random.Random(seed)
    rows = [
        (float(rng.randrange(15)), rng.random() < 0.5) for _ in range(60)
    ]
    df = spark.createDataFrame(rows, "v double, g boolean")
    if df.filter("g").count() == 0 or df.filter("not g").count() == 0:
        pytest.skip("degenerate draw")
    fwd = hodges_lehmann_shift(df, "v", "g").collect()[0]
    rev = hodges_lehmann_shift(
        df.select("v", (~F.col("g")).alias("g")), "v", "g"
    ).collect()[0]
    # swapping groups negates the shift (up to the even-N midpoint
    # convention, exact on this integer grid)
    assert fwd["hl_shift"] == pytest.approx(-rev["hl_shift"], abs=1e-9)
    # adding c to the TRUE group adds exactly c to the estimate
    shifted = df.select(
        F.when(F.col("g"), F.col("v") + 100.0).otherwise(F.col("v")).alias("v"),
        "g",
    )
    s = hodges_lehmann_shift(shifted, "v", "g").collect()[0]
    assert s["hl_shift"] == pytest.approx(fwd["hl_shift"] + 100.0, abs=1e-9)


@pytest.mark.parametrize("seed", [8, 27])
def test_storey_dominated_by_bh(spark, seed):
    rng = random.Random(seed)
    rows = [(i, round(rng.random(), 4)) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, p double")
    q = {r["k"]: r["qvalue"] for r in storey_qvalue(df, "p", tiebreak_cols=["k"]).collect()}
    b = {r["k"]: r["fdr"] for r in bh_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    # pi0 <= 1, so q <= BH everywhere; both within [0, 1]
    for k in q:
        assert q[k] <= b[k] + 1e-12
        assert -1e-12 <= q[k] <= 1.0 + 1e-12


@pytest.mark.parametrize("seed", [12, 29])
def test_wilson_interval_brackets_rate_inside_unit(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(4)}", rng.random() < rng.choice((0.02, 0.5, 0.98)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, s boolean")
    for r in wilson_ci(df, "g", "s").collect():
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0


@pytest.mark.parametrize("seed", [14, 33])
def test_burstiness_bounded(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"u{rng.randrange(6)}", rng.randrange(0, 10**7) * 60_000_000_000)
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts bigint")
    r = interevent_stats(df).collect()[0]
    # nonnegative gaps: B = (sd - mu)/(sd + mu) in (-1, 1]
    assert -1.0 <= r["burstiness"] <= 1.0
    assert r["p50_gap"] <= r["p90_gap"] <= r["max_gap"]


@pytest.mark.parametrize("seed", [16, 37])
def test_heaps_vocab_never_exceeds_tokens(spark, seed):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(f"w{rng.randrange(200)}" for _ in range(12)))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law_fit(df, n_buckets=8).collect()[0]
    assert r["vocab_size"] <= r["n_tokens"]
    assert 0.0 - 1e-9 <= r["r2"] <= 1.0 + 1e-9
    assert r["heaps_k"] > 0
