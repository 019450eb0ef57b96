"""Regression tests for the round-11 ADVICE items fixed in round 12:

1. effect_sizes is complete-case on the POST-cast group flag: a row
   whose group value casts to NULL boolean is excluded from BOTH the
   moment sums (n1/n2) and the pooled tie counts feeding vd_a — the
   two populations must be identical (previously the rank blocks kept
   the unparseable rows and biased the doubled rank sum).
2. quantile_treatment_effect survives an empty arm: the per-quantile
   spine stays (one row per requested quantile) with NULL on the
   empty side, instead of collapsing to zero rows via the NULL
   percentile array.
3. eb_rate_shrinkage clamps K at 0: when between-key variance exceeds
   the binomial ceiling m(1−m) (extreme heterogeneity), rates stay
   RAW — they must not fall into the full-pool branch reserved for
   the no-heterogeneity case.
4. dispersion_nb_fit drops NaN counts complete-case (the plain bigint
   cast turned NaN into 0 and deflated the moments).
5. WAV zero_crossing_rate is per-channel (frames within m[:, c]),
   averaged — not an interleaved-stream channel-phase artifact.
"""

import math
import struct

import pytest

from mdataframe_spark.operators.experiments import (
    eb_rate_shrinkage,
    quantile_treatment_effect,
)
from mdataframe_spark.operators.multimodal import _wav_features, encode_wav
from mdataframe_spark.operators.stats_tests import (
    dispersion_nb_fit,
    effect_sizes,
)


# --- 1. effect_sizes: post-cast complete case --------------------------

def test_effect_sizes_excludes_uncastable_groups_from_rank_blocks(spark):
    # clean data: TRUE {3,4}, FALSE {1,2}; every TRUE beats every
    # FALSE so A = 1. The 'maybe' rows (unparseable boolean) carry
    # values interleaved with the clean ones — if they leak into the
    # pooled tie counts the doubled rank sum shifts and A != 1.
    rows = [
        (3.0, "true"), (4.0, "true"),
        (1.0, "false"), (2.0, "false"),
        (1.5, "maybe"), (2.5, "maybe"), (3.5, "maybe"),
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    r = effect_sizes(df, "v", "g").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 2
    assert r["vd_a"] == pytest.approx(1.0)
    assert r["mean_diff"] == pytest.approx(2.0)


def test_effect_sizes_drops_nan_values(spark):
    rows = [
        (3.0, True), (4.0, True), (float("nan"), True),
        (1.0, False), (2.0, False),
    ]
    df = spark.createDataFrame(rows, "v double, g boolean")
    r = effect_sizes(df, "v", "g").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 2
    assert r["vd_a"] == pytest.approx(1.0)


# --- 2. QTE: empty arm keeps the quantile spine -------------------------

def test_qte_empty_arm_keeps_spine(spark):
    df = spark.createDataFrame(
        [(float(i), True) for i in range(1, 11)], "m double, g boolean"
    )
    out = quantile_treatment_effect(df, "m", "g", quantiles=(0.25, 0.5, 0.75))
    rows = out.collect()
    assert [r["q"] for r in rows] == [0.25, 0.5, 0.75]
    for r in rows:
        assert r["q_treatment"] is not None
        assert r["q_control"] is None
        assert r["qte"] is None
    # median of 1..10 interpolates to 5.5
    assert rows[1]["q_treatment"] == pytest.approx(5.5)


def test_qte_both_arms_unchanged(spark):
    df = spark.createDataFrame(
        [(float(i), i % 2 == 0) for i in range(1, 101)],
        "m double, g boolean",
    )
    rows = quantile_treatment_effect(df, "m", "g", quantiles=(0.5,)).collect()
    assert len(rows) == 1
    assert rows[0]["qte"] == pytest.approx(
        rows[0]["q_treatment"] - rows[0]["q_control"], abs=1e-6
    )


# --- 3. EB shrinkage: negative MoM strength clamps to raw ---------------

def test_eb_negative_strength_keeps_raw_rates(spark):
    # many n=1 keys at rate 1 plus one huge key near rate 0: the
    # between-key rate variance exceeds m(1-m), the MoM numerator is
    # negative, and the clamp must leave every rate RAW with
    # prior_strength 0 (previously: full shrink to the pool).
    rows = [(f"k{i}", 1, 1) for i in range(50)] + [("big", 100000, 10)]
    df = spark.createDataFrame(rows, "key string, n long, x long")
    out = eb_rate_shrinkage(df, "key", "n", "x").collect()
    by = {r["key"]: r for r in out}
    assert by["k0"]["prior_strength"] == 0.0
    assert by["k0"]["rate_shrunk"] == pytest.approx(by["k0"]["rate_raw"])
    assert by["big"]["rate_shrunk"] == pytest.approx(by["big"]["rate_raw"])


def test_eb_positive_strength_still_shrinks(spark):
    # mild heterogeneity around m: K > 0 and small-n keys move toward
    # the pool (strictly between raw and pool).
    rows = (
        [(f"a{i}", 1000, 100 + (i % 5) * 10) for i in range(20)]
        + [("tiny", 2, 2)]
    )
    df = spark.createDataFrame(rows, "key string, n long, x long")
    out = eb_rate_shrinkage(df, "key", "n", "x").collect()
    by = {r["key"]: r for r in out}
    k = by["tiny"]["prior_strength"]
    assert k is not None and k > 0
    m = by["tiny"]["pooled_rate"]
    assert m < by["tiny"]["rate_shrunk"] < by["tiny"]["rate_raw"]


def test_eb_no_heterogeneity_full_pool(spark):
    # all keys share one rate drawn at binomial noise: K is NULL and
    # every rate shrinks fully to the pool (the pre-existing branch).
    rows = [(f"k{i}", 10, 5) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, n long, x long")
    out = eb_rate_shrinkage(df, "key", "n", "x").collect()
    for r in out:
        assert r["prior_strength"] is None
        assert r["rate_shrunk"] == pytest.approx(r["pooled_rate"])


# --- 4. NB dispersion: NaN counts drop complete-case --------------------

def test_dispersion_nb_drops_nan(spark):
    clean = [(float(k),) for k in [1, 2, 3, 10, 20, 30]]
    df = spark.createDataFrame(clean + [(float("nan"),)] * 4, "k double")
    r = dispersion_nb_fit(df, "k").collect()[0]
    ref = dispersion_nb_fit(
        spark.createDataFrame(clean, "k double"), "k"
    ).collect()[0]
    assert r["n"] == 6
    assert r["mean"] == ref["mean"]
    assert r["variance"] == ref["variance"]
    assert r["fano"] == ref["fano"]


# --- 5. WAV ZCR is per-channel ------------------------------------------

def test_wav_zcr_per_channel_not_interleaved():
    # stereo where channel 0 is +1000 and channel 1 is -1000 on every
    # frame: no channel ever crosses zero, but the interleaved stream
    # alternates sign every sample. Correct per-channel ZCR = 0.
    frames = [(1000, -1000)] * 64
    payload = encode_wav(8000, 2, frames, sampwidth=2)
    feats = _wav_features(payload, dim=8)
    assert feats[7] == 0.0


def test_wav_zcr_alternating_mono():
    # mono alternating sign: every consecutive pair crosses -> rate 1.
    frames = [1000 if i % 2 == 0 else -1000 for i in range(64)]
    payload = encode_wav(8000, 1, frames, sampwidth=2)
    feats = _wav_features(payload, dim=8)
    assert feats[7] == pytest.approx(1.0)
