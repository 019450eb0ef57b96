"""Round-11 wave 3: mSPRT always-valid sequential monitoring, quantile
treatment effects, co-missingness patterns, token burstiness — each
pinned against an independent plain-Python/numpy computation."""

import math

import numpy as np
import pytest

from mdataframe_spark.operators.diagnostics import null_patterns
from mdataframe_spark.operators.experiments import (
    msprt_monitor,
    quantile_treatment_effect,
)
from mdataframe_spark.operators.text import token_burstiness

HOUR_NS = 3_600_000_000_000


# --- mSPRT -------------------------------------------------------------

def _msprt_reference(increments, tau2):
    """increments: list of (dn1, dx1, dn2, dx2) per bucket."""
    n1 = x1 = n2 = x2 = 0
    runmax = None
    out = []
    for dn1, dx1, dn2, dx2 in increments:
        n1 += dn1
        x1 += dx1
        n2 += dn2
        x2 += dx2
        lam = None
        if n1 > 0 and n2 > 0:
            pp = (x1 + x2) / (n1 + n2)
            v = pp * (1 - pp) * (1 / n1 + 1 / n2)
            if v > 0:
                d = x1 / n1 - x2 / n2
                lam = math.sqrt(v / (v + tau2)) * math.exp(
                    tau2 * d * d / (2 * v * (v + tau2))
                )
        if lam is not None:
            runmax = lam if runmax is None else max(runmax, lam)
        p = 1.0 if (runmax is None or runmax <= 1.0) else 1.0 / runmax
        out.append((lam, p))
    return out


def test_msprt_matches_reference_and_detects_effect(spark):
    # arm TRUE converts at 30%, FALSE at 10% — the monitor must reach
    # significance within the horizon and NEVER un-flag (p_av is a
    # running min by construction)
    rows = []
    incs = []
    for b in range(40):
        dn1 = dn2 = 50
        dx1 = 15 + (b % 3)
        dx2 = 5 + (b % 2)
        incs.append((dn1, dx1, dn2, dx2))
        for j in range(dn1):
            rows.append((b * HOUR_NS + j, True, j < dx1))
        for j in range(dn2):
            rows.append((b * HOUR_NS + 1000 + j, False, j < dx2))
    df = spark.createDataFrame(rows, "ts bigint, arm boolean, succ boolean")
    got = msprt_monitor(df, "ts", "arm", "succ", tau2=0.01).collect()
    ref = _msprt_reference(incs, 0.01)
    assert len(got) == 40
    for i, r in enumerate(got):
        assert r["lambda"] == pytest.approx(ref[i][0], rel=1e-5)
        assert r["p_always_valid"] == pytest.approx(ref[i][1], abs=1e-5)
    # monotone non-increasing p; significant from some bucket onward
    ps = [r["p_always_valid"] for r in got]
    assert all(a >= b - 1e-9 for a, b in zip(ps, ps[1:]))
    assert got[-1]["significant"] is True
    first_sig = next(i for i, r in enumerate(got) if r["significant"])
    assert all(r["significant"] for r in got[first_sig:])


def test_msprt_null_effect_stays_insignificant(spark):
    rows = []
    for b in range(30):
        for j in range(40):
            rows.append((b * HOUR_NS + j, True, j < 8))
            rows.append((b * HOUR_NS + 500 + j, False, j < 8))
    df = spark.createDataFrame(rows, "ts bigint, arm boolean, succ boolean")
    got = msprt_monitor(df, "ts", "arm", "succ", tau2=0.01).collect()
    assert not any(r["significant"] for r in got)
    assert got[-1]["p_always_valid"] > 0.5


# --- QTE ---------------------------------------------------------------

def test_qte_matches_numpy_percentiles(spark):
    rng = np.random.default_rng(3)
    treat = np.round(rng.gamma(2.0, 10.0, 800) + 5.0, 4)
    ctrl = np.round(rng.gamma(2.0, 10.0, 800), 4)
    rows = [(True, float(v)) for v in treat] + [
        (False, float(v)) for v in ctrl
    ]
    df = spark.createDataFrame(rows, "g boolean, v double")
    got = {r["q"]: r for r in
           quantile_treatment_effect(df, "v", "g").collect()}
    assert sorted(got) == [0.1, 0.25, 0.5, 0.75, 0.9]
    for q, r in got.items():
        assert r["q_treatment"] == pytest.approx(
            np.percentile(treat, q * 100), abs=1e-4
        )
        assert r["q_control"] == pytest.approx(
            np.percentile(ctrl, q * 100), abs=1e-4
        )
        assert r["qte"] == pytest.approx(
            r["q_treatment"] - r["q_control"], abs=1e-6
        )
        # a constant +5 location shift shows up at every quantile
        assert 2.0 < r["qte"] < 9.0
    with pytest.raises(ValueError, match="quantiles"):
        quantile_treatment_effect(df, "v", "g", quantiles=())


# --- null patterns -------------------------------------------------------

def test_null_patterns_counts_masks(spark):
    rows = []
    for i in range(100):
        a = None if i % 4 == 0 else float(i)
        b = None if i % 4 == 0 else f"s{i}"  # a and b fail together
        c = None if i % 10 == 0 else i
        rows.append((a, b, c))
    df = spark.createDataFrame(rows, "a double, b string, c long")
    got = {r["pattern"]: r for r in
           null_patterns(df, ["a", "b", "c"], top_k=10).collect()}
    # i%4==0 & i%10==0 -> i%20==0: 5 rows '111'; i%4==0 only: 20
    ref = {}
    for i in range(100):
        pat = ("1" if i % 4 == 0 else "0") * 2 + ("1" if i % 10 == 0 else "0")
        ref[pat] = ref.get(pat, 0) + 1
    assert {p: r["n_rows"] for p, r in got.items()} == ref
    assert got["110"]["n_missing_cols"] == 2
    assert got["000"]["share"] == pytest.approx(ref["000"] / 100, abs=1e-6)
    with pytest.raises(ValueError, match="at least one column"):
        null_patterns(df, [])


# --- burstiness ----------------------------------------------------------

def test_token_burstiness_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat cat cat"),
            (2, "the dog"),
            (3, "the fish cat"),
        ],
        "doc_id long, text string",
    )
    got = {r["token"]: r for r in token_burstiness(docs).collect()}
    # 'the': cf 3, df 3 -> burstiness 1.0; 'cat': cf 4, df 2 -> 2.0
    assert got["the"]["collection_freq"] == 3
    assert got["the"]["doc_freq"] == 3
    assert got["the"]["burstiness"] == pytest.approx(1.0)
    assert got["cat"]["collection_freq"] == 4
    assert got["cat"]["doc_freq"] == 2
    assert got["cat"]["burstiness"] == pytest.approx(2.0)
    assert got["cat"]["doc_share"] == pytest.approx(2 / 3, abs=1e-6)
    # top-k truncation keeps the highest collection frequencies
    top1 = token_burstiness(docs, top_k=1).collect()
    assert len(top1) == 1 and top1[0]["token"] == "cat"
