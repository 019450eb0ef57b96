"""NOISeq golden parity (reference: tests/test_differential.py:282-323).

M / D / ranking are deterministic and match the R-derived golden at
1e-5 (all published decimals). Prob depends on the noise-simulation RNG
stream (R's multinomial sampler there, numpy here) — asserted within
sampling tolerance of the golden (the cloud has 80 points on this
fixture; binomial σ ≈ 0.05)."""

import numpy as np
import pytest

from mdataframe_spark.functions.noiseq import NOISeq

CONDITION_TO_COLUMNS = {
    "A": ["sampleA_1", "sampleA_2", "sampleA_3"],
    "B": ["sampleB_1", "sampleB_2", "sampleB_3"],
}

GOLDEN = {
    #          M           D         prob    ranking
    "genA": (0.9358447, 15.65268, 0.5500, 15.680631),
    "genB": (2.5208073, 14.12976, 0.9125, 14.352857),
    "genC": (-0.2865477, 2.81975, 0.3125, -2.834273),
    "genD": (-0.2340803, 10.04758, 0.2625, -10.050308),
}


def test_column_contract():
    nq = NOISeq("A", "B", CONDITION_TO_COLUMNS)
    assert nq.logFC == "logFC (NOISeq)"
    assert nq.D == "D (NOISeq)"
    assert nq.prob == "Prob (NOISeq)"
    assert nq.rank == "Rank (NOISeq)"
    named = NOISeq("A", "B", CONDITION_TO_COLUMNS, "testcomparison")
    assert named.suffix == " (testcomparison)"


def test_invalid_norm():
    with pytest.raises(ValueError, match="accepted as values for norm"):
        NOISeq("A", "B", CONDITION_TO_COLUMNS, norm="frobnicate")


def test_noiseq_golden(test_frame):
    nq = NOISeq("A", "B", CONDITION_TO_COLUMNS, "testcomparison",
                k=0.5, norm="tmm", pnr=0.2, nss=5, v=0.02)
    result = nq(test_frame)
    rows = {r["__row_id"]: r for r in result.collect()}
    for col in nq.columns:
        assert col in result.columns
    for gene, (m, d, prob, rank) in GOLDEN.items():
        r = rows[gene]
        np.testing.assert_almost_equal(r[nq.logFC], m, decimal=5)
        np.testing.assert_almost_equal(r[nq.D], d, decimal=4)
        np.testing.assert_almost_equal(r[nq.rank], rank, decimal=4)
        # prob: sampling tolerance (different RNG stream than R)
        assert abs(r[nq.prob] - prob) < 0.25, (gene, r[nq.prob], prob)
        assert 0.0 <= r[nq.prob] <= 1.0
    # the most-differential gene by prob matches R
    best = max(GOLDEN, key=lambda g: GOLDEN[g][2])
    got_best = max(GOLDEN, key=lambda g: rows[g][nq.prob])
    assert got_best == best


def test_noiseq_prob_deterministic(test_frame):
    nq1 = NOISeq("A", "B", CONDITION_TO_COLUMNS, seed=7)
    nq2 = NOISeq("A", "B", CONDITION_TO_COLUMNS, seed=7)
    p1 = {r["__row_id"]: r[nq1.prob] for r in nq1(test_frame).collect()}
    p2 = {r["__row_id"]: r[nq2.prob] for r in nq2(test_frame).collect()}
    assert p1 == p2


def test_noiseq_approx_matches_exact(spark):
    """The distributed histogram path (forced via max_exact_noise=0)
    agrees with the exact collected path within sampling tolerance —
    different RNG streams (multinomial vs binomial marginals), same
    noise model, so probs should correlate strongly and the prob
    ordering of clearly-separated genes must match."""
    import pandas as pd

    rng = np.random.RandomState(11)
    n = 300
    base = rng.gamma(2.0, 50.0, n)
    a = rng.poisson(base).astype(float)
    b = rng.poisson(base * np.where(rng.rand(n) < 0.1, 4.0, 1.0)).astype(float)
    pdf = pd.DataFrame({"__row_id": [f"g{i}" for i in range(n)],
                        "ca": a + 1, "cb": b + 1})
    df = spark.createDataFrame(pdf)
    c2c = {"A": ["ca"], "B": ["cb"]}
    exact = NOISeq("A", "B", c2c, seed=3)
    approx = NOISeq("A", "B", c2c, seed=3, max_exact_noise=0)
    re = {r["__row_id"]: r for r in exact(df).collect()}
    ra = {r["__row_id"]: r for r in approx(df).collect()}
    ids = sorted(re)
    ve = np.array([re[i][exact.prob] for i in ids])
    va = np.array([ra[i][approx.prob] for i in ids])
    assert np.all((va >= 0) & (va <= 1))
    assert np.corrcoef(ve, va)[0, 1] > 0.9
    # measured on this fixture: mean |d| ~ 0.013, max ~ 0.034 — the
    # branches share the deterministic signal layer and differ only in
    # the noise-cloud sampling (multinomial vs binomial marginals) +
    # 1/512 histogram quantization
    assert np.mean(np.abs(ve - va)) < 0.04
    assert np.max(np.abs(ve - va)) < 0.10
    # the deterministic columns must be IDENTICAL across branches
    me = np.array([re[i][exact.logFC] for i in ids])
    ma = np.array([ra[i][approx.logFC] for i in ids])
    assert np.array_equal(me, ma)


def test_noiseq_approx_scales_distributed(spark):
    """50k genes through the approximate path: no driver collect of
    noise pairs (only the bounded histogram cells), deterministic,
    bounded output, and genes with a strong injected fold change score
    higher prob than null genes."""
    counts = spark.range(50_000).selectExpr(
        "concat('g', id) AS __row_id",
        # deterministic pseudo-random baseline counts in [50, 1050)
        "50 + pmod(abs(hash(id)), 1000) AS ca",
        # every 100th gene gets ~6x fold change; others are unchanged
        # (identical counts both sides = pure noise-floor genes)
        """CASE WHEN id % 100 = 0
            THEN (50 + pmod(abs(hash(id)), 1000)) * 6
            ELSE 50 + pmod(abs(hash(id)), 1000) END AS cb""",
    ).selectExpr("__row_id", "CAST(ca AS DOUBLE) ca", "CAST(cb AS DOUBLE) cb")
    nq = NOISeq("A", "B", {"A": ["ca"], "B": ["cb"]}, seed=5,
                max_exact_noise=10_000)
    out = nq(counts).select("__row_id", nq.prob).collect()
    assert len(out) == 50_000
    probs = {r["__row_id"]: r[nq.prob] for r in out}
    vals = np.array(list(probs.values()))
    assert np.all((vals >= 0) & (vals <= 1))
    fc = np.array([probs[f"g{i}"] for i in range(0, 50_000, 100)])
    null = np.array([probs[f"g{i}"] for i in range(1, 50_000, 100)])
    assert fc.mean() > null.mean() + 0.2, (fc.mean(), null.mean())
