"""DESeq2-style LRT (M5): general-design NB GLM likelihood-ratio test.

The reference's DESeq2Timeseries ships no golden (its test only checks
construction), so correctness is property-based:
- a condition effect that exists → tiny p; pure-noise factor → large p
- LRT stat ≈ Wald stat² on a two-group design (asymptotic equivalence)
- nested invariance and chi2 distribution bounds
"""

import numpy as np
import pytest

from mdataframe_spark.functions.deseq2 import DESeq2LRT, DESeq2UnpairedAB


SAMPLES = {
    # 2 conditions × (batch x/y) × 2 replicates = 8 samples
    f"s{i}": {"condition": ("A" if i < 4 else "B"), "batch": ("x" if i % 2 else "y")}
    for i in range(8)
}


@pytest.fixture
def lrt_frame(spark):
    rng = np.random.RandomState(11)
    rows = []
    for gi in range(30):
        base = rng.randint(20, 200)
        effect = 3.0 if gi < 10 else 1.0  # first 10 genes differential
        vals = []
        for i in range(8):
            mu = base * (effect if i >= 4 else 1.0)
            vals.append(int(max(rng.poisson(mu), 0)))
        rows.append((f"g{gi}", *vals))
    return spark.createDataFrame(rows, ["__row_id"] + [f"s{i}" for i in range(8)])


def test_lrt_contract():
    t = DESeq2LRT(SAMPLES, full=["condition", "batch"], reduced=["batch"])
    assert t.p_column == "p (DESeq2TimeSeries)"
    assert t.logFC_column == "log2FC (DESeq2TimeSeries)"
    with pytest.raises(ValueError, match="more coefficients"):
        DESeq2LRT(SAMPLES, full=["batch"], reduced=["batch"])


def test_lrt_detects_condition_effect(lrt_frame):
    t = DESeq2LRT(SAMPLES, full=["condition", "batch"], reduced=["batch"],
                  dispersion=0.05)
    rows = {r["__row_id"]: r for r in t(lrt_frame).collect()}
    diff_p = [rows[f"g{i}"][t.p_column] for i in range(10)]
    null_p = [rows[f"g{i}"][t.p_column] for i in range(10, 30)]
    assert max(diff_p) < 1e-4          # 3x effects are unmissable
    assert np.median(null_p) > 0.05    # null genes mostly non-significant
    for r in rows.values():
        assert 0 <= r[t.p_column] <= 1
        assert r[t.stat_column] >= 0
        assert r[t.fdr_column] >= r[t.p_column] - 1e-12


def test_lrt_matches_wald_asymptotically(lrt_frame):
    """Two-group design: LRT stat should approximate the Wald stat²."""
    c2c = {"A": [f"s{i}" for i in range(4)], "B": [f"s{i}" for i in range(4, 8)]}
    wald = DESeq2UnpairedAB("A", "B", c2c, dispersion=0.05)
    lrt = DESeq2LRT(SAMPLES, full=["condition"], reduced=[], dispersion=0.05)
    w = {r["__row_id"]: r[wald.stat_column] for r in wald(lrt_frame).collect()}
    l = {r["__row_id"]: r[lrt.stat_column] for r in lrt(lrt_frame).collect()}
    ratios = [l[g] / max(w[g] ** 2, 1e-9) for g in w if abs(w[g]) > 0.5]
    assert len(ratios) > 5
    # asymptotic equivalence: within 30% for non-degenerate genes
    assert np.median(np.abs(np.array(ratios) - 1.0)) < 0.3


def test_lrt_estimated_dispersions_are_shrunk(spark):
    """The estimated-dispersion path (dispersion=None) applies EB MAP
    shrinkage to the trend — same estimators as the Wald pipeline. With
    few replicates and a common true dispersion, raw gene-wise MLEs are
    noisy and anti-conservative; shrinkage must (a) agree with the Wald
    pipeline's shrunken p on a two-group design (same prior machinery)
    and (b) keep null p-values roughly uniform (not anti-conservative)."""
    rng = np.random.RandomState(7)
    n_genes, disp = 400, 0.1
    rows = []
    for gi in range(n_genes):
        base = rng.randint(30, 500)
        r = 1.0 / disp
        vals = rng.negative_binomial(r, r / (r + base), 8).astype(int)
        rows.append((f"g{gi}", *[int(v) for v in vals]))
    df = spark.createDataFrame(rows, ["__row_id"] + [f"s{i}" for i in range(8)])

    lrt = DESeq2LRT(SAMPLES, full=["condition"], reduced=[])
    out = {r["__row_id"]: r for r in lrt(df).collect()}
    pvals = np.array([out[f"g{i}"][lrt.p_column] for i in range(n_genes)])
    assert np.all((pvals >= 0) & (pvals <= 1))
    # anti-conservativeness check: with proper shrinkage the null
    # false-positive rate at 0.05 stays near nominal
    assert (pvals < 0.05).mean() < 0.12, (pvals < 0.05).mean()

    c2c = {"A": [f"s{i}" for i in range(4)], "B": [f"s{i}" for i in range(4, 8)]}
    wald = DESeq2UnpairedAB("A", "B", c2c)
    wp = {r["__row_id"]: r[wald.p_column] for r in wald(df).collect()}
    lp = np.array([out[g][lrt.p_column] for g in wp])
    wpv = np.array([wp[g] for g in wp])
    # same shrinkage machinery -> strongly correlated p-values
    assert np.corrcoef(np.log10(np.maximum(lp, 1e-12)),
                       np.log10(np.maximum(wpv, 1e-12)))[0, 1] > 0.9
