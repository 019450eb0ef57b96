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
