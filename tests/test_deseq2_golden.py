"""DESeq2 golden parity (reference: tests/test_differential.py:103-137).

The full chain is now step-for-step faithful: median-of-ratios size
factors, rough/moments initial dispersion, mu-fixed Cox-Reid steepest
ascent alternated with the GLM mean fit (including the load-bearing
stall at the minDisp start for under-dispersed genes), parametric
gamma trend with the 100*minDisp gene filter, MAD prior width floored
at 0.25, mu-fixed MAP with outlier escape, and the one-way Wald test.
Measured deviations vs R on this fixture: p within 1e-3 absolute,
lfcSE within 3e-3, log2FC within 1e-4 — the residual is numerical
(ascent step dynamics), not algorithmic."""

import numpy as np
import pytest

from mdataframe_spark.functions.deseq2 import DESeq2UnpairedAB, size_factors

CONDITION_TO_COLUMNS = {
    "A": ["sampleA_1", "sampleA_2", "sampleA_3"],
    "B": ["sampleB_1", "sampleB_2", "sampleB_3"],
}

GOLDEN = {
    #        baseMean   log2FC     lfcSE     stat       p          padj
    "genA": (10.56910, 0.651101, 0.964211, 0.675268, 0.4995057, 0.4995057),
    "genB": (9.00409, 1.574702, 0.923656, 1.704858, 0.0882209, 0.1764419),
    "genC": (15.02513, -1.746445, 0.760585, -2.296187, 0.0216652, 0.0866609),
    "genD": (78.92420, -0.409600, 0.505823, -0.809770, 0.4180723, 0.4995057),
}


def test_column_contract():
    d = DESeq2UnpairedAB("A", "B", CONDITION_TO_COLUMNS)
    assert d.logFC_column == "log2FC (DESeq2UnpairedAB)"
    assert d.baseMean_column == "baseMean (DESeq2UnpairedAB)"
    assert d.lfcSE_column == "lfcSE (DESeq2UnpairedAB)"
    assert d.stat_column == "stat (DESeq2UnpairedAB)"
    named = DESeq2UnpairedAB("A", "B", CONDITION_TO_COLUMNS, "othername")
    assert named.suffix == " (othername)"


def test_size_factors_median_of_ratios():
    y = np.array(
        [[23, 2, 21, 23, 3, 4], [12, 14, 14, 4, 4, 5],
         [9, 6, 6, 21, 22, 23], [40, 80, 80, 90, 90, 80]], dtype=float
    )
    sf = size_factors(y)
    # product-of-ratios structure: geometric pattern reproduces raw ratios
    assert sf.shape == (6,)
    np.testing.assert_allclose(sf[0], 1.077519, atol=1e-5)


def test_deseq2_golden(test_frame):
    d = DESeq2UnpairedAB("A", "B", CONDITION_TO_COLUMNS)
    result = d(test_frame)
    rows = {r["__row_id"]: r for r in result.collect()}
    for col in d.columns:
        assert col in result.columns
    for gene, (bm, lfc, se, stat, p, padj) in GOLDEN.items():
        r = rows[gene]
        np.testing.assert_allclose(r[d.baseMean_column], bm, atol=1e-4)
        np.testing.assert_allclose(r[d.logFC_column], lfc, atol=2e-4)
        np.testing.assert_allclose(r[d.lfcSE_column], se, atol=3e-3)
        np.testing.assert_allclose(r[d.stat_column], stat, atol=5e-3)
        np.testing.assert_allclose(r[d.p_column], p, atol=1e-3)
        np.testing.assert_allclose(r[d.fdr_column], padj, atol=2e-3)
    # evidence ordering matches R exactly
    got_order = sorted(GOLDEN, key=lambda g: rows[g][d.p_column])
    exp_order = sorted(GOLDEN, key=lambda g: GOLDEN[g][4])
    assert got_order == exp_order


def test_fixed_dispersion_deterministic(test_frame):
    d1 = DESeq2UnpairedAB("A", "B", CONDITION_TO_COLUMNS, dispersion=0.2)
    d2 = DESeq2UnpairedAB("A", "B", CONDITION_TO_COLUMNS, dispersion=0.2)
    r1 = {r["__row_id"]: r[d1.p_column] for r in d1(test_frame).collect()}
    r2 = {r["__row_id"]: r[d2.p_column] for r in d2(test_frame).collect()}
    assert r1 == r2
    assert all(0 <= v <= 1 for v in r1.values())


GOLDEN_3COND = {
    #        baseMean    log2FC      lfcSE      stat        p           padj
    "genA": (10.302582, 0.6577772, 0.8259099, 0.7964272, 0.425783759, 0.42578376),
    "genB": (8.938091, 1.5981515, 0.7503795, 2.1297910, 0.033188868, 0.06637774),
    "genC": (15.465866, -1.7288386, 0.6314611, -2.7378387, 0.006184439, 0.02473776),
    "genD": (78.136713, -0.3961812, 0.4143803, -0.9560813, 0.339031148, 0.42578376),
}


def test_deseq2_unpaired_three_conditions(spark):
    """Reference golden: tests/test_differential.py:194-229 — extra
    condition C contributes replicates to the dispersion fit."""
    from mdataframe_spark.functions.deseq2 import DESeq2Unpaired

    rows = [
        ("genA", 23, 2, 21, 23, 3, 4, 20, 4, 6),
        ("genB", 12, 14, 14, 4, 4, 5, 12, 7, 7),
        ("genC", 9, 6, 6, 21, 22, 23, 12, 22, 13),
        ("genD", 40, 80, 80, 90, 90, 80, 70, 75, 76),
    ]
    cols = ["__row_id"] + [f"sample{c}_{i}" for c in "ABC" for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, cols)
    c2c = {
        "A": ["sampleA_1", "sampleA_2", "sampleA_3"],
        "B": ["sampleB_1", "sampleB_2", "sampleB_3"],
        "C": ["sampleC_1", "sampleC_2", "sampleC_3"],
    }
    d = DESeq2Unpaired("A", "B", c2c, include_other_columns_for_variance=True)
    assert d.suffix == " (DESeq2Unpaired)"
    assert d.other_columns == c2c["C"]
    res = {r["__row_id"]: r for r in d(df).collect()}
    for gene, (bm, lfc, se, stat, p, padj) in GOLDEN_3COND.items():
        r = res[gene]
        np.testing.assert_allclose(r[d.baseMean_column], bm, atol=1e-4)
        np.testing.assert_allclose(r[d.logFC_column], lfc, atol=3e-4)
        np.testing.assert_allclose(r[d.lfcSE_column], se, atol=5e-3)
        np.testing.assert_allclose(r[d.stat_column], stat, atol=1.5e-2)
        np.testing.assert_allclose(r[d.p_column], p, atol=2e-3)
        np.testing.assert_allclose(r[d.fdr_column], padj, atol=3e-3)
    got_order = sorted(GOLDEN_3COND, key=lambda g: res[g][d.p_column])
    exp_order = sorted(GOLDEN_3COND, key=lambda g: GOLDEN_3COND[g][4])
    assert got_order == exp_order
