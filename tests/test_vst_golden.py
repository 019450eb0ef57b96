"""VST golden parity (reference: tests/test_transformations.py:128-143).

The closed-form transform is exact given the dispersion trend (a grid
search over (a0, a1) reproduces the golden to 2e-5 at R's values
0.1294/2.9748); our blind APL gene estimates + gamma IRLS land at
0.132/3.04 on this fixture → max deviation ~6e-3 (documented: the
residual is DESeq2's C++ gene-wise estimator internals, no R here to
cross-check)."""

import numpy as np

from mdataframe_spark.functions.vst import VST

SAMPLES = ["sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3"]

R_VST = {
    "genA": [5.130107, 3.792689, 4.813833, 4.873514, 3.929090, 4.046865],
    "genB": [4.587514, 5.037780, 4.502475, 3.795954, 4.074965, 4.170356],
    "genC": [4.384594, 4.377605, 3.990550, 4.797907, 5.371575, 5.363428],
    "genD": [5.681789, 6.966835, 6.152893, 6.268157, 6.991604, 6.775741],
}


def test_vst_contract(test_frame, samples_to_group):
    vst = VST(samples_to_group)
    assert vst.name == "VST"
    assert vst.suffix == " (VST)"
    import pytest

    with pytest.raises(ValueError, match="Transformer calls need a DataFrame"):
        vst("this is not a dataframe")


def test_vst_golden(test_frame, samples_to_group):
    vst = VST(samples_to_group)
    result = vst(test_frame)
    rows = {r["__row_id"]: r for r in result.collect()}
    for gene, expected in R_VST.items():
        got = [rows[gene][s + " (VST)"] for s in SAMPLES]
        np.testing.assert_allclose(got, expected, atol=0.02)
    # trend parameters close to R's (0.1294, 2.9748)
    a0, a1 = vst.trend_
    assert abs(a0 - 0.1294) < 0.02 and abs(a1 - 2.9748) < 0.3, (a0, a1)


def test_vst_monotone_and_stabilizing(test_frame, samples_to_group):
    """Property: VST is monotone in counts and compresses large values."""
    vst = VST(samples_to_group)
    rows = {r["__row_id"]: r for r in vst(test_frame).collect()}
    raw = {r["__row_id"]: r for r in test_frame.collect()}
    for s in SAMPLES:
        order_raw = sorted(raw, key=lambda g: raw[g][s])
        order_vst = sorted(rows, key=lambda g: rows[g][s + " (VST)"])
        assert order_raw == order_vst


def test_vst_trend_partition_invariant(spark):
    """The stat_vst oracle freezes the fitted (a0, a1) at the driver's
    SF — sound ONLY because the fit is bit-reproducible regardless of
    partitioning (the IRLS reduces over sorted pairs). Guard that
    invariant explicitly."""
    from pyspark.sql import functions as F

    from mdataframe_spark.functions.vst import VST

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    def fit(src):
        counts = (
            src.groupBy(F.col("l_partkey").cast("string").alias("__row_id"))
            .pivot("l_returnflag", ["A", "N", "R"])
            .agg(F.sum("l_quantity"))
            .fillna(0.0)
        )
        v = VST()
        v(counts).count()
        return v.trend_

    t1 = fit(li)
    t2 = fit(li.repartition(13))
    assert t1 == t2, (t1, t2)


def test_vst_frozen_oracle_drift_guard(spark, tmp_path):
    """If the sf0.01 testdata ever drifts from the input the frozen
    oracle coefficients were fit on, stat_vst must fail with a
    DISTINGUISHABLE error (not a confusing driver hash mismatch)."""
    import pytest

    from mdataframe_spark.queries import stat_vst

    drifted = tmp_path / "sf0.01"
    drifted.mkdir()
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.limit(59999).write.parquet(str(drifted / "lineitem.parquet"))
    with pytest.raises(RuntimeError, match="testdata drifted"):
        stat_vst(spark, str(drifted))
