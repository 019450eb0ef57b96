"""Golden-parity tests for the native normalization stack.

Expected matrices are the reference's R-derived goldens (reference:
tests/test_transformations.py:74-105) — edgeR calcNormFactors + cpm and
limma removeBatchEffect run on the canonical 4×6 fixture. Our native
Spark implementation must match at decimal=5.
"""

import numpy as np

from mdataframe_spark.functions.norm import TMM, tmm_norm_factors, zscore_rows

SAMPLES = ["sampleA_1", "sampleA_2", "sampleA_3", "sampleB_1", "sampleB_2", "sampleB_3"]

R_TMM = {
    "genA": [17.83412, 15.83628, 17.77050, 17.69636, 15.97150, 16.20760],
    "genB": [17.11131, 17.31247, 17.31247, 16.11376, 16.13496, 16.36352],
    "genC": [16.82961, 16.50897, 16.50897, 17.59148, 17.68496, 17.87144],
    "genD": [18.52032, 19.48979, 19.48979, 19.44007, 19.48721, 19.48176],
}

R_TMM_BATCH = {
    "genA": [17.87226, 15.87443, 17.73236, 17.65821, 15.93335, 16.16945],
    "genB": [16.74595, 16.94712, 17.67783, 16.47911, 16.50032, 16.72888],
    "genC": [17.20207, 16.88143, 16.13651, 17.21902, 17.31250, 17.49898],
    "genD": [18.75514, 19.72461, 19.25496, 19.20524, 19.25238, 19.24694],
}


def collect_by_row(df, suffix=""):
    rows = {r["__row_id"]: r for r in df.collect()}
    return {
        g: [rows[g][s + suffix] for s in SAMPLES] for g in ("genA", "genB", "genC", "genD")
    }


def test_tmm_factors_multiply_to_one(test_frame):
    factors = tmm_norm_factors(test_frame, SAMPLES)
    log_sum = sum(np.log(list(factors.values())))
    np.testing.assert_almost_equal(log_sum, 0.0, decimal=10)


def test_tmm_golden(test_frame, samples_to_group):
    tmm = TMM(samples_to_group, suffix=True)
    assert tmm.suffix == " (TMM)"
    result = collect_by_row(tmm(test_frame), " (TMM)")
    for g, expected in R_TMM.items():
        np.testing.assert_almost_equal(result[g], expected, decimal=5)


def test_tmm_batch_golden(test_frame, samples_to_group):
    batches = dict(zip(SAMPLES, ["x"] * 2 + ["y"] * 4))
    tmm = TMM(samples_to_group, batches, suffix=True)
    assert tmm.suffix == " (TMM batch-corrected)"
    result = collect_by_row(tmm(test_frame), " (TMM batch-corrected)")
    for g, expected in R_TMM_BATCH.items():
        np.testing.assert_almost_equal(result[g], expected, decimal=5)


def test_tmm_rejects_non_dataframe(samples_to_group):
    import pytest

    with pytest.raises(ValueError, match="Transformer calls need a DataFrame"):
        TMM(samples_to_group)("this is not a dataframe")


def test_zscore_rows(test_frame):
    out = {r["__row_id"]: r for r in zscore_rows(test_frame, SAMPLES).collect()}
    raw = {
        "genA": [23, 2, 21, 23, 3, 4],
        "genB": [12, 14, 14, 4, 4, 5],
        "genC": [9, 6, 6, 21, 22, 23],
        "genD": [40, 80, 80, 90, 90, 80],
    }
    for g, vals in raw.items():
        arr = np.array(vals, dtype=float)
        expected = (arr - arr.mean()) / arr.std(ddof=1)
        got = [out[g][s] for s in SAMPLES]
        np.testing.assert_almost_equal(got, expected, decimal=10)


def test_zscore_constant_row_is_zero(spark):
    df = spark.createDataFrame([("r1", 5.0, 5.0, 5.0)], ["__row_id", "a", "b", "c"])
    row = zscore_rows(df, ["a", "b", "c"]).collect()[0]
    assert row["a"] == row["b"] == row["c"] == 0.0
