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


# ---------------------------------------------------------------------------
# round 7: quantile normalization + upper-quartile factors
# ---------------------------------------------------------------------------
def test_quantile_normalize_vs_independent_numpy(spark):
    """Pinned to an independent numpy recomputation of limma's
    normalizeQuantiles (ties receive the mean target over their rank
    range), written here with argsort/where — not the window/groupBy
    path the operator uses."""
    import numpy as np
    import pytest

    from mdataframe_spark.functions.norm import quantile_normalize

    X = np.array(
        [
            [5.0, 4.0, 3.0],
            [2.0, 1.0, 4.0],
            [3.0, 4.0, 6.0],
            [4.0, 2.0, 8.0],
            [3.0, 3.0, 1.0],  # ties in columns 0 and 1
        ]
    )
    means = np.sort(X, axis=0).mean(axis=1)
    expect = np.empty_like(X)
    for j in range(X.shape[1]):
        sc = np.sort(X[:, j])
        for i, v in enumerate(X[:, j]):
            expect[i, j] = means[np.where(sc == v)[0]].mean()

    rows = [(i, *(float(x) for x in X[i])) for i in range(X.shape[0])]
    df = spark.createDataFrame(
        rows, "gid bigint, s1 double, s2 double, s3 double"
    )
    out = {
        r["gid"]: r
        for r in quantile_normalize(
            df, ["s1", "s2", "s3"], index_column="gid"
        ).collect()
    }
    for i in range(X.shape[0]):
        for j, c in enumerate(["s1_qn", "s2_qn", "s3_qn"]):
            assert out[i][c] == pytest.approx(expect[i, j], abs=1e-5), (i, c)
    # a tie-free column lands EXACTLY on the target distribution (the
    # defining property; tied columns deviate by construction — their
    # tied values share the averaged target, as in limma ties=TRUE)
    vals = sorted(out[i]["s3_qn"] for i in range(X.shape[0]))
    assert vals == pytest.approx(sorted(means), abs=1e-5)


def test_quantile_normalize_rejects_nulls(spark):
    import pytest as _pytest

    from mdataframe_spark.functions.norm import quantile_normalize

    df = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, None, 3.0)], "gid bigint, s1 double, s2 double"
    )
    with _pytest.raises(ValueError, match="short a sample"):
        quantile_normalize(df, ["s1", "s2"], index_column="gid")


def test_upper_quartile_factors_hand_computed(spark):
    import math

    from mdataframe_spark.functions.norm import upper_quartile_factors

    rows = [
        (10.0, 100.0), (20.0, 200.0), (30.0, 300.0), (40.0, 400.0),
    ]
    import pytest

    df = spark.createDataFrame(rows, "s1 double, s2 double")
    got = upper_quartile_factors(df, ["s1", "s2"])
    # q75 (type-7): 32.5 / 325; lib: 100 / 1000 -> f = 0.325 for both
    # -> geometric mean 0.325 -> factors 1.0, 1.0
    assert got == {"s1": 1.0, "s2": 1.0}
    # asymmetric: s2 upper quartile inflated
    df2 = spark.createDataFrame(
        [(10.0, 10.0), (20.0, 20.0), (30.0, 30.0), (40.0, 140.0)],
        "s1 double, s2 double",
    )
    g2 = upper_quartile_factors(df2, ["s1", "s2"])
    f1, f2 = 32.5 / 100.0, 57.5 / 200.0
    gm = math.exp((math.log(f1) + math.log(f2)) / 2)
    assert g2["s1"] == pytest.approx(f1 / gm, abs=1e-9)
    assert g2["s2"] == pytest.approx(f2 / gm, abs=1e-9)


def test_upper_quartile_zero_quantile_raises(spark):
    import pytest as _pytest

    from mdataframe_spark.functions.norm import upper_quartile_factors

    df = spark.createDataFrame(
        [(0.0, 1.0)] * 10, "s1 double, s2 double"
    )
    with _pytest.raises(ValueError, match="zero"):
        upper_quartile_factors(df, ["s1", "s2"])
