"""Distributed logistic-regression quality classifier
(operators/classifier.py).

The fit is pinned to an INDEPENDENT full-batch Newton implementation in
numpy (no shared code with the Spark path beyond the math), and the
determinism contract — identical weights regardless of partitioning —
is asserted directly, since that is what makes ml_quality_classifier's
output reproducible and the suffstats oracle meaningful.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.classifier import (
    FEATURE_COLS,
    classifier_features,
    logreg_fit,
    logreg_score,
    logreg_sufficient_stats,
)
from mdataframe_spark.operators.text import gopher_rules

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        classifier_features(gopher_rules(docs, min_tokens=30))
        .select("doc_id", "keep", *FEATURE_COLS)
        .cache()
    )


def _numpy_irls(X, y, iters=8, ridge=1e-9):
    """Independent reference: full-batch Newton on the collected data,
    no sufficient-statistic factoring, no rounding."""
    n, d = X.shape
    w = np.zeros(d)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        W = p * (1.0 - p)
        H = (X * W[:, None]).T @ X / n
        g = X.T @ (y - p) / n
        w = w + np.linalg.solve(H + ridge * np.eye(d), g)
    return w


def test_fit_matches_independent_numpy(feats):
    w_spark = logreg_fit(feats, label_col="keep")
    pdf = feats.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf))] + [pdf[c].to_numpy(dtype=float) for c in FEATURE_COLS]
    )
    y = pdf["keep"].to_numpy(dtype=float)
    w_ref = _numpy_irls(X, y)
    # the Spark path rounds stats/weights at 9 dp between iterations;
    # the amplification through 8 solves stays far below 1e-4 on these
    # well-conditioned bounded features
    np.testing.assert_allclose(w_spark, w_ref, rtol=0, atol=1e-4)


def test_fit_deterministic_across_partitioning(feats):
    w3 = logreg_fit(feats.repartition(3), label_col="keep")
    w11 = logreg_fit(feats.repartition(11), label_col="keep")
    assert np.array_equal(w3, w11), (w3, w11)


def test_classifier_separates(feats):
    """The distilled scorer must beat the majority-class baseline on
    its own training rule (sanity: the features carry the signal)."""
    w = logreg_fit(feats, label_col="keep")
    scored = logreg_score(feats, w)
    agg = scored.agg(
        F.avg(F.col("keep").cast("double")).alias("base"),
        F.avg(
            ((F.col("p_good") >= 0.5) == F.col("keep")).cast("double")
        ).alias("acc"),
    ).collect()[0]
    majority = max(agg["base"], 1.0 - agg["base"])
    assert agg["acc"] > majority, (agg["acc"], majority)


def test_suffstats_symmetric_layout(feats):
    """At w=0 the Hessian means are exactly 0.25*mean(x_j x_k) and the
    intercept-intercept cell is exactly 0.25."""
    row = logreg_sufficient_stats(feats, FEATURE_COLS, "keep").collect()[0]
    assert row["h_0_0"] == pytest.approx(0.25, abs=1e-12)
    assert row["n_docs"] == feats.count()


def test_suffstats_null_features_excluded_complete_case(spark):
    """A row with ANY null feature must contribute to NOTHING: F.avg
    skips nulls per column, so without the complete-case filter the
    row would inflate n_docs and some h/g cells but not others — the
    stats must equal those of the manually-filtered frame exactly."""
    rows = [
        (1, 0.5, 0.4, 0.3, 0.2, 1),
        (2, 0.9, 0.8, 0.7, 0.6, 0),
        (3, None, 0.1, 0.2, 0.3, 1),   # null feature
        (4, 0.2, 0.3, None, 0.5, 0),   # null feature
        (5, 0.1, 0.2, 0.3, 0.4, None), # null label
    ]
    cols = ["doc_id", "f_tok", "f_ttr", "f_stop", "f_wlen", "keep"]
    df = spark.createDataFrame(rows, cols)
    full = logreg_sufficient_stats(df, FEATURE_COLS, "keep").collect()[0]
    clean = logreg_sufficient_stats(
        df.dropna(subset=list(FEATURE_COLS) + ["keep"]), FEATURE_COLS, "keep"
    ).collect()[0]
    assert full["n_docs"] == 2
    assert full.asDict() == clean.asDict()


def test_no_python_in_data_path(feats):
    """Fit + score stay JVM-side: no BatchEvalPython / PythonUDF nodes
    in either the stats aggregation or the scoring plan."""
    stats_plan = logreg_sufficient_stats(
        feats, FEATURE_COLS, "keep"
    )._jdf.queryExecution().executedPlan().toString()
    w = np.array([0.1, -0.2, 0.3, 0.4, -0.5])
    score_plan = (
        logreg_score(feats, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan in (stats_plan, score_plan):
        assert "BatchEvalPython" not in plan
        assert "PythonUDF" not in plan
