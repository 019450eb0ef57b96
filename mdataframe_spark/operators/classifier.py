"""Distributed logistic-regression quality classifier.

The reference has no ML classifier surface; this is a training-data
pipeline extension (the fastText-style "quality classifier" stage every
large-scale corpus pipeline runs: learn a smooth scorer by distilling a
hand-written rule battery — here the Gopher rules — into a calibrated
probability, then threshold or importance-sample on it).

100 TB design
-------------
Each Newton/IRLS iteration is ONE codegen'd partial aggregation that
produces the d(d+1)/2 + d sufficient-statistic MEANS (d ~ 5 features):

    H_jk = mean( p(1-p) * x_j * x_k )      (Hessian / n)
    g_j  = mean( (y - p) * x_j )           (gradient / n)

with p = sigmoid(x . w) inlined as a literal-weight expression. The
driver solves the d x d system (O(d^3) scalar work, microseconds) and
broadcasts the next weight vector back as literals in the next
iteration's expressions. No Python in the data path, no shuffle of any
data row — only the O(d^2) one-row stat frame ever reaches the driver,
per iteration, regardless of corpus size.

Determinism: the stat means are rounded to ``stat_dp`` (default 9)
decimal places before the solve, absorbing partition-order FP noise in
the partial aggregation — the same convention ml_kmeans_lloyd uses
between Lloyd iterations — so the fitted weights are bit-identical
across partitionings/cluster sizes, and scores are reproducible.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _WS, stopword_hits, token_count, tokens

__all__ = [
    "classifier_features",
    "logreg_sufficient_stats",
    "logreg_fit",
    "logreg_score",
    "FEATURE_COLS",
]

# canonical feature set for the document quality classifier — each a
# bounded, codegen'd expression over the raw text (no UDFs), so the
# featurization pushes into the scan stage
FEATURE_COLS = ("f_tok", "f_ttr", "f_stop", "f_wlen")


def classifier_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the canonical bounded feature columns.

    f_tok  = min(n_tokens / 100, 1)          (length, saturating)
    f_ttr  = distinct tokens / tokens        (type-token ratio —
                                              repetition/diversity)
    f_stop = min(stopword_ratio * 5, 1)      (english-ness, saturating)
    f_wlen = mean word length / 10           (vocabulary shape)

    All single-pass JVM expressions over the scan (no Python UDFs);
    ranges ~[0, 1.5] so the IRLS Hessian is well-conditioned without
    standardization.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    nospace = F.length(F.regexp_replace(t, _WS, ""))
    return df.withColumns(
        {
            "f_tok": F.least(n_tokens / F.lit(100.0), F.lit(1.0)),
            "f_ttr": F.size(F.array_distinct(toks)) / n_tokens,
            "f_stop": F.least(
                stopword_hits(t, "en") / n_tokens * 5.0, F.lit(1.0)
            ),
            "f_wlen": nospace / n_tokens / 10.0,
        }
    )


def _margin(feature_cols: Sequence[str], weights: Sequence[float]) -> Column:
    """x . w with the intercept first — weights[0] + sum w_j x_j, as one
    literal-folded codegen expression."""
    m: Column = F.lit(float(weights[0]))
    for c, w in zip(feature_cols, weights[1:]):
        m = m + F.col(c) * float(w)
    return m


def _sigmoid(m: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-m))


def logreg_sufficient_stats(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weights: Optional[Sequence[float]] = None,
) -> DataFrame:
    """One-row frame of the IRLS sufficient-statistic means at
    ``weights`` (default all-zero, where p = 0.5 exactly).

    Columns: ``n_docs`` plus ``h_<j>_<k>`` (j <= k, Hessian means over
    the intercept-augmented feature vector x_0 = 1, x_1.., x_d) and
    ``g_<j>`` (gradient means). This is the ENTIRE cross-worker traffic
    of one Newton iteration — O(d^2) scalars.

    Rows with any null feature or label are excluded up front
    (complete-case): F.avg skips nulls PER COLUMN, so without the
    filter a partially-null row would contribute to n_docs and to some
    h/g cells but not others — mutually inconsistent means and a
    silently biased Newton step. With the filter every mean shares one
    denominator."""
    d = len(feature_cols) + 1
    if weights is None:
        weights = [0.0] * d
    complete = F.lit(True)
    for c in list(feature_cols) + [label_col]:
        complete = complete & F.col(c).isNotNull()
    df = df.filter(complete)
    xs: List[Column] = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    p = _sigmoid(_margin(feature_cols, weights))
    wvar = p * (1.0 - p)
    y = F.col(label_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for j in range(d):
        for k in range(j, d):
            aggs.append(F.avg(wvar * xs[j] * xs[k]).alias(f"h_{j}_{k}"))
    for j in range(d):
        aggs.append(F.avg((y - p) * xs[j]).alias(f"g_{j}"))
    return df.agg(*aggs)


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str] = FEATURE_COLS,
    label_col: str = "label",
    iters: int = 8,
    ridge: float = 1e-9,
    stat_dp: int = 9,
) -> np.ndarray:
    """Newton/IRLS fit; returns the (d+1,) weight vector (intercept
    first). At most ``iters`` iterations, stopping early when the
    ``stat_dp``-rounded weights reach an exact fixed point — a
    deterministic criterion (the rounded stats are partition-invariant
    by design, so the stop fires at the same iteration everywhere) that
    cannot change the answer: once w_{t+1} == w_t exactly, every later
    iteration reproduces the same w, so the early exit returns the
    identical vector the full ``iters`` loop would. ``ridge``
    regularizes the solve; stat means rounded to ``stat_dp`` before the
    solve (see module docstring)."""
    d = len(feature_cols) + 1
    w = np.zeros(d)
    for _ in range(iters):
        row = (
            logreg_sufficient_stats(df, feature_cols, label_col, w)
            .collect()[0]
            .asDict()
        )
        H = np.zeros((d, d))
        g = np.zeros(d)
        for j in range(d):
            for k in range(j, d):
                v = round(float(row[f"h_{j}_{k}"]), stat_dp)
                H[j, k] = H[k, j] = v
            g[j] = round(float(row[f"g_{j}"]), stat_dp)
        w_next = w + np.linalg.solve(H + ridge * np.eye(d), g)
        # re-round the weights themselves: the solve amplifies the
        # stat rounding noise by cond(H); 9 dp on weights ~ O(1) keeps
        # the NEXT iteration's p expressions bit-identical everywhere
        w_next = np.round(w_next, stat_dp)
        if np.array_equal(w_next, w):
            break
        w = w_next
    return w


def logreg_score(
    df: DataFrame,
    weights: Sequence[float],
    feature_cols: Sequence[str] = FEATURE_COLS,
    out_col: str = "p_good",
) -> DataFrame:
    """Attach the predicted keep-probability under ``weights`` — a pure
    literal-weight codegen expression (the deployment path: scoring
    100 TB is a filter pushed into the scan, zero shuffles)."""
    return df.withColumn(out_col, _sigmoid(_margin(feature_cols, weights)))
