"""Unit/property tests for operators/timeseries.py: ACF against a
direct numpy replay, CUSUM invariants, truncated EWMA against both an
exact per-term replay and pandas' full (untruncated) EWM."""

import math
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.timeseries import (
    acf_lags,
    bucket_series,
    cusum_changepoint,
    ewma_smooth,
    ewma_weights,
)

HOUR_NS = 3_600_000_000_000


def _events_df(spark, counts):
    """Synthetic event stream: counts[i] rows inside hour-bucket i,
    value = 1.0 + row index within the bucket."""
    rows = []
    for b, n in enumerate(counts):
        for j in range(n):
            rows.append((b * HOUR_NS + j * 1_000_000, float(1 + j)))
    return spark.createDataFrame(rows, "ts BIGINT, value DOUBLE")


def test_bucket_series_counts_and_value_sums(spark):
    df = _events_df(spark, [3, 0, 2])
    s = {r["bucket"]: r["x"] for r in bucket_series(df).collect()}
    assert s == {0: Decimal("3.0000"), 2: Decimal("2.0000")}
    sv = {
        r["bucket"]: r["x"]
        for r in bucket_series(df, value_col="value").collect()
    }
    # bucket 0 holds values 1+2+3, bucket 2 holds 1+2
    assert sv == {0: Decimal("6.0000"), 2: Decimal("3.0000")}


def test_acf_matches_numpy_replay(spark):
    counts = [5, 8, 2, 9, 4, 7, 7, 1, 6, 3, 8, 5]
    df = _events_df(spark, counts)
    out = {r["lag"]: r for r in acf_lags(df, max_lag=3).collect()}
    x = np.array([c for c in counts if c > 0], dtype=float)
    buckets = np.array([i for i, c in enumerate(counts) if c > 0])
    m = x.mean()
    den = ((x - m) ** 2).sum()
    for lag in (1, 2, 3):
        pos = {b: v for b, v in zip(buckets, x)}
        pairs = [
            (pos[b], pos[b + lag]) for b in buckets if (b + lag) in pos
        ]
        num = sum((a - m) * (c - m) for a, c in pairs)
        assert out[lag]["n_pairs"] == len(pairs)
        assert out[lag]["acf"] == pytest.approx(num / den, abs=2e-6)


def test_acf_constant_series_is_null(spark):
    # zero variance -> denominator 0 -> NULL acf, never a div-by-zero
    df = _events_df(spark, [4, 4, 4, 4, 4, 4])
    for r in acf_lags(df, max_lag=2).collect():
        assert r["acf"] is None
        assert r["n_pairs"] > 0


def test_acf_strong_period_two_signal(spark):
    # alternating high/low: acf(1) strongly negative, acf(2) positive
    df = _events_df(spark, [10, 2] * 8)
    out = {r["lag"]: r["acf"] for r in acf_lags(df, max_lag=2).collect()}
    assert out[1] < -0.8
    assert out[2] > 0.8


def test_cusum_flags_the_level_shift(spark):
    # mean jumps from 2 to 10 after bucket 7: |S_t| peaks at the shift
    counts = [2] * 8 + [10] * 8
    df = _events_df(spark, counts)
    rows = cusum_changepoint(df).collect()
    flagged = [r for r in rows if r["is_changepoint"]]
    assert len(flagged) == 1
    assert flagged[0]["bucket"] == 7
    # replay S_t directly
    x = np.array(counts, dtype=float)
    m = x.mean()
    s_t = np.cumsum(x) - (np.arange(len(x)) + 1) * m
    for r in rows:
        assert r["cusum"] == pytest.approx(s_t[r["bucket"]], abs=2e-6)


def test_cusum_single_changepoint_flag_even_on_ties(spark):
    # symmetric series -> |S_t| ties; exactly one flag, lowest bucket
    df = _events_df(spark, [1, 3, 1, 3])
    rows = cusum_changepoint(df).collect()
    assert sum(r["is_changepoint"] for r in rows) == 1


def test_ewma_weights_exact_decimals():
    w = ewma_weights(0.3, 3)
    assert w == ["1", "0.7", "0.49", "0.343"]
    with pytest.raises(ValueError):
        ewma_weights(0.30001, 3)


def test_ewma_constant_series_is_flat(spark):
    df = _events_df(spark, [4] * 10)
    for r in ewma_smooth(df, alpha=0.3, max_lag=5).collect():
        assert r["ewma"] == pytest.approx(4.0, abs=1e-9)


def test_ewma_matches_per_term_replay_and_pandas(spark):
    counts = [5, 8, 2, 9, 4, 7, 7, 1, 6, 3, 8, 5, 9, 2, 4, 6]
    alpha, L = 0.3, 12
    df = _events_df(spark, counts)
    out = {r["bucket"]: r for r in ewma_smooth(df, alpha=alpha, max_lag=L).collect()}
    w = [float(v) for v in ewma_weights(alpha, L)]
    for t, _ in enumerate(counts):
        num = sum(
            w[k] * counts[t - k] for k in range(min(t, L) + 1)
        )
        den = sum(w[k] for k in range(min(t, L) + 1))
        assert out[t]["n_terms"] == min(t, L) + 1
        assert out[t]["ewma"] == pytest.approx(num / den, abs=2e-6)
    # vs pandas' untruncated adjust=True EWM: identical while t <= L,
    # within the documented <1% tail-weight error beyond
    ref = pd.Series(counts, dtype=float).ewm(alpha=alpha, adjust=True).mean()
    for t, _ in enumerate(counts):
        tol = 1e-6 if t <= L else abs(ref[t]) * 0.01 + 1e-6
        assert out[t]["ewma"] == pytest.approx(ref[t], abs=tol)


def test_ewma_gap_buckets_are_skipped_not_zeroed(spark):
    # bucket 1 empty: its weight must not appear in bucket 2's denom
    df = _events_df(spark, [6, 0, 3])
    out = {r["bucket"]: r for r in ewma_smooth(df, alpha=0.5, max_lag=4).collect()}
    assert set(out) == {0, 2}
    w = [float(v) for v in ewma_weights(0.5, 4)]
    # bucket 2 sees lags 0 (x=3) and 2 (x=6) only
    expect = (w[0] * 3 + w[2] * 6) / (w[0] + w[2])
    assert out[2]["n_terms"] == 2
    assert out[2]["ewma"] == pytest.approx(expect, abs=1e-6)


def test_ewma_ladder_width_guard(spark):
    # alpha with 4 decimal digits at a high lag count needs more frac
    # digits than the 38-precision product budget allows -> explicit
    # error, never a silent decimal rounding divergence
    df = _events_df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="decimal precision 38"):
        # (0.8766)^7 has 28 frac digits -> 18 + 30 > 38
        ewma_smooth(df, alpha=0.1234, max_lag=7)


def test_timestamp_typed_input_is_canonicalized(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:30:00",), ("2024-01-01 01:30:00",)], "ts STRING"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    s = {r["bucket"]: r["x"] for r in bucket_series(df).collect()}
    base = 1704067200 // 3600
    assert s == {base: Decimal("1.0000"), base + 1: Decimal("1.0000")}
