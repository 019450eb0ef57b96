"""Unit tests for the round-9 wave E operators: zone-map statistics /
pruning and weighted reservoir sampling."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.datasets import weighted_reservoir
from mdataframe_spark.operators.layout import zonemap_pruning, zonemap_stats


def test_zonemap_stats_fixture(spark):
    rows = [
        (0, 1.0, 10.0),
        (1, 2.0, 20.0),
        (4096, 50.0, 500.0),
        (4097, 60.0, 600.0),
        (8192, None, 9.0),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, q DOUBLE, p DOUBLE")
    out = {
        r["zone"]: r
        for r in zonemap_stats(df, "k div 4096", ["q", "p"]).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[0]["n_rows"] == 2
    assert out[0]["min_q"] == 1.0 and out[0]["max_q"] == 2.0
    assert out[1]["min_p"] == 500.0 and out[1]["max_p"] == 600.0
    # NULLs are ignored by min/max but counted in n_rows
    assert out[2]["n_rows"] == 1 and out[2]["min_q"] is None


def test_zonemap_pruning_decisions(spark):
    rows = [(0, 5.0), (1, 9.0), (4096, 100.0), (8192, None)]
    df = spark.createDataFrame(rows, "k BIGINT, p DOUBLE")
    stats = zonemap_stats(df, "k div 4096", ["p"])
    out = {
        r["zone"]: r["prunable"]
        for r in zonemap_pruning(stats, "p", 50.0, 60.0).collect()
    }
    # zone 0 spans [5,9] < 50 -> prunable; zone 1 holds 100 > 60 ->
    # prunable; zone 2 has a NULL envelope -> NOT prunable
    assert out[0] is True
    assert out[1] is True
    assert out[2] is False

    overlapping = {
        r["zone"]: r["prunable"]
        for r in zonemap_pruning(stats, "p", 8.0, 120.0).collect()
    }
    assert overlapping[0] is False and overlapping[1] is False


def test_weighted_reservoir_matches_direct_replay(spark):
    rows = [(i, float(10 + i)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w DOUBLE")
    got = weighted_reservoir(df, "doc_id", "w", k=10).collect()
    assert len(got) == 10

    def priority(key, w, seed=42):
        h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 2**32
        return round(math.log(u) / w, 9)

    expect = sorted(
        ((priority(i, w), i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    for r, (p, i, w) in zip(got, expect):
        assert r["doc_id"] == i
        assert r["priority"] == pytest.approx(p, abs=1e-9)
        assert r["weight"] == w


def test_weighted_reservoir_is_deterministic_and_filters_weights(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w DOUBLE")
    a = weighted_reservoir(df, "doc_id", "w", k=10).collect()
    b = weighted_reservoir(df, "doc_id", "w", k=10).collect()
    assert a == b
    assert {r["doc_id"] for r in a} == {1, 5}


def test_weighted_reservoir_prefers_heavy_keys(spark):
    # one key with 50x the weight of the rest should be selected in
    # (nearly) every seed's top-3 of 30 keys
    rows = [(i, 500.0 if i == 7 else 10.0) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w DOUBLE")
    hits = 0
    for seed in range(20):
        got = weighted_reservoir(df, "doc_id", "w", k=3, seed=seed).collect()
        hits += any(r["doc_id"] == 7 for r in got)
    assert hits >= 15
