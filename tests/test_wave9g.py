"""Unit tests for the round-9 wave G operators: histogram quantile
sketch (cells, gate, mergeability) and the one-pass completeness
profile."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.diagnostics import completeness_profile
from mdataframe_spark.operators.sketches import (
    histogram_cells,
    histogram_quantile_gate,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x DOUBLE")


def test_histogram_cells_binning_clamp_and_nulls(spark):
    df = spark.createDataFrame(
        [(0.5,), (9.5,), (10.0,), (99.0,), (150.0,), (-5.0,), (None,)],
        "x DOUBLE",
    )
    cells = {
        r["__bin"]: r["__c"]
        for r in histogram_cells(df, "x", lo=0.0, hi=100.0, n_bins=10).collect()
    }
    # 0.5 -> bin 0; 9.5 -> bin 0; 10.0 -> bin 1; 99 -> bin 9;
    # 150 clamps to 9; -5 clamps to 0; NULL drops
    assert cells == {0: 3, 1: 1, 9: 2}


def test_histogram_cells_are_additive(spark):
    xs = [(i * 37) % 100 + 0.5 for i in range(500)]
    a = _vals(spark, xs[:200])
    b = _vals(spark, xs[200:])
    full = _vals(spark, xs)

    def cells(df):
        return {
            r["__bin"]: r["__c"]
            for r in histogram_cells(df, "x", 0.0, 100.0, 20).collect()
        }

    ca, cb, cf = cells(a), cells(b), cells(full)
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cf


def test_histogram_quantile_gate_bound_holds(spark):
    xs = [((i * i * 13) % 1000) + 0.5 for i in range(3000)]
    df = _vals(spark, xs)
    out = histogram_quantile_gate(
        df, "x", lo=0.0, hi=1000.0, n_bins=100,
        probs=(0.1, 0.5, 0.9, 0.99),
    ).collect()
    assert len(out) == 4
    width = 1000.0 / 100
    for r in out:
        assert r["within_bound"], r
        assert r["abs_err"] <= 2 * width + 1e-9
        # sanity: the estimate is in the value range
        assert 0 <= r["hist_estimate"] <= 1000


def test_histogram_quantile_gate_exact_on_bin_uniform_data(spark):
    # one value per bin center: estimates land within a bin width even
    # at the extremes
    xs = [b * 10 + 5.0 for b in range(100) for _ in range(10)]
    out = histogram_quantile_gate(
        df=_vals(spark, xs), col="x", lo=0.0, hi=1000.0, n_bins=100,
        probs=(0.5,),
    ).collect()[0]
    assert abs(out["hist_estimate"] - out["exact_value"]) <= 10.0


def test_histogram_gate_rejects_bad_range(spark):
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_cells(_vals(spark, [1.0]), "x", 5.0, 5.0)


def test_histogram_stream_matches_batch(spark, tmp_path_factory):
    from mdataframe_spark.streaming.sketches import histogram_stream

    src = tmp_path_factory.mktemp("hist_stream") / "vals"
    df = spark.range(400).select(
        ((F.col("id") * 29) % 977).cast("double").alias("x")
    )
    df.coalesce(4).write.mode("overwrite").parquet(str(src))
    batch = spark.read.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        histogram_stream(stream, "x", 0.0, 1000.0, 50)
        .writeStream.format("memory")
        .queryName("hist_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["__bin"]): r["__c"]
        for r in spark.sql("SELECT * FROM hist_cells").collect()
    }
    expected = {
        (r["__bin"]): r["__c"]
        for r in histogram_cells(batch, "x", 0.0, 1000.0, 50).collect()
    }
    assert streamed == expected and sum(expected.values()) == 400


def test_completeness_profile_fixture(spark):
    rows = [
        (1, "a", None),
        (2, "a", 1.5),
        (3, None, 1.5),
        (4, "b", None),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, s STRING, v DOUBLE")
    out = {
        r["column_name"]: r
        for r in completeness_profile(df, ["k", "s", "v"]).collect()
    }
    assert out["k"]["n_rows"] == 4
    assert out["k"]["n_null"] == 0 and out["k"]["n_distinct"] == 4
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_null"] == 2 and out["v"]["n_distinct"] == 1
    assert out["v"]["null_rate"] == pytest.approx(0.5)


def test_completeness_profile_single_scan_plan(spark):
    # the whole profile must compile to ONE aggregate over ONE scan
    # (Expand), never k scans
    df = spark.createDataFrame([(1, "a")], "k BIGINT, s STRING")
    plan = completeness_profile(df, ["k", "s"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1
