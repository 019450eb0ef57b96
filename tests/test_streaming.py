"""Structured Streaming operators: drive a real micro-batch stream from
a parquet file source and check the windowed aggregation against the
same plan executed in batch."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.streaming.windows import (
    filtered_stream,
    run_to_memory_sink,
    stream_from_parquet_dir,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events-like parquet dir with proper (micro-second) timestamps."""
    src = tmp_path_factory.mktemp("events_stream")
    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1700000000_000000) + F.col("id") * 30_000_000).cast("bigint")
        ).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(src / "events"))
    return str(src / "events")


def test_windowed_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    schema = batch.schema

    stream = stream_from_parquet_dir(spark, events_dir, schema)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, watermark="2 hours")
    q = run_to_memory_sink(agg, "win_counts")
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(batch, watermark=None).collect()
    }
    assert got == expected
    assert len(got) > 3


def test_filtered_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = stream_from_parquet_dir(spark, events_dir, schema)
    flt = filtered_stream(stream, [("value", ">", 4), ("event_type", "in", ["1", "2"])])
    assert flt.isStreaming
    q = run_to_memory_sink(flt, "flt_events")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM flt_events").collect()
    batch_n = (
        spark.read.parquet(events_dir)
        .filter((F.col("value") > 4) & F.col("event_type").isin(["1", "2"]))
        .count()
    )
    assert len(rows) == batch_n > 0
    assert all(r["value"] > 4 for r in rows)
