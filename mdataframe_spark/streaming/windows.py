"""Structured Streaming operators (SURVEY.md §2.10 — engine extension;
the reference is strictly batch).

Streaming variants of the engine's filter/aggregate surface for
event-style tables: tumbling/sliding window aggregation with
watermarked late-data handling, plus a filtered pass-through. Each
builder takes a streaming OR batch DataFrame — the logical plan is
identical, which is how the batch oracle (queries.st_events_window)
checks the streaming semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..filter import Filter


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: Optional[str] = None,
    group_cols: Sequence[str] = ("event_type",),
    watermark: Optional[str] = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) window aggregation.

    On a streaming input, the watermark bounds state: windows older
    than max(event time) - watermark are finalized and evicted —
    without it, a grouped-aggregation stream cannot run in append mode.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def filtered_stream(events: DataFrame, filter_terms: list) -> DataFrame:
    """Filter-DSL applied to a stream: stateless, fully push-down-able."""
    return Filter(filter_terms)(events)


def stream_from_parquet_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (each new file is a
    micro-batch) — the standard replayable local source for tests."""
    return spark.readStream.schema(schema).parquet(path)


def run_to_memory_sink(
    stream_df: DataFrame,
    table_name: str,
    spark=None,
    output_mode: Optional[str] = None,
):
    """Drain an availableNow stream into an in-memory table and return
    the query handle (caller awaits termination).

    ``output_mode`` default (None) picks ``complete`` for aggregated
    streams, ``append`` otherwise. CAVEAT — complete mode disables the
    watermark-based state eviction that windowed_event_counts relies on
    for its state bound, so it is only safe for this bounded
    availableNow test/drain path. A LONG-RUNNING watermarked windowed
    aggregation must pass ``output_mode="append"`` (finalized windows
    are emitted as the watermark passes them and their state is
    evicted); note append emits nothing for windows the final watermark
    never passed.
    """
    if output_mode is None:
        output_mode = "complete" if _has_aggregation(stream_df) else "append"
    return (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def windowed_quality_metrics(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "payload",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = (),
    min_quality: float = 0.0,
) -> DataFrame:
    """Ingestion-monitoring windows over a DOCUMENT stream: per window
    (and optional shard keys), the count, kept-fraction under a
    quality threshold, and the mean quality / token-count / stopword
    ratio of arriving text.

    This is the streaming face of the batch quality scorer
    (operators/text.py quality_features): the per-document features are
    the same codegen'd expressions, so a corpus pipeline can gate its
    ingestion on the identical signal it later filters with in batch —
    batch/stream agreement is asserted by the parity test. Watermarked
    grouped aggregation: state is bounded by the watermark horizon.
    """
    from ..operators.text import quality_features

    df = docs
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    scored = quality_features(
        df.withColumnRenamed(text_col, "text"), "text"
    )
    return (
        scored.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("quality_score").alias("avg_quality"),
            F.avg("n_tokens").alias("avg_tokens"),
            F.avg("stopword_ratio").alias("avg_stopword_ratio"),
            F.avg(
                (F.col("quality_score") >= min_quality).cast("double")
            ).alias("keep_fraction"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_docs",
            "avg_quality",
            "avg_tokens",
            "avg_stopword_ratio",
            "keep_fraction",
        )
    )
