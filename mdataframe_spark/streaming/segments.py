"""Streaming segment/audit state — streaming twins of the round-9
product-analytics collapses (SURVEY §2.10 extension; the reference is
strictly batch).

Both twins ride the monoid argument established by
streaming/sketches.py (Count-Min, sum-monoid) and streaming/cdc.py
(last-writer-wins, max-monoid):

- ``rfm_stream``: per-user (max last_ts, count, DECIMAL(18,4) value
  sum) — three associative/commutative monoids in one aggregation, so
  the running per-user state after any prefix of micro-batches equals
  the batch :func:`..operators.events.rfm_state` collapse over the
  same rows. State is one row per LIVE USER (the segmentation
  universe any RFM consumer materializes anyway); quintile SCORING is
  deliberately not streamed — ntile over the state belongs in
  foreachBatch / the batch reporting pass, because ranks are global
  properties of the state, not of the stream.
- ``benford_stream``: running first-digit counts — a sum monoid with
  AT MOST 9 state rows, the cheapest live data-quality probe there
  is; feed the counts to benford_test's spine arithmetic in
  foreachBatch for the live χ² spectrum.

Both DELEGATE to the batch collapse (the cdc_stream convention): one
implementation is what guarantees the streamed and batch states can
never diverge — equality- and checkpoint-continuation-tested in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.diagnostics import benford_digit_counts
from ..operators.events import rfm_state


def rfm_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Running per-user RFM sufficient statistic over an event stream:
    (user, last_ts, frequency, monetary). Use ``outputMode("complete")``
    (the state is the live segmentation universe) or fold the update
    stream into a store with ``foreachBatch``. Monetary accumulates as
    an exact decimal (per-event 4-dp rounding, order-independent sum),
    so stream state and batch collapse are equal bit-for-bit, not just
    approximately."""
    return rfm_state(events, user_col, ts_col, value_col)


def benford_stream(events: DataFrame, col: str) -> DataFrame:
    """Running Benford first-digit counts over a stream:
    (digit, n_observed), at most 9 state rows, no watermark needed."""
    return benford_digit_counts(events, col)


def completeness_stream(events: DataFrame, cols) -> DataFrame:
    """Running per-column completeness profile over a stream:
    (column_name, n_rows, n_null, null_rate) — count and null-count
    are SUM monoids, so the running state after any prefix of
    micro-batches equals the batch
    :func:`..operators.diagnostics.completeness_profile` collapse
    (``with_distinct=False`` arm) over the same rows; state is ≤ k
    aggregate cells for a k-column profile. n_distinct is deliberately
    ABSENT: Structured Streaming rejects exact distinct aggregation
    (per-value state is unbounded), and approx_count_distinct's sketch
    would diverge from the batch exact count — violating the
    twin-equality contract every other twin in this package holds.
    Delegates to the batch collapse (the cdc_stream convention), so
    the two arms cannot diverge by construction."""
    from ..operators.diagnostics import completeness_profile

    return completeness_profile(events, cols, with_distinct=False)


def user_spans_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    event_value: str = "purchase",
) -> DataFrame:
    """Running per-user (first_ts, last_ts, converted) state over an
    event stream — the Kaplan-Meier sufficient statistic (min/max/
    boolean-max monoids, one state row per live user). Delegates to
    the batch :func:`..operators.survival.user_event_spans` collapse
    (the rfm_stream convention); the survival CURVE stays in
    foreachBatch / the batch pass because risk sets are global
    properties of the state, not of the stream."""
    from ..operators.survival import user_event_spans

    return user_event_spans(
        events, user_col, ts_col, event_type_col, event_value
    )


def ab_counts_stream(
    events: DataFrame,
    group_col: str = "variant",
    success_col: str | None = None,
) -> DataFrame:
    """Running per-variant experiment counters over an event stream:
    (variant, n[, conversions]) — sum monoids, one state row per
    variant. Delegates to the batch
    :func:`..operators.experiments.variant_counts` collapse (the
    rfm_stream convention); the z/chi² read-out stays in foreachBatch
    because it is a global function of the counters."""
    from ..operators.experiments import variant_counts

    return variant_counts(events, group_col, success_col)


def paired_flags_stream(
    events: DataFrame,
    boundary_ts: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    event_value: str = "purchase",
) -> DataFrame:
    """Running per-user paired (pre, post) conversion flags around a
    fixed boundary timestamp — the McNemar sufficient statistic (two
    boolean-max monoids, one state row per live user). Delegates to
    the batch :func:`..operators.experiments.paired_conversion_state`
    collapse (the rfm_stream convention); the McNemar cells and chi²
    stay in foreachBatch / the batch pass because they are global
    functions of the state."""
    from ..operators.experiments import paired_conversion_state

    return paired_conversion_state(
        events, boundary_ts, user_col, ts_col, event_type_col, event_value
    )


def drift_stream(
    events: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Running distinct-value block counts over a stream — the
    Wasserstein-1 drift sufficient statistic: per 4-dp-quantized value
    block, the pooled count and the TRUE-group count are two SUM
    monoids, so the running state after any prefix of micro-batches
    equals the batch
    :func:`..operators.stats_tests.drift_value_blocks` collapse over
    the same rows (state is one row per distinct quantized value —
    the same model-sized table wasserstein_1d's max_blocks cap
    guards). Delegates to the batch collapse (the rfm_stream
    convention); the W₁ integral (cumulative CDF windows + the gap
    sum) stays in foreachBatch / the batch pass because it is a
    global ordered function of the blocks, not of the stream."""
    from ..operators.stats_tests import drift_value_blocks

    return drift_value_blocks(events, value_col, group_col)


def conversion_lag_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    from_event: str = "view",
    to_event: str = "purchase",
) -> DataFrame:
    """Running per-user (first_from_ts, first_to_ts) conditional
    minimums over an event stream — the conversion-lag sufficient
    statistic (two MIN monoids, one state row per live user; a late
    earlier view correctly pulls first_from_ts back). Delegates to the
    batch :func:`..operators.events.user_conversion_spans` collapse
    (the rfm_stream convention); the forward-only lag arithmetic and
    the population percentiles stay in foreachBatch / the batch pass
    because they are global functions of the state."""
    from ..operators.events import user_conversion_spans

    return user_conversion_spans(
        events, user_col, ts_col, event_type_col, from_event, to_event
    )


def null_patterns_stream(events: DataFrame, cols) -> DataFrame:
    """Running co-missingness pattern counts over an event stream —
    the per-mask row counts are pure COUNT monoids (≤ 2^k state
    rows). Shares the mask construction with the batch
    :func:`..operators.diagnostics.null_patterns`; the share/top-k
    read-out stays in foreachBatch (global functions of the counts).
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("null_patterns_stream: need at least one column")
    mask = F.concat(
        *[
            F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0"))
            for c in cols
        ]
    )
    return (
        events.select(mask.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def ingest_gaps_stream(
    events: DataFrame,
    ts_col: str = "ts",
    period_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Running observed-bucket counts over an event stream — the
    :func:`..operators.diagnostics.ingest_gaps` sufficient statistic:
    one COUNT monoid per period bucket, so the running state after any
    micro-batch prefix equals the batch
    :func:`..operators.diagnostics.observed_buckets` collapse over the
    same rows (state is one row per observed bucket — bounded by the
    TIME SPAN, the live "is the pipeline still ingesting every hour"
    probe). Delegates to the batch collapse (the rfm_stream
    convention); the span/missing/longest-run read-out stays in
    foreachBatch / the batch pass because runs are global ordered
    functions of the bucket table, not of the stream."""
    from ..operators.diagnostics import observed_buckets

    return observed_buckets(events, ts_col, period_ns)


def vocab_growth_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Running per-token first-occurrence checkpoint bucket over a
    document stream — one of the two Heaps'-law sufficient statistics
    (:func:`..operators.text.heaps_law_fit`): first_bucket is a MIN
    monoid keyed by token, so the running state after any micro-batch
    prefix equals the batch
    :func:`..operators.text.token_first_buckets` collapse over the
    same rows (one state row per distinct token — the live "is the
    corpus still buying new vocabulary" probe a curation pipeline
    watches as shards ingest). Delegates to the batch collapse (the
    rfm_stream convention); pair with :func:`bucket_tokens_stream`
    and run the cumulative spine + log-log OLS in foreachBatch —
    global ordered functions of the state, not of the stream."""
    from ..operators.text import token_first_buckets

    return token_first_buckets(docs, text_col, id_col, n_buckets)


def bucket_tokens_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Running per-checkpoint-bucket token counts over a document
    stream — the companion SUM monoid of :func:`vocab_growth_stream`
    (≤ ``n_buckets`` state rows). Delegates to the batch
    :func:`..operators.text.bucket_token_counts` collapse."""
    from ..operators.text import bucket_token_counts

    return bucket_token_counts(docs, text_col, id_col, n_buckets)
