"""Streaming CDC materialization — the streaming twin of
operators/scd.cdc_apply (SURVEY §2.10 extension; the reference is
strictly batch).

Why this shape survives unbounded change logs: ``cdc_apply`` collapses
the log with ONE groupBy(key) taking the lexicographic max of
struct(seq…, op, payload…). ``max`` is associative and commutative, so
the streaming aggregation's running per-key state after any prefix of
micro-batches equals the batch collapse over the same rows — the
Count-Min twin's argument (streaming/sketches.py), applied to a
max-monoid instead of a sum-monoid (equality- and
checkpoint-continuation-tested in tests/test_streaming.py).

State is one struct per LIVE KEY — the cardinality of the dimension
being materialized, exactly what any MERGE target table holds; it does
not grow with change-log length, and no watermark is needed because
late changes are not dropped but simply lose (or win) the per-key max
on their sequence position.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.scd import cdc_apply


def cdc_stream(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Running last-writer-wins table state over a change-log stream.

    Use ``outputMode("complete")`` (the state is the whole materialized
    dimension) or fold the update stream into a store with
    ``foreachBatch``. DELEGATES to the batch collapse — groupBy +
    max(struct) + the tombstone filter are all streaming-safe, and one
    implementation is what guarantees the streamed and batch states can
    never diverge.
    """
    return cdc_apply(
        changes,
        key_cols,
        seq_cols,
        op_col=op_col,
        delete_op=delete_op,
    )
