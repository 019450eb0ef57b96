"""Ingestion-time dedup gating for document streams.

The batch dedup family (operators/dedup.py) asks "which docs in this
CORPUS are duplicates"; an ingestion pipeline asks the incremental
question — "which parts of these NEW docs already exist" — against
stores built once from the corpus (k-gram index, LSH band table). The
per-micro-batch computations (within-batch duplicate detection, island
merges) need a bounded frame, so the probes run under ``foreachBatch``:
each micro-batch is a complete bounded DataFrame, the stored index
side is a static (ideally bucketed) table, and results stream to the
caller's sink. This is the standard Structured Streaming shape for
batch-algorithm reuse — no state store, exactly the batch semantics
per batch.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame


def stream_duplicate_span_probe(
    doc_stream: DataFrame,
    corpus_index: DataFrame,
    sink: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    k: int = 8,
    checkpoint_dir: Optional[str] = None,
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Probe a stream of NEW documents for duplicated substrings against
    a stored corpus k-gram index (operators/dedup.kgram_index).

    Every micro-batch runs :func:`duplicate_spans_against` — per batch
    the result is EXACTLY the batch operator's (corpus hits + within-
    micro-batch repeats; cross-micro-batch repeats are caught once the
    clean batches' own index increments are appended to the store, the
    same contract as the incremental LSH probe). ``sink(spans_df,
    batch_id)`` receives each batch's span frame and must CONSUME it
    before returning (write/collect/count): the batch's pinned
    intermediates are released when the callback exits, so a frame
    stashed for later is recomputed from the (gone) micro-batch input.
    Returns the started streaming query (caller awaits termination).

    Trigger: the default ``available_now=True`` drains what exists and
    terminates — the bounded test/backfill shape. A LIVE ingestion
    gate must pass ``available_now=False`` (continuous micro-batches;
    optionally ``processing_time='30 seconds'`` to pace them) or the
    query stops after the startup backlog and later documents are
    never probed.
    """
    from ..cache import scoped_caches
    from ..operators.dedup import duplicate_spans_against

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # duplicate_spans_against pins the batch's k-gram frame; on a
        # LIVE stream (available_now=False) no caller-side
        # release_caches() ever fires, so without this scope every
        # micro-batch leaks its pinned blocks until executors degrade.
        # sink() must fully consume spans inside the scope.
        with scoped_caches():
            spans = duplicate_spans_against(
                batch_df, corpus_index, id_col, text_col, min_tokens, k
            )
            sink(spans, batch_id)

    w = doc_stream.writeStream.foreachBatch(_process)
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()
