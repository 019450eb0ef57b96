"""Central registry of persisted intermediates.

Several pipelines persist a mid-plan DataFrame that both a global
aggregation and a later per-row pass read (dedup's banded signatures,
the differential pipelines' APL curve tables, NOISeq's noise cloud).
The persist cannot be dropped inside the builder — the returned frame
is lazy and still reads it at the caller's action — so builders
register here and callers (bench, the driver-query wrapper, user
pipelines between stages) call :func:`release_caches` after the
consuming action.

Releasing is strictly an optimization knob: an unpersisted intermediate
is recomputed deterministically, never wrong. What release buys is
executor memory — on a long session the accumulated pinned blocks
otherwise crowd the unified-memory region and slow every later shuffle
(observed: a 3-5s query degrading to ~19s under inherited cache
pressure).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_PERSISTED: list = []


def persist_tracked(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it for a later :func:`release_caches`."""
    p = df.persist(storage_level) if storage_level is not None else df.persist()
    _PERSISTED.append(p)
    return p


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_PERSISTED)
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return n


@contextmanager
def scoped_caches():
    """Release exactly the intermediates persisted inside the block.

    For long-running callers that invoke persist-registering builders
    repeatedly (a Structured Streaming ``foreachBatch`` callback, a
    driver-side loop over shards): the global :func:`release_caches`
    never fires for them, so without a scope each invocation leaks its
    pinned blocks. Entries registered BEFORE the block (a shared
    corpus-side store, a loop-carried frame) are left untouched.

    The consuming action must happen inside the block — after exit the
    scoped frames are unpersisted (recomputed if read again: correct,
    just slower).
    """
    mark = len(_PERSISTED)
    try:
        yield
    finally:
        while len(_PERSISTED) > mark:
            try:
                _PERSISTED.pop().unpersist()
            except Exception:
                pass
