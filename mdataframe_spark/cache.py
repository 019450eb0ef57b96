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


class _CheckpointHandle:
    """Release shim for a localCheckpoint'ed DataFrame: checkpoint
    blocks have no public unpersist, so we reach the LogicalRDD leaf's
    RDD through the analyzed plan. Unlike a cache unpersist this is a
    HARD release — the frame is unreadable afterwards — so handles are
    only released once a successor frame is materialized (loop rounds)
    or the query's consuming action is done (release_caches runs at
    the START of the next query)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self):
        self._df._jdf.queryExecution().analyzed().rdd().unpersist(False)


def local_checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint registered for release_caches().

    For iterative pipelines (connected components): persist alone does
    NOT bound a loop's cost — the logical plan still grows by the full
    lineage every round (a self-join squares the subtree), and Catalyst
    analysis on a 4^rounds tree dominates wall-clock long before data
    size matters (measured: a 20-vertex path cost 330 s, all of it
    plan analysis). localCheckpoint truncates the plan to a LogicalRDD
    leaf over materialized blocks — constant-size plans per round.

    Cluster note: local checkpoint blocks are not replicated, so an
    executor loss fails the job (Spark then recomputes from the source
    on retry). For a 1000-executor deployment with churn, a reliable
    `df.checkpoint()` against a checkpoint dir trades latency for
    fault-tolerance; the loops using this helper are O(log diameter)
    rounds, so a retry-from-scratch is an acceptable cost at the rate
    executors actually fail.
    """
    ck = df.localCheckpoint(eager=True)
    handle = _CheckpointHandle(ck)
    ck._mds_release_handle = handle
    _PERSISTED.append(handle)
    return ck


def release_tracked(df: DataFrame) -> None:
    """Unpersist one tracked frame early and drop it from the registry.

    For loop-carried frames (connected components' per-round labels):
    the round's successor is materialized, the predecessor is dead —
    holding it until release_caches() pins O(rounds) corpus-scale
    frames at exactly the moment the loop needs memory. Works for both
    persist_tracked and local_checkpoint_tracked frames.

    (Identity-based removal: list.remove would call DataFrame.__eq__,
    which builds a Column, not a bool.)
    """
    target = getattr(df, "_mds_release_handle", df)
    try:
        target.unpersist()
    except Exception:
        pass
    for i, entry in enumerate(_PERSISTED):
        if entry is target:
            del _PERSISTED[i]
            break


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
