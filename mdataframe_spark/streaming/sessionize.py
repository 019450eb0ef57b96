"""Custom stateful streaming operator: user sessionization.

The north-star extension list calls for custom stateful operators via
``applyInPandasWithState`` (SURVEY.md §2.10 is empty in the reference —
it is strictly batch). This implements the canonical one: group events
by user, close a session after ``gap`` seconds of inactivity, emit
(user_id, session_start, session_end, n_events, sum_value) per closed
session. Works on a streaming input with event-time timeouts; the same
session assignment is expressible in batch with a lag/cumsum window —
``sessionize_batch`` — which is how the semantics are cross-checked in
tests (and how a backfill would run).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "start timestamp, end timestamp, n bigint, total double"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with state + event-time timeout.

    State per user = the open session; events extend it while within
    ``gap_seconds`` of its end, otherwise the session is emitted and a
    new one opens. The event-time timeout flushes sessions whose gap
    elapsed past the watermark — bounded state by construction.
    """
    gap = gap_seconds

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user, "session_start": start, "session_end": end,
                  "n_events": n, "sum_value": total}]
            )
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        closed = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None
            n, total = 0, 0.0
        for ts, val in zip(rows[ts_col], rows[value_col]):
            if start is None:
                start, end, n, total = ts, ts, 1, float(val)
            elif (ts - end).total_seconds() <= gap:
                end = ts
                n += 1
                total += float(val)
            else:
                closed.append((start, end, n, total))
                start, end, n, total = ts, ts, 1, float(val)
        state.update((start, end, n, total))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap * 1000)
        if closed:
            yield pd.DataFrame(
                [
                    {"user_id": user, "session_start": s, "session_end": e,
                     "n_events": c, "sum_value": t}
                    for (s, e, c, t) in closed
                ]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch-equivalent sessionization: session boundaries via lag +
    running sum of boundary flags — pure window expressions, the
    backfill/verification path for the stateful operator."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    boundary = (
        F.when(
            F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
            > gap_seconds,
            1,
        )
        .otherwise(0)
    )
    with_session = events.withColumn(
        "__session", F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_session.groupBy(user_col, "__session")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("__session")
    )
