"""Kaplan-Meier survival estimation over right-censored durations —
the time-to-event face of product analytics (time-to-conversion,
time-to-churn, time-to-first-failure) that sits next to funnels and
cohort retention (SURVEY §2 extension scope, same status as
operators/events.py; the reference has no survival surface).

Scale shape: the corpus collapses in ONE partial-agged
groupBy(duration) — everything downstream (risk sets, step factors,
the survival fold) runs on the distinct-duration step table, which is
model-bounded when durations are quantized (hours/days — the
spearman/auc quantize knob; a raw-nanosecond duration column would
make the step table corpus-sized, so quantize upstream).

Determinism contract: the step factors 1 − d_i/n_i are IEEE double
divisions rounded to 9 dp, and the survival curve is their ORDERED
LEFT FOLD (Spark: `aggregate` over an ordered window collect_list;
DuckDB: `list_reduce` over an ordered window list). IEEE multiplies
are correctly rounded and both engines fold the identical factor
sequence in the identical order, so the products match bit-for-bit —
no exp/Σlog detour (libm log is not cross-engine exact), no driver
round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit estimator: one row per distinct
    duration with (t, n_at_risk, n_events, n_censored, survival),
    survival = Π_{t_i ≤ t} (1 − d_i/n_i) over the ordered steps,
    where n_i is the risk set entering step i (subjects with duration
    ≥ t_i) and d_i the events AT t_i. ``event_col`` is truthy for an
    observed event, falsy for right-censoring; censored subjects
    leave the risk set after their step without stepping the curve
    (their step's factor is 1 when d = 0). Rows with NULL duration or
    flag are dropped (complete-case). Ordered by t.

    Plan shape: ONE corpus groupBy(duration) → (d, c) per step; one
    scalar total (broadcast); one cumulative window + the fold over
    the step-bounded table. Quantize durations upstream to keep the
    step table model-sized.
    """
    ev = F.col(event_col).cast("boolean").cast("int")
    td = F.col(duration_col).cast("double")
    # a NaN duration would become a garbage final step (NaN ranks
    # largest) — drop with NULL, the complete-case convention
    base = df.filter(
        td.isNotNull() & ~F.isnan(td) & F.col(event_col).isNotNull()
    )
    g = base.groupBy(td.alias("t")).agg(
        F.sum(ev).cast("bigint").alias("__d"),
        F.sum(1 - ev).cast("bigint").alias("__c"),
    )
    tot = g.agg(F.sum(F.col("__d") + F.col("__c")).alias("__n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("__cdc", F.sum(F.col("__d") + F.col("__c")).over(w))
        .withColumn(
            "__risk",
            F.col("__n") - F.col("__cdc") + F.col("__d") + F.col("__c"),
        )
        .withColumn(
            "__f",
            F.round(
                F.lit(1.0)
                - F.col("__d").cast("double") / F.col("__risk"),
                9,
            ),
        )
    )
    surv = F.aggregate(
        F.collect_list("__f").over(w),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return (
        cum.withColumn("__s", surv)
        .select(
            "t",
            F.col("__risk").cast("bigint").alias("n_at_risk"),
            F.col("__d").alias("n_events"),
            F.col("__c").alias("n_censored"),
            F.round(F.col("__s"), 6).alias("survival"),
        )
        .orderBy("t")
    )


def user_event_spans(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    event_value: str = "purchase",
) -> DataFrame:
    """The per-subject sufficient statistic feeding Kaplan-Meier on an
    event log: (user, first_ts, last_ts, converted) — min, max and a
    boolean max, three associative/commutative monoids in ONE
    partial-agged groupBy, so a streaming aggregation's running state
    after any prefix of micro-batches equals this batch collapse
    (streaming/segments.py user_spans_stream delegates here — the
    rfm_state convention). Duration/censoring derive from the state:
    duration = last_ts − first_ts, event = converted, censored
    otherwise. The KM curve itself is deliberately not streamed —
    risk sets and the survival fold are global properties of the
    state (the rfm quintile-scoring argument); fold the state in
    foreachBatch or the batch reporting pass.
    """
    return df.groupBy(F.col(user_col)).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.max(
            (F.col(event_type_col) == event_value).cast("int")
        ).alias("converted"),
    )
