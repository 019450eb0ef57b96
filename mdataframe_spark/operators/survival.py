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

from ..cache import persist_tracked as _persist_tracked
from .guards import DEFAULT_MAX_STEPS, probe_collapsed


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    max_steps: int | None = DEFAULT_MAX_STEPS,
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
    step table model-sized — RUNTIME-ENFORCED (round-12): a count
    probe on the persisted step table raises
    :class:`~.guards.CollapsedTableTooLarge` past ``max_steps``
    (default 100k) instead of silently folding a corpus-sized step
    table on one window reducer; ``max_steps=None`` disables.
    """
    ev = F.col(event_col).cast("boolean").cast("int")
    td = F.col(duration_col).cast("double")
    # a NaN duration would become a garbage final step (NaN ranks
    # largest) — drop with NULL, the complete-case convention
    base = df.filter(
        td.isNotNull() & ~F.isnan(td) & F.col(event_col).isNotNull()
    )
    # the step table feeds BOTH the scalar total and the cumulative
    # windows: persist it (model-bounded) so the total's aggregation
    # does not re-run the corpus collapse — one scan, not two
    g = _persist_tracked(
        base.groupBy(td.alias("t")).agg(
            F.sum(ev).cast("bigint").alias("__d"),
            F.sum(1 - ev).cast("bigint").alias("__c"),
        )
    )
    probe_collapsed(g, max_steps, "kaplan_meier", "step", "max_steps")
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


def log_rank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    with_p: bool = True,
    max_steps: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Log-rank (Mantel-Cox) test: do the TRUE and FALSE groups of
    ``group_col`` share one survival curve? The inferential companion
    to :func:`kaplan_meier` — at every distinct duration t_j the test
    compares the TRUE group's observed events d1_j against its
    expectation under the null, E1_j = d_j·n1_j/n_j (a hypergeometric
    draw from the pooled risk set), accumulating O1 − E1 and the
    hypergeometric variance V_j = d_j·(n1_j/n_j)·(1 − n1_j/n_j)·
    (n_j − d_j)/(n_j − 1); chi² = (O1 − E1)²/V with 1 dof. Returns ONE
    row: (n1, n2, observed1, expected1, observed2, expected2,
    variance, chi2); chi2 NULL when V degenerates (no events, or one
    group empty). Complete-case on NULL/NaN durations and NULL flags.

    Plan shape: the kaplan_meier discipline twice-collapsed — ONE
    corpus groupBy(duration) with per-group event/censor sums, one
    broadcast total, cumulative windows over the step-bounded table —
    step-boundedness RUNTIME-ENFORCED by the same ``max_steps`` count
    probe as :func:`kaplan_meier` (round-12).
    Determinism: risk sets and event counts are exact integers; the
    per-step E and V terms are single IEEE multiply/divide chains
    rounded to 9 dp and summed as exact decimals (order-independent),
    so both engines derive chi² from identical literals.
    """
    ev = F.col(event_col).cast("boolean").cast("int")
    td = F.col(duration_col).cast("double")
    g = F.col(group_col).cast("boolean")
    base = df.filter(
        td.isNotNull()
        & ~F.isnan(td)
        & F.col(event_col).isNotNull()
        & g.isNotNull()
    ).select(td.alias("t"), ev.alias("__e"), g.alias("__g"))
    # persisted for the same one-scan reason as kaplan_meier's step
    # table: the group totals and the cumulative risk windows both
    # read it
    steps = _persist_tracked(base.groupBy("t").agg(
        F.sum(F.when(F.col("__g"), F.col("__e")).otherwise(0))
        .cast("bigint")
        .alias("__d1"),
        F.sum(F.when(F.col("__g"), 1 - F.col("__e")).otherwise(0))
        .cast("bigint")
        .alias("__c1"),
        F.sum(F.when(~F.col("__g"), F.col("__e")).otherwise(0))
        .cast("bigint")
        .alias("__d2"),
        F.sum(F.when(~F.col("__g"), 1 - F.col("__e")).otherwise(0))
        .cast("bigint")
        .alias("__c2"),
    ))
    probe_collapsed(steps, max_steps, "log_rank_test", "step", "max_steps")
    tot = steps.agg(
        F.sum(F.col("__d1") + F.col("__c1")).alias("__n1"),
        F.sum(F.col("__d2") + F.col("__c2")).alias("__n2"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        steps.crossJoin(F.broadcast(tot))
        .withColumn("__cum1", F.sum(F.col("__d1") + F.col("__c1")).over(w))
        .withColumn("__cum2", F.sum(F.col("__d2") + F.col("__c2")).over(w))
        .withColumn(
            "__r1",
            F.col("__n1") - F.col("__cum1") + F.col("__d1") + F.col("__c1"),
        )
        .withColumn(
            "__r2",
            F.col("__n2") - F.col("__cum2") + F.col("__d2") + F.col("__c2"),
        )
    )
    r1 = F.col("__r1").cast("double")
    nj = (F.col("__r1") + F.col("__r2")).cast("double")
    dj = (F.col("__d1") + F.col("__d2")).cast("double")
    e_term = F.when(nj > 0, dj * r1 / nj).otherwise(F.lit(0.0))
    v_term = F.when(
        (F.col("__r1") + F.col("__r2")) > 1,
        dj
        * (r1 / nj)
        * (1.0 - r1 / nj)
        * (nj - dj)
        / (nj - 1.0),
    ).otherwise(F.lit(0.0))
    dec = "decimal(28,9)"
    acc = cum.agg(
        F.first("__n1").alias("__fn1"),
        F.first("__n2").alias("__fn2"),
        F.sum("__d1").cast("bigint").alias("__o1"),
        F.sum("__d2").cast("bigint").alias("__o2"),
        F.sum(F.round(e_term, 9).cast(dec)).alias("__e1"),
        F.sum(F.round(v_term, 9).cast(dec)).alias("__v"),
    )
    o1 = F.col("__o1").cast("double")
    e1 = F.col("__e1").cast("double")
    vv = F.col("__v").cast("double")
    d_tot = (F.col("__o1") + F.col("__o2")).cast("double")
    out = acc.select(
        F.col("__fn1").cast("bigint").alias("n1"),
        F.col("__fn2").cast("bigint").alias("n2"),
        F.col("__o1").alias("observed1"),
        F.round(e1, 6).alias("expected1"),
        F.col("__o2").alias("observed2"),
        F.round(d_tot - e1, 6).alias("expected2"),
        F.round(vv, 6).alias("variance"),
        F.round(
            F.when(vv > 0, (o1 - e1) * (o1 - e1) / vv), 6
        ).alias("chi2"),
    )
    if with_p:
        from .stats_tests import _chi2_p

        out = out.withColumn(
            "p_value", F.round(_chi2_p(F.col("chi2"), F.lit(1.0)), 6)
        )
    return out


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: float | None = None,
    max_steps: int | None = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Restricted mean survival time: the area under the Kaplan-Meier
    curve up to the horizon ``tau`` — "expected event-free time within
    the first tau units", the clinically/product-standard summary when
    the curve never reaches zero (mean survival is undefined under
    censoring; RMST is always estimable). ``tau=None`` integrates to
    the last observed step. Returns ONE row: (tau, n_steps, n_events,
    rmst).

    Decomposition: the curve is a step function, so the integral is
    the exact sum of rectangle areas S(t_prev)·(min(t_i, τ) −
    min(t_prev, τ)) with S(0⁻) = 1 — plus the tail S(t_last)·(τ −
    t_last) when τ extends past the last step. Survival values are
    :func:`kaplan_meier`'s 6-dp fold outputs; each rectangle rounds to
    9 dp and sums as an exact decimal (order-independent), so any SQL
    engine replays the integral bit-for-bit over the step-bounded
    table.
    """
    km = kaplan_meier(df, duration_col, event_col, max_steps=max_steps)
    wo = Window.orderBy("t")
    stepped = km.select(
        "t",
        "n_events",
        "survival",
        F.lag("t", 1, None).over(wo).alias("__pt"),
        F.lag("survival", 1, 1.0).over(wo).alias("__ps"),
    )
    if tau is None:
        tau_col = stepped.agg(F.max("t").alias("__tau"))
    else:
        spark = df.sparkSession
        tau_col = spark.range(1).select(F.lit(float(tau)).alias("__tau"))
    j = stepped.crossJoin(F.broadcast(tau_col))
    # first step integrates from 0 (durations are non-negative)
    prev_t = F.coalesce(F.col("__pt"), F.lit(0.0))
    gap = F.greatest(
        F.least(F.col("t"), F.col("__tau"))
        - F.least(prev_t, F.col("__tau")),
        F.lit(0.0),
    )
    dec = "decimal(28,9)"
    area = F.round(F.col("__ps") * gap, 9).cast(dec)
    tail = F.round(
        F.col("survival")
        * F.greatest(F.col("__tau") - F.col("t"), F.lit(0.0)),
        9,
    ).cast(dec)
    is_last = F.lead("t", 1).over(wo).isNull()
    acc = j.withColumn(
        "__area",
        area + F.when(is_last, tail).otherwise(F.lit(0).cast(dec)),
    ).agg(
        F.first("__tau").alias("tau"),
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("__area").cast("double").alias("__rmst"),
    )
    return acc.select(
        F.round(F.col("tau"), 6).alias("tau"),
        F.col("n_steps"),
        F.col("n_events"),
        F.round(F.col("__rmst"), 6).alias("rmst"),
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
