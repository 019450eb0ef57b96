"""Data-ops diagnostics: the profiling queries an engineer runs BEFORE
picking a partitioning/join strategy at scale.

Skewed keys are the dominant failure mode of 100 TB joins and
aggregations (one hot key serializes a whole stage); key_skew_profile
is the measurement that decides between a plain shuffle join, a
broadcast, and salting (operators/joins.py salted_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` heaviest keys with their corpus share, cumulative
    share, and skew factor (count / mean-count-per-key — 1.0 means
    perfectly uniform; a salting candidate shows double digits).

    Plan shape: ONE partial-agged groupBy collapses the corpus to the
    key-count table; the global totals are a single two-scalar
    aggregate (the permitted scalar probe); the top-N selection
    compiles to TakeOrderedAndProject (no global sort materializes);
    the cumulative-share window runs over the returned N rows only.
    All shares derive from integer counts, so both engines round the
    same exact ratios.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total, n_keys = counts.agg(F.sum("cnt"), F.count(F.lit(1))).first()
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return top.select(
        "key",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("key").asc()))
        .alias("rank"),
        F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share"),
        F.round(F.sum("cnt").over(w) / F.lit(float(total)), 6).alias(
            "cum_share"
        ),
        F.round(
            F.col("cnt") * F.lit(float(n_keys)) / F.lit(float(total)), 6
        ).alias("skew_vs_mean"),
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equal-width histogram of a numeric column — the distribution
    profile behind data cards and drift dashboards. Returns one row
    per non-empty bin: (bin, bin_lo, bin_hi, n).

    Plan shape: an optional two-scalar min/max probe, then ONE
    partial-agged groupBy on the bin index — output bounded by
    ``n_bins``. The max value clamps into the last bin (least), and
    bin bounds derive from the same (lo, width) literals both engines
    compute, rounded at 6 dp for the output.
    """
    x = F.col(col).cast("double")
    if lo is None or hi is None:
        mn, mx = df.agg(F.min(x), F.max(x)).first()
        lo = float(mn if lo is None else lo)
        hi = float(mx if hi is None else hi)
    if not hi > lo:
        raise ValueError(f"histogram: need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    b = F.least(F.floor((x - lo) / width), F.lit(n_bins - 1)).cast("int")
    return (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6).alias(
                "bin_hi"
            ),
            "n",
        )
    )


def expectations(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """Declarative data-quality assertion battery (the
    expectations/great-expectations pattern as ONE distributed pass):
    each rule is a boolean Column; the report is one row per rule with
    pass/fail counts and the pass rate.

    Plan shape: a SINGLE aggregation evaluates every rule map-side —
    the corpus is scanned once no matter how many rules run (K
    separate filter-counts would scan it K times). A NULL rule result
    counts as FAILED (three-valued logic must not silently pass rows).
    Output is K rows via an unpivot of the one-row aggregate.
    """
    if not rules:
        raise ValueError("expectations: need at least one rule")
    names = list(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(
                F.when(F.coalesce(rules[r], F.lit(False)), 1).otherwise(0)
            ).alias(f"__p{i}")
            for i, r in enumerate(names)
        ],
    )
    stacked = agg.select(
        F.col("__n"),
        F.expr(
            "stack({}, {}) as (rule, passed)".format(
                len(names),
                ", ".join(f"'{r}', __p{i}" for i, r in enumerate(names)),
            )
        ),
    )
    return stacked.select(
        "rule",
        F.col("__n").alias("n"),
        F.col("passed").cast("bigint").alias("passed"),
        (F.col("__n") - F.col("passed")).cast("bigint").alias("failed"),
        F.round(F.col("passed") / F.col("__n"), 6).alias("pass_rate"),
    )
