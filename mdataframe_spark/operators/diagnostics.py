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


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    k: float = 3.5,
) -> DataFrame:
    """Per-group robust outlier summary via median/MAD — the
    drift-resistant alternative to mean/std z-scoring (a single wild
    batch inflates a std enough to hide itself; the median and MAD
    have a 50% breakdown point). Flags |x − med| > k·1.4826·MAD
    (1.4826 makes MAD a consistent σ estimator under normality;
    k = 3.5 is the conventional Iglewicz-Hoban cut).

    Plan shape: one per-group median aggregation (exact ``percentile``
    — the f13_impute_median precedent, interpolation-matched to
    DuckDB's quantile_cont), broadcast back; one per-group MAD
    aggregation over |x − med|; one counting pass. Output is
    groups-bounded. med/MAD are rounded (6 dp) BEFORE the threshold
    comparison so both engines compare against identical on-grid
    constants. Degenerate groups (MAD = 0: over half the values
    identical) report NULL rate and zero outliers rather than flagging
    everything off-median.
    """
    g = F.col(group_col) if group_col else F.lit("all")
    base = df.filter(F.col(value_col).isNotNull()).select(
        g.alias("grp"), F.col(value_col).cast("double").alias("__v")
    )
    med = base.groupBy("grp").agg(
        F.round(F.expr("percentile(__v, 0.5)"), 6).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    from ..cache import persist_tracked as _persist_tracked

    # dev feeds both the MAD aggregation and the counting pass: pin it
    # (3 narrow columns per row — columnar-cheap) so the scan + median
    # join run once
    dev = _persist_tracked(
        base.join(F.broadcast(med), "grp").withColumn(
            "__ad", F.abs(F.col("__v") - F.col("med"))
        )
    )
    mad = dev.groupBy("grp").agg(
        F.round(F.expr("percentile(__ad, 0.5)"), 6).alias("mad")
    )
    cut = F.lit(float(k)) * 1.4826 * F.col("mad")
    flagged = (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    (F.col("mad") > 0) & (F.col("__ad") > cut), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
    return flagged.select(
        "grp",
        "n",
        "med",
        "mad",
        "n_outliers",
        F.round(
            F.when(F.col("mad") > 0, F.col("n_outliers") / F.col("n")), 6
        ).alias("outlier_rate"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): every row's quasi-identifier
    combination should be shared by at least ``k`` rows; re-identified
    rows are the ones in smaller equivalence classes. The release gate
    a training-data pipeline runs AFTER pii_scrub — redaction removes
    literal identifiers, this measures whether the remaining attribute
    combinations still single people out.

    Plan shape: ONE partial-agged groupBy over the quasi-identifier
    tuple collapses the corpus to the equivalence-class table; the
    summary is a second aggregation over that (classes-bounded) table.
    All outputs are exact integers. Returns ONE row: (k, n_rows,
    n_classes, min_class_size, n_classes_below_k, n_rows_at_risk,
    at_risk_rate).
    """
    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__cs"))
    return g.agg(
        F.lit(int(k)).cast("bigint").alias("k"),
        F.sum("__cs").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__cs").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("__cs") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("__cs") < k, F.col("__cs")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(F.col("__cs") < k, F.col("__cs")).otherwise(0))
            / F.sum("__cs"),
            6,
        ).alias("at_risk_rate"),
    )


def referential_integrity(edges) -> DataFrame:
    """Foreign-key orphan audit over one or more FK edges: for each
    ``(name, child_df, fk_col, parent_df, pk_col)``, count child rows
    whose FK value exists nowhere in the parent's key set — the
    join-loss diagnostic to run BEFORE an inner join silently drops
    rows at scale.

    Plan shape per edge: the parent's distinct key set is BROADCAST
    (dimension tables are broadcastable by definition — if the parent
    is corpus-sized the caller should flip the roles) and probed by a
    single left join + conditional aggregation: n_child, n_null_fk
    (NULL FKs are not orphans under SQL semantics; they are counted
    separately), n_orphans, n_orphan_keys. Output: one row per edge.
    """
    edges = list(edges)
    if not edges:
        raise ValueError(
            "referential_integrity: edges must be non-empty — a caller "
            "filtering a config of FK edges down to present tables "
            "should skip the call, not audit nothing"
        )
    outs = []
    for name, child, fk, parent, pk in edges:
        keys = (
            parent.select(F.col(pk).alias("__fk"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        j = child.select(F.col(fk).alias("__fk")).join(
            F.broadcast(keys), "__fk", "left"
        )
        miss = F.col("__fk").isNotNull() & F.col("__hit").isNull()
        outs.append(
            j.agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_null_fk"),
                F.sum(F.when(miss, 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
                F.count_distinct(F.when(miss, F.col("__fk")))
                .cast("bigint")
                .alias("n_orphan_keys"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def candidate_keys(df: DataFrame, candidates) -> DataFrame:
    """Uniqueness audit over candidate key combinations: for each
    column list, (candidate, n_rows, n_distinct, n_duplicate_rows,
    is_unique) — the schema-discovery primitive behind 'can this
    column set serve as a join/merge key?'.

    Plan shape: ONE aggregation pass computes count(*) plus one
    count_distinct(struct(cols)) per candidate (Catalyst expands
    multiple distinct aggregates in a single Expand stage — k
    candidates never re-scan the input k times); the per-candidate
    report rows are a constant-width unpivot of the 1-row result.
    NULL components make a tuple distinct-able (struct equality is
    null-safe), matching the SQL (a, b) tuple semantics.
    """
    candidates = [list(c) for c in candidates]
    if not candidates:
        raise ValueError("candidate_keys: empty candidate list")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for idx, cols in enumerate(candidates):
        aggs.append(
            F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(
                f"__d{idx}"
            )
        )
    one = df.agg(*aggs)
    parts = []
    for idx, cols in enumerate(candidates):
        parts.append(
            one.select(
                F.lit("+".join(cols)).alias("candidate"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__d{idx}").cast("bigint").alias("n_distinct"),
                (F.col("__n") - F.col(f"__d{idx}"))
                .cast("bigint")
                .alias("n_duplicate_rows"),
                (F.col("__n") == F.col(f"__d{idx}")).alias("is_unique"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def benford_expected() -> list[str]:
    """Benford first-digit probabilities log10(1 + 1/d), d = 1..9, as
    12-dp decimal strings. ONE implementation shared by the Spark plan
    and the SQL-oracle builder (the ewma_weights convention) — both
    engines embed the same literals, so no log10() ulp divergence."""
    import math

    return [f"{math.log10(1.0 + 1.0 / d):.12f}" for d in range(1, 10)]


def benford_digit_counts(df: DataFrame, col: str) -> DataFrame:
    """The Benford sufficient statistic: (digit, n_observed) counts of
    the first decimal digit of round(x·100) — a SUM monoid with at
    most 9 state rows, so a streaming aggregation's running counts
    after any prefix of micro-batches equal this batch collapse
    (streaming/segments.py benford_stream delegates here). Rows with
    x·100 < 1 are excluded (no Benford digit). The digit is extracted
    arithmetically from the BIGINT's string form — never from double
    formatting, which differs between engines."""
    v = F.round(F.col(col).cast("double") * 100, 0).cast("bigint")
    return (
        df.select(v.alias("__v"))
        .filter(F.col("__v") >= 1)
        .select(
            F.substring(F.col("__v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_observed"))
    )


def benford_test(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-data / unit-mixing screen for financial
    and measurement columns. Returns 9 rows (digit, n_observed,
    p_expected, n_expected, chi2_term) with chi2_term =
    (O − E)² / E; Σ chi2_term vs χ²(8) is the test statistic (the
    caller's threshold — this reports the spectrum, the
    data-quality-gate convention of dq_expectations).

    Determinism: the first digit is extracted ARITHMETICALLY from
    round(x·100) as a BIGINT string prefix (never from double
    formatting, which differs between engines); expected probabilities
    are shared 12-dp literals from :func:`benford_expected`; E rounds
    to 6 dp before the χ² term so both engines divide identical
    numbers. Rows with x·100 < 1 (zero/negative/sub-cent) are
    excluded — they have no Benford digit.

    Plan shape: ONE partial-agged groupBy(digit) collapses the corpus;
    the 9-row spine join and χ² arithmetic run on the digit table.
    """
    digits = benford_digit_counts(df, col)
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d, p) for d, p in zip(range(1, 10), benford_expected())],
        "digit INT, p_str STRING",
    ).select("digit", F.col("p_str").cast("double").alias("p_expected"))
    tot = digits.agg(F.sum("n_observed").alias("__n"))
    joined = (
        spine.join(F.broadcast(digits), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_observed", F.lit(0)).cast("bigint").alias(
                "n_observed"
            ),
            "p_expected",
            F.round(F.col("__n") * F.col("p_expected"), 6).alias(
                "n_expected"
            ),
        )
    )
    diff = F.col("n_observed") - F.col("n_expected")
    return joined.select(
        "digit",
        "n_observed",
        "p_expected",
        "n_expected",
        F.round(diff * diff / F.col("n_expected"), 6).alias("chi2_term"),
    ).orderBy("digit")


def l_diversity(
    df: DataFrame,
    quasi_cols,
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the companion gate
    to :func:`k_anonymity`: a k-anonymous equivalence class is still
    re-identifying if every member shares the same SENSITIVE value.
    Reports each quasi-identifier class with its size and the number
    of distinct sensitive values, flagging classes below ``l``.
    Returns (quasi..., n_rows, n_sensitive, meets_l) ordered by the
    quasi columns.

    Plan shape: ONE partial-agged groupBy over (quasi, sensitive)
    collapses the corpus; class sizes and distinct-sensitive counts
    are a second aggregation of that (class × value)-bounded table —
    count_distinct never sees raw rows. NULL sensitive values count as
    a distinct value (they are an observable bucket to an attacker),
    keyed as (is_null, value) so no real value can collide with them.
    """
    quasi_cols = (
        [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    )
    # (is_null, value) pair key, NOT a sentinel string: a real value
    # equal to the sentinel would collapse into the NULL bucket and
    # undercount n_sensitive
    pair = df.groupBy(
        *quasi_cols,
        F.col(sensitive_col).isNull().alias("__sv_null"),
        F.col(sensitive_col).cast("string").alias("__sv"),
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        pair.groupBy(*quasi_cols)
        .agg(
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
        )
        .withColumn("meets_l", F.col("n_sensitive") >= int(l))
        .orderBy(*quasi_cols)
    )


def completeness_profile(
    df: DataFrame,
    cols,
    with_distinct: bool = True,
) -> DataFrame:
    """One-pass per-column completeness profile: for each requested
    column, (column, n_rows, n_null, null_rate, n_distinct) — the
    first thing a pipeline asks about an unfamiliar table, computed in
    ONE aggregation over ONE scan (the Expand-stage multi-distinct,
    the candidate_keys pattern: k columns never re-scan the input).
    n_distinct counts DISTINCT NON-NULL values (SQL count-distinct
    semantics); the unpivot to one row per column is a constant-size
    union over the 1-row aggregate. Ordered by column name.

    ``with_distinct=False`` drops the n_distinct column and its
    Expand stage, leaving only count/sum aggregates — a pure SUM
    monoid over the scan. That arm exists for the streaming twin
    (streaming/segments.py completeness_stream): Structured Streaming
    rejects exact distinct aggregation (unbounded per-value state),
    and the sketch alternative (approx_count_distinct) would break
    the twin-equality contract, so the streamed profile is honestly
    the monoid subset of this one.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn{i}")
        )
        if with_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd{i}"))
    one = df.agg(*aggs)
    # stack unpivot (the expectations pattern), NOT a union of k
    # projections: a union re-computes the aggregate subtree per
    # branch — k scans of the corpus for a k-column profile
    # (plan-asserted in tests). "column_name", not "column": the bare
    # word is reserved in the SQL oracles' dialect.
    if with_distinct:
        stack_fields = ", ".join(
            f"'{c}', __nn{i}, __nd{i}" for i, c in enumerate(cols)
        )
        stack_as = "(column_name, n_null, n_distinct)"
    else:
        stack_fields = ", ".join(f"'{c}', __nn{i}" for i, c in enumerate(cols))
        stack_as = "(column_name, n_null)"
    stacked = one.select(
        F.col("__n"),
        F.expr(f"stack({len(cols)}, {stack_fields}) as {stack_as}"),
    )
    out_cols = [
        F.col("column_name"),
        F.col("__n").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.round(F.col("n_null") / F.col("__n"), 6).alias("null_rate"),
    ]
    if with_distinct:
        out_cols.append(F.col("n_distinct").cast("bigint").alias("n_distinct"))
    return stacked.select(*out_cols).orderBy("column_name")


def gini_index(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative value column —
    the concentration audit that complements key-skew and the
    completeness profile: how unequally are tokens/chars/spend
    distributed across documents/users within each group? 0 = perfect
    equality, →1 = one row holds everything. Returns (group, n,
    total, gini) ordered by group; gini NULL when the group has n < 2
    or a zero total (concentration undefined).

    Decomposition (the mannwhitney doubled-rank convention applied to
    the rank-weighted identity G = 2·Σᵢ rᵢvᵢ / (N·S) − (N+1)/N):
    ONE partial-agged groupBy(group, value) collapses the corpus to
    distinct-value blocks; a per-group cumulative window over the
    block table yields midrank sums, and the doubled rank-weighted
    total 2·Σ rᵢvᵢ = Σ_v v·t·(2·cum − t + 1) accumulates as EXACT
    decimal (values rounded to 4 dp once, the rfm_state convention)
    — ties get their midrank automatically, so the result is
    order-independent and replays bit-for-bit in SQL. Everything
    after the first pass is bounded by distinct values per group;
    quantize continuous values upstream if that table must stay
    model-sized (the documented spearman/auc knob).

    Negative values are REJECTED rows (filtered with the NULLs and
    NaN — NaN passes a >= 0 comparison under Spark's NaN-is-largest
    ordering and would silently quantize to garbage): Lorenz-based
    concentration is undefined below zero — a signed column wants a
    different audit, not a silently wrong Gini. Magnitude bound: the
    4-dp scaled integers live in int64, so values must stay below
    ~9.2·10¹⁴ — rescale a larger-unit column (raw nanoseconds,
    cumulative bytes) upstream; past the bound Spark's non-ANSI cast
    would clamp while the SQL oracle errors.
    """
    g = F.col(group_col) if group_col else F.lit("all")
    # values quantize to 4 dp ONCE, then live as SCALED INTEGERS
    # (v·10⁴ as bigint — the mannwhitney integer-accumulation form):
    # decimal×decimal products would hit Spark's precision-loss
    # reduction, while integer products in decimal(38,0) are exact in
    # both engines, and the 10⁴ scale cancels inside the Gini ratio
    vd = F.col(value_col).cast("double")
    vs = F.round(vd * 10000).cast("bigint")
    keep = vd.isNotNull() & ~F.isnan(vd) & (vd >= 0)
    if group_col:
        keep = keep & F.col(group_col).isNotNull()
    base = df.filter(keep).select(g.alias("__g"), vs.alias("__v"))
    blocks = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).alias("__t")
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blocks = blocks.withColumn("__cum", F.sum("__t").over(w))
    dec = "decimal(38,0)"
    acc = blocks.groupBy("__g").agg(
        F.sum("__t").alias("__n"),
        F.sum(F.col("__v").cast(dec) * F.col("__t")).alias("__s"),
        F.sum(
            F.col("__v").cast(dec)
            * F.col("__t")
            * (2 * F.col("__cum") - F.col("__t") + 1)
        ).alias("__rv2"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    gini = F.when(
        (F.col("__n") >= 2) & (s > 0),
        F.col("__rv2").cast("double") / (n * s) - (n + 1) / n,
    )
    return acc.select(
        F.col("__g").alias("group"),
        F.col("__n").cast("bigint").alias("n"),
        F.round(s / 10000.0, 4).alias("total"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("group")


def null_patterns(
    df: DataFrame,
    cols: list,
    top_k: int = 20,
) -> DataFrame:
    """Co-missingness audit: which columns go missing TOGETHER? The
    completeness profile says HOW MUCH each column is null; the
    pattern table says the STRUCTURE — '011' concentrated in one
    pattern means the two columns fail as a unit (one upstream
    extractor), scattered singletons mean independent noise. Returns
    the top-``top_k`` per-row null masks (one char per column, '1' =
    NULL, column order as given): (pattern, n_rows, n_missing_cols,
    share), ordered by n_rows desc then pattern asc.

    ONE scan, one pattern-bounded groupBy (≤ 2^k distinct masks, in
    practice a handful), one broadcast total; the top-k is a
    distributed TakeOrderedAndProject, never a global sort.
    """
    if not cols:
        raise ValueError("null_patterns: need at least one column")
    mask = F.concat(
        *[
            F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0"))
            for c in cols
        ]
    )
    pats = df.select(mask.alias("pattern")).groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = pats.agg(F.sum("n_rows").alias("__n"))
    miss = sum(
        (F.substring(F.col("pattern"), i + 1, 1) == "1").cast("int")
        for i in range(len(cols))
    )
    return (
        pats.crossJoin(F.broadcast(tot))
        .select(
            "pattern",
            "n_rows",
            miss.cast("bigint").alias("n_missing_cols"),
            F.round(
                F.col("n_rows").cast("double") / F.col("__n"), 6
            ).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("pattern").asc())
        .limit(int(top_k))
    )


def format_patterns(
    df: DataFrame,
    col: str,
    top_k: int = 20,
    max_chars: int = 16,
) -> DataFrame:
    """Character-class format profile of a string column — the
    profiler's "what SHAPES live in this field": every value maps to
    its class mask (digits→9, uppercase→A, lowercase→a, other chars
    kept verbatim), truncated to ``max_chars``, and the top-k masks by
    count come back with shares. One glance separates "AA-9999" from
    free text and catches the 0.1% of phone numbers with letters.
    Returns (pattern, n_rows, share) — top-k by count, ties broken by
    pattern (deterministic), NULLs profiled as the literal mask
    '<null>'. Ordered by n_rows desc, pattern.

    Plan shape: ONE translate+substring projection (pure codegen, both
    engines share translate/substr semantics — no regex, so the DuckDB
    oracle replays it exactly) + ONE groupBy(mask) partial-agged
    collapse; the top-k is a TakeOrdered over the mask-bounded table.
    """
    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lower = upper.lower()
    digits = "0123456789"
    mask = F.when(F.col(col).isNull(), F.lit("<null>")).otherwise(
        F.substring(
            F.translate(
                F.col(col).cast("string"),
                digits + upper + lower,
                "9" * 10 + "A" * 26 + "a" * 26,
            ),
            1,
            max_chars,
        )
    )
    counts = df.select(mask.alias("pattern")).groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    glob = counts.agg(F.sum("n_rows").alias("__n"))
    return (
        counts.crossJoin(F.broadcast(glob))
        .select(
            "pattern",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("__n"), 6
            ).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), "pattern")
        .limit(top_k)
    )


def observed_buckets(
    df: DataFrame,
    ts_col: str = "ts",
    period_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """The :func:`ingest_gaps` sufficient statistic: per observed
    period bucket, the row count — one COUNT monoid keyed by bucket,
    which is what makes
    :func:`~..streaming.segments.ingest_gaps_stream` a legal streaming
    twin (running state after any micro-batch prefix equals this batch
    collapse over the same rows; state is one row per observed bucket,
    bounded by the TIME SPAN). Returns (bucket, n); NULL timestamps
    drop. ONE partial-agged groupBy — the only corpus-scale structure
    in :func:`ingest_gaps`, which consumes this collapse."""
    from .events import _bucket, _ns

    d = _ns(df.filter(F.col(ts_col).isNotNull()), ts_col)
    return d.groupBy(_bucket(ts_col, period_ns).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def ingest_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    period_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Temporal completeness of an event stream: over the observed
    [first, last] bucket span (hours by default), how many period
    buckets are MISSING entirely — the ingestion-outage detector
    (a pipeline that silently dropped Tuesday shows up here, not in
    row counts). Returns ONE row: (first_bucket, last_bucket,
    n_expected, n_observed, n_missing, coverage, max_gap_run) with
    max_gap_run the longest consecutive missing stretch in buckets;
    on an empty stream n_observed is 0 and every other field NULL
    (a count over zero buckets is a well-defined 0, not unknown).

    Plan shape: ONE partial-agged groupBy(bucket) collapses the corpus
    to the observed-bucket table (:func:`observed_buckets` — shared
    with the streaming twin); the span, the missing count and the
    longest run all derive from that table — the spine is NEVER
    materialized (n_expected = last − first + 1 and runs come from a
    lag over the observed buckets), so a year-long outage costs
    nothing. The single unpartitioned lag window runs over distinct
    buckets — bounded by the TIME SPAN, not the corpus (the
    bucket_series justification).
    """
    obs = observed_buckets(df, ts_col, period_ns).select(
        F.col("bucket").alias("__b")
    )
    w = Window.orderBy("__b")
    runs = obs.withColumn("__prev", F.lag("__b").over(w)).agg(
        F.min("__b").alias("first_bucket"),
        F.max("__b").alias("last_bucket"),
        F.count(F.lit(1)).alias("n_observed"),
        F.max(
            F.when(
                F.col("__prev").isNotNull(),
                F.col("__b") - F.col("__prev") - 1,
            )
        ).alias("__maxrun"),
    )
    expected = F.col("last_bucket") - F.col("first_bucket") + 1
    return runs.select(
        F.col("first_bucket").cast("bigint").alias("first_bucket"),
        F.col("last_bucket").cast("bigint").alias("last_bucket"),
        expected.cast("bigint").alias("n_expected"),
        F.col("n_observed").cast("bigint").alias("n_observed"),
        (expected - F.col("n_observed")).cast("bigint").alias("n_missing"),
        F.round(
            F.when(expected > 0, F.col("n_observed") / expected.cast("double")),
            6,
        ).alias("coverage"),
        F.when(
            F.col("n_observed") > 0, F.coalesce(F.col("__maxrun"), F.lit(0))
        )
        .cast("bigint")
        .alias("max_gap_run"),
    )
