"""Native normalization stack: log2-CPM, row z-score, TMM.

The reference computes all of these inside an embedded R interpreter
(edgeR via rpy2 — reference: transformations.py:63-152; the whole count
matrix is serialized across the Python→R bridge, single-threaded). Here
the same published algorithms (TMM: Robinson & Oshlack, Genome Biology
2010; edgeR's calcNormFactors/cpm as documented in its user guide) are
implemented as Spark DataFrame computations:

- per-sample scalars (library sizes, 75th percentiles, TMM factors) are
  computed distributed and collected to the driver — bounded: one scalar
  per sample, never per row;
- the per-row transform (log-CPM, batch correction) is pure column
  arithmetic — whole-stage-codegen'd, no UDF, no shuffle;
- the TMM trimmed mean runs on the long layout with windows partitioned
  by sample — each sample's gene vector sorts in parallel, which is the
  scale-out answer to the reference's in-memory matrix.

Numeric parity with the reference's R-derived goldens
(tests/test_transformations.py:74-105 in the reference) is asserted at
decimal=5 in tests/test_norm_golden.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..transformer import Transformer

ROW_ID = "__row_id"


# ---------------------------------------------------------------------------
# row z-score (reference ZScaler, mdataframe.py:146-157)
# ---------------------------------------------------------------------------
def zscore_rows(df: DataFrame, cols: Sequence[str], ddof: int = 1) -> DataFrame:
    """Standardize each row across ``cols``: (x - mean) / std(ddof).

    Constant rows map to 0 (reference guard: mdataframe.py:152-153).
    Pure horizontal arithmetic — no shuffle, no UDF.
    """
    cols = list(cols)
    k = len(cols)
    mean = sum((F.col(c) for c in cols), F.lit(0.0)) / F.lit(k)
    var = sum(((F.col(c) - mean) ** 2 for c in cols), F.lit(0.0)) / F.lit(max(k - ddof, 1))
    std = F.sqrt(var)
    constant = F.greatest(*[F.col(c) for c in cols]) == F.least(*[F.col(c) for c in cols])
    out = {
        c: F.when(constant, F.lit(0.0)).otherwise((F.col(c) - mean) / std) for c in cols
    }
    return df.withColumns(out)


# ---------------------------------------------------------------------------
# log2 CPM (edgeR cpm(log=TRUE) semantics; reference transformations.py:132-138)
# ---------------------------------------------------------------------------
def cpm_log2(
    df: DataFrame,
    count_cols: Sequence[str],
    prior_count: float = 5.0,
    norm_factors: Optional[Dict[str, float]] = None,
    lib_sizes: Optional[Dict[str, float]] = None,
) -> DataFrame:
    """log2 counts-per-million with a library-size-scaled prior.

    Follows edgeR's documented addPriorCount/cpm math: with effective
    library size L_s = lib_s * factor_s and mean effective size L̄,
    prior_s = prior * L_s / L̄ ; out = log2((x + prior_s) / (L_s + 2*prior_s) * 1e6).

    lib sizes are one distributed aggregation (a scalar per sample);
    the transform itself is column arithmetic.
    """
    count_cols = list(count_cols)
    if lib_sizes is None:
        row = df.select([F.sum(c).alias(c) for c in count_cols]).collect()[0]
        lib_sizes = {c: float(row[c]) for c in count_cols}
    factors = norm_factors or {c: 1.0 for c in count_cols}
    eff = {c: lib_sizes[c] * factors[c] for c in count_cols}
    mean_eff = sum(eff.values()) / len(count_cols)
    out = {}
    for c in count_cols:
        prior_s = prior_count * eff[c] / mean_eff
        denom = eff[c] + 2.0 * prior_s
        out[c] = F.log2((F.col(c) + F.lit(prior_s)) / F.lit(denom) * F.lit(1e6))
    return df.withColumns(out)


# ---------------------------------------------------------------------------
# TMM normalization factors (edgeR calcNormFactors, TMM method)
# ---------------------------------------------------------------------------
def tmm_norm_factors(
    df: DataFrame,
    count_cols: Sequence[str],
    index_column: str = ROW_ID,
    logratio_trim: float = 0.3,
    sum_trim: float = 0.05,
    lib: Optional[Dict[str, float]] = None,
    f75: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """Compute TMM scale factors for each sample column.

    Algorithm (Robinson & Oshlack 2010, as in edgeR's calcNormFactors):

    1. reference sample = the one whose upper-quartile/libsize is closest
       to the mean across samples;
    2. per sample s vs reference r, per gene: M = log2((x_s/L_s)/(x_r/L_r)),
       A = ½·log2((x_s/L_s)·(x_r/L_r)), precision weight 1/v with
       v = (L_s-x_s)/(L_s·x_s) + (L_r-x_r)/(L_r·x_r); genes with a zero on
       either side are dropped;
    3. two-sided trim: drop genes outside the central (1-2·0.30) of the M
       ranking and (1-2·0.05) of the A ranking (R 'average' tie ranks);
    4. factor_s = 2^(Σ M/v / Σ 1/v) over kept genes, then factors are
       scaled so their geometric mean is 1.

    Execution shape: one wide aggregation for libsizes/quartiles (collect:
    #samples scalars; callers that already aggregated can pass ``lib``/
    ``f75`` to skip the job), a melt, one co-partitioned join on the row id
    against the reference sample's values, windows partitioned by sample
    for the trim ranks, one groupBy(sample) — every step parallel in the
    gene dimension, driver traffic bounded by #samples.
    """
    count_cols = list(count_cols)
    if lib is None or f75 is None:
        aggs = [F.sum(c).alias(f"lib_{c}") for c in count_cols] + [
            F.expr(f"percentile(`{c}`, 0.75)").alias(f"q75_{c}") for c in count_cols
        ]
        row = df.agg(*aggs).collect()[0]
        lib = {c: float(row[f"lib_{c}"]) for c in count_cols}
        f75 = {c: float(row[f"q75_{c}"]) / lib[c] for c in count_cols}

    values = sorted(f75.values())
    median_f75 = (
        values[len(values) // 2]
        if len(values) % 2
        else 0.5 * (values[len(values) // 2 - 1] + values[len(values) // 2])
    )
    if median_f75 < 1e-20:
        sqrt_row = df.agg(
            *[F.sum(F.sqrt(F.col(c))).alias(c) for c in count_cols]
        ).collect()[0]
        ref = max(count_cols, key=lambda c: float(sqrt_row[c]))
    else:
        mean_f75 = sum(f75.values()) / len(f75)
        ref = min(count_cols, key=lambda c: abs(f75[c] - mean_f75))

    long = df.melt(
        ids=[index_column],
        values=count_cols,
        variableColumnName="__sample",
        valueColumnName="__x",
    )
    ref_vals = (
        df.select(F.col(index_column), F.col(ref).cast("double").alias("__xr"))
        .filter(F.col(ref) > 0)
    )
    lib_map = F.create_map(
        *[x for c in count_cols for x in (F.lit(c), F.lit(lib[c]))]
    )
    lib_ref = float(lib[ref])

    j = (
        long.filter(F.col("__x") > 0)
        .join(ref_vals, index_column)
        .withColumn("__libs", lib_map[F.col("__sample")])
        .withColumn("__ps", F.col("__x") / F.col("__libs"))
        .withColumn("__pr", F.col("__xr") / F.lit(lib_ref))
        .withColumn("__m", F.log2(F.col("__ps") / F.col("__pr")))
        .withColumn("__a", (F.log2(F.col("__ps")) + F.log2(F.col("__pr"))) / 2)
        .withColumn(
            "__v",
            (F.col("__libs") - F.col("__x")) / (F.col("__libs") * F.col("__x"))
            + (F.lit(lib_ref) - F.col("__xr")) / (F.lit(lib_ref) * F.col("__xr")),
        )
        .filter(F.col("__a") > -1e10)
    )

    def avg_rank(col: str) -> F.Column:
        # R 'average' tie rank = min_rank + (ties - 1) / 2
        w_rank = Window.partitionBy("__sample").orderBy(F.col(col))
        w_ties = Window.partitionBy("__sample", col)
        return F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_ties) - 1) / 2.0

    w_sample = Window.partitionBy("__sample")
    n = F.count(F.lit(1)).over(w_sample)
    lo_l = F.floor(n * logratio_trim) + 1
    hi_l = n + 1 - lo_l
    lo_s = F.floor(n * sum_trim) + 1
    hi_s = n + 1 - lo_s

    ranked = (
        j.withColumn("__rm", avg_rank("__m"))
        .withColumn("__ra", avg_rank("__a"))
        .withColumn("__n", n)
        .withColumn(
            "__keep",
            (F.col("__rm") >= lo_l)
            & (F.col("__rm") <= hi_l)
            & (F.col("__ra") >= lo_s)
            & (F.col("__ra") <= hi_s),
        )
    )
    agg = (
        ranked.groupBy("__sample")
        .agg(
            (
                F.sum(F.when(F.col("__keep"), F.col("__m") / F.col("__v")))
                / F.sum(F.when(F.col("__keep"), 1.0 / F.col("__v")))
            ).alias("f_log"),
            F.max(F.abs(F.col("__m"))).alias("max_abs_m"),
        )
        .collect()
    )
    factors = {}
    for r in agg:
        if r["max_abs_m"] is not None and r["max_abs_m"] < 1e-6:
            factors[r["__sample"]] = 1.0
        elif r["f_log"] is None or math.isnan(r["f_log"]):
            factors[r["__sample"]] = 1.0
        else:
            factors[r["__sample"]] = 2.0 ** r["f_log"]
    for c in count_cols:
        factors.setdefault(c, 1.0)
    log_mean = sum(math.log(f) for f in factors.values()) / len(factors)
    geo = math.exp(log_mean)
    return {c: factors[c] / geo for c in count_cols}


# ---------------------------------------------------------------------------
# batch-effect removal (limma removeBatchEffect semantics)
# ---------------------------------------------------------------------------
def batch_correction_matrix(
    samples: Sequence[str], batches: Dict[str, str]
) -> List[List[float]]:
    """Samples×samples linear map implementing removeBatchEffect.

    removeBatchEffect fits, per gene, OLS of the log-values on
    [intercept | sum-contrast-coded batch columns] and subtracts the
    batch contribution. Because the design depends only on the batch
    assignment (shared by all genes), the correction is a fixed linear
    map M = I - B·S·Dᵀ (S = batch rows of (DᵀD)⁻¹Dᵀ's projector),
    precomputed here with numpy; each corrected column is then a literal
    linear combination of input columns — pure codegen arithmetic.
    """
    import numpy as np

    samples = list(samples)
    levels = sorted(set(batches[s] for s in samples))
    k = len(levels)
    n = len(samples)
    if k < 2:
        return np.eye(n).tolist()
    # contr.sum coding: level i -> e_i (i<k-1); last level -> -1s
    contrast = np.zeros((n, k - 1))
    for si, s in enumerate(samples):
        li = levels.index(batches[s])
        if li < k - 1:
            contrast[si, li] = 1.0
        else:
            contrast[si, :] = -1.0
    design = np.column_stack([np.ones(n), contrast])
    pinv = np.linalg.pinv(design)  # (k, n): coef = pinv @ x
    batch_rows = pinv[1:, :]  # batch coefficients only
    m = np.eye(n) - contrast @ batch_rows
    return m.tolist()


# ---------------------------------------------------------------------------
# TMM transformer (reference API parity: transformations.py:63-152)
# ---------------------------------------------------------------------------
class TMM(Transformer):
    """TMM-normalized log2-CPM, with optional batch correction.

    API-parity with the reference transformer (same constructor shape,
    suffix contract ``" (TMM)"`` / ``" (TMM batch-corrected)"``) but
    computed natively on Spark — no R bridge.
    """

    def __init__(
        self,
        samples_to_group: Optional[Dict[str, str]] = None,
        batch_effects: Optional[Dict[str, str]] = None,
        suffix=None,
        index_column: str = ROW_ID,
        prior_count: float = 5.0,
    ):
        super().__init__("TMM", samples_to_group, batch_effects)
        self.samples_to_group = samples_to_group
        self.batch_effects = batch_effects
        self.index_column = index_column
        self.prior_count = prior_count
        self.suffix = suffix
        if suffix is True:
            self.suffix = " (TMM)" if batch_effects is None else " (TMM batch-corrected)"

    def _transform(self, df: DataFrame) -> DataFrame:
        count_cols = [c for c in df.columns if c != self.index_column]
        factors = tmm_norm_factors(df, count_cols, self.index_column)
        out = cpm_log2(df, count_cols, prior_count=self.prior_count, norm_factors=factors)
        if self.batch_effects is not None:
            m = batch_correction_matrix(count_cols, self.batch_effects)
            corrected = {}
            for si, s in enumerate(count_cols):
                expr = F.lit(0.0)
                for ti, t in enumerate(count_cols):
                    coeff = m[si][ti]
                    if abs(coeff) > 1e-15:
                        expr = expr + F.lit(coeff) * F.col(t)
                corrected[s] = expr
            out = out.withColumns(corrected)
        return self._apply_suffix(out, count_cols)


# ---------------------------------------------------------------------------
# upper-quartile normalization (edgeR calcNormFactors method="upperquartile")
# ---------------------------------------------------------------------------
def upper_quartile_factors(
    df: DataFrame,
    count_cols: Sequence[str],
    p: float = 0.75,
    decimals: int = 9,
    lib: Optional[Dict[str, float]] = None,
    q: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """Upper-quartile scale factors (Bullard et al. 2010; edgeR's
    calcNormFactors(method="upperquartile")): per sample,
    f_s = quantile_p(counts_s) / libsize_s, then factors scaled so
    their geometric mean is 1.

    One wide aggregation (2·#samples scalars to the driver); the
    power/normalize runs driver-side over sorted samples and rounds at
    ``decimals`` (the reproducible-constant convention). Raises when a
    sample's p-quantile is zero (edgeR warns and refuses there too —
    the factor would be degenerate).
    """
    count_cols = list(count_cols)
    if lib is None or q is None:
        aggs = [F.sum(c).alias(f"lib_{c}") for c in count_cols] + [
            F.expr(f"percentile(`{c}`, {p})").alias(f"q_{c}")
            for c in count_cols
        ]
        row = df.agg(*aggs).collect()[0]
        lib = {c: float(row[f"lib_{c}"]) for c in count_cols}
        q = {c: float(row[f"q_{c}"]) for c in count_cols}
    f = {}
    for c in count_cols:
        if q[c] <= 0:
            raise ValueError(
                f"upper_quartile_factors: sample {c!r} has a zero "
                f"{p}-quantile — upper-quartile normalization is "
                f"undefined (edgeR refuses here as well)"
            )
        f[c] = q[c] / lib[c]
    gm = math.exp(sum(math.log(f[c]) for c in sorted(f)) / len(f))
    return {c: round(f[c] / gm, decimals) for c in count_cols}


# ---------------------------------------------------------------------------
# quantile normalization (limma normalizeQuantiles / preprocessCore)
# ---------------------------------------------------------------------------
def quantile_normalize(
    df: DataFrame,
    count_cols: Sequence[str],
    index_column: str = ROW_ID,
    suffix: str = "_qn",
) -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003; limma
    normalizeQuantiles): force every sample column onto the SAME
    empirical distribution — the k-th smallest value in each sample is
    replaced by the mean of the k-th smallest values across samples;
    tied values receive the mean target over their rank range (ties
    stay tied, limma's ties=TRUE behavior — which also makes the
    result independent of the arbitrary tie-break order).

    Execution shape (the scale-out answer to the in-memory
    sort-matrix): melt to (row, sample, value); rank with ONE window
    per sample (each sample's vector sorts in parallel); the target
    distribution is ONE groupBy(rank) over samples (genes-bounded);
    tie collapse is ONE groupBy((sample, value)); the matrix pivots
    back via conditional aggregation. Rounding: targets at 9 dp (the
    cross-sample mean is the only FP accumulation), tie means at 6 dp.

    Requires a COMPLETE matrix (no nulls — ranks would silently shift
    across samples): raises if any rank row is short a sample.
    """
    count_cols = list(count_cols)
    n = len(count_cols)
    melted = df.select(
        F.col(index_column).alias("__i"),
        F.expr(
            "stack({}, {}) as (__s, __v)".format(
                n,
                ", ".join(
                    f"'{c}', cast(`{c}` as double)" for c in count_cols
                ),
            )
        ),
    )
    # drop nulls BEFORE ranking: stack() emits them, they would sort
    # first and be silently "normalized"; the guards below catch the
    # resulting column-length mismatches
    melted = melted.filter(F.col("__v").isNotNull())
    from ..cache import persist_tracked as _persist_tracked

    w = Window.partitionBy("__s").orderBy(F.col("__v").asc(), F.col("__i").asc())
    # ranked feeds targets, the tie collapse AND the final join — pin
    # it once so the per-sample sort windows (the dominant cost)
    # execute once, not three times
    ranked = _persist_tracked(melted.withColumn("__rn", F.row_number().over(w)))
    targets = ranked.groupBy("__rn").agg(
        F.round(F.avg("__v"), 9).alias("__t"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    targets = _persist_tracked(targets)
    row = targets.agg(
        F.sum(F.when(F.col("__cnt") != n, 1).otherwise(0)).alias("bad"),
        F.sum("__cnt").alias("tot"),
    ).first()
    # two guards: unequal column lengths (a rank row short a sample)
    # AND equal-but-nonzero null counts per sample (rank rows all full
    # width, yet fewer melted rows than rows x samples — ranks shifted
    # identically in every column, still a silent misalignment)
    n_rows = df.count()
    if row["bad"] or (row["tot"] or 0) != n_rows * n:
        raise ValueError(
            f"quantile_normalize: the matrix has nulls/unequal column "
            f"lengths ({row['bad']} rank row(s) short a sample; "
            f"{row['tot']} non-null cells for {n_rows} x {n} matrix) — "
            f"ranks would silently misalign"
        )
    tied = (
        ranked.join(targets.select("__rn", "__t"), "__rn")
        .groupBy("__s", "__v")
        .agg(F.round(F.avg("__t"), 6).alias("__q"))
    )
    normed = ranked.join(tied, ["__s", "__v"])
    return normed.groupBy(F.col("__i").alias(index_column)).agg(
        *[
            F.max(F.when(F.col("__s") == c, F.col("__q"))).alias(c + suffix)
            for c in count_cols
        ]
    )
