"""Distributed ordinary least squares via sufficient statistics.

The reference outsources model fitting to sklearn/R driver-side (ref
src/mdataframe/clustering.py, differential.py call patterns); here the
fit is a distributed plan: ONE partial-aggregated pass reduces the
corpus to O(d²) moment scalars, and for the common two-feature case the
normal equations are solved IN the plan by Cramer's rule — plain
arithmetic on the rounded moments, so a SQL oracle replays the
coefficients bit-for-bit (the same rounded-sums OLS discipline as
operators/text.py zipf_fit, which fits the d=1 case).

For d > 2 use :func:`ols_moments` + a driver-side solve of the d×d
normal equations (the operators/classifier.py IRLS pattern — the
moments frame IS the entire cross-worker traffic).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ols_moments", "ols_closed_form", "cramer2_exprs", "det_guard_expr"]


def ols_moments(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """One-row frame of the OLS sufficient statistics: row count plus
    every first/second averaged moment of (1, x₁..x_d, y).

    Averages (not sums) keep the magnitudes O(feature²) so the
    ``decimals`` rounding — which absorbs cross-engine partial-agg
    ordering noise — costs no relative precision. Complete-case: rows
    with any null among the used columns are excluded up front (one
    denominator for every moment, the classifier.py convention).

    Column names: ``n``, ``m_<x>``, ``m_y``, ``m_<xi>_<xj>`` (i ≤ j),
    ``m_<x>_y``, ``m_y_y``.
    """
    cols = list(x_cols) + [y_col]
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond)
    xs = {c: F.col(c).cast("double") for c in x_cols}
    y = F.col(y_col).cast("double")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in x_cols:
        aggs.append(F.round(F.avg(xs[c]), decimals).alias(f"m_{c}"))
    aggs.append(F.round(F.avg(y), decimals).alias("m_y"))
    for i, a in enumerate(x_cols):
        for b in list(x_cols)[i:]:
            aggs.append(
                F.round(F.avg(xs[a] * xs[b]), decimals).alias(f"m_{a}_{b}")
            )
    for c in x_cols:
        aggs.append(F.round(F.avg(xs[c] * y), decimals).alias(f"m_{c}_y"))
    aggs.append(F.round(F.avg(y * y), decimals).alias("m_y_y"))
    return base.agg(*aggs)


def _det3(m: List[List[str]]) -> str:
    """3×3 determinant as an arithmetic expression string (valid in both
    Spark SQL and DuckDB — plain +-*, fixed evaluation order)."""
    return (
        f"({m[0][0]}) * (({m[1][1]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][1]}))"
        f" - ({m[0][1]}) * (({m[1][0]}) * ({m[2][2]}) - ({m[1][2]}) * ({m[2][0]}))"
        f" + ({m[0][2]}) * (({m[1][0]}) * ({m[2][1]}) - ({m[1][1]}) * ({m[2][0]}))"
    )


def cramer2_exprs(x1: str, x2: str) -> Dict[str, str]:
    """Expression strings solving the two-feature normal equations
    A·β = b by Cramer's rule, in terms of the :func:`ols_moments`
    column names — the SAME strings drive ``F.expr`` on the Spark side
    and the DuckDB oracle, so the coefficient arithmetic is literally
    identical in both engines.

    A = [[1, m1, m2], [m1, m11, m12], [m2, m12, m22]],
    b = [my, m1y, m2y]; also returns ``r2`` via
    R² = 1 − (m_yy − β·E[xᵀy]) / (m_yy − m_y²) (exact for the
    normal-equation solution).
    """
    m1, m2 = f"m_{x1}", f"m_{x2}"
    m11, m12, m22 = f"m_{x1}_{x1}", f"m_{x1}_{x2}", f"m_{x2}_{x2}"
    my, m1y, m2y, myy = "m_y", f"m_{x1}_y", f"m_{x2}_y", "m_y_y"
    a = [["1.0", m1, m2], [m1, m11, m12], [m2, m12, m22]]
    b = [my, m1y, m2y]
    det = _det3(a)
    betas = {}
    for j, name in enumerate(("b0", "b1", "b2")):
        mj = [row[:] for row in a]
        for i in range(3):
            mj[i][j] = b[i]
        betas[name] = f"(({_det3(mj)}) / ({det}))"
    r2 = (
        f"(1.0 - ({myy} - ({betas['b0']}) * {my} - ({betas['b1']}) * {m1y}"
        f" - ({betas['b2']}) * {m2y}) / ({myy} - {my} * {my}))"
    )
    return {**betas, "r2": r2, "det": det}


def det_guard_expr(x1: str, x2: str, decimals: int = 6) -> str:
    """Singularity guard for the Cramer solve, as an expression string
    shared by both engines: the determinant of a COLLINEAR design is
    not exactly zero once the moments are rounded — it is
    rounding-noise-sized, bounded by ~cofactor magnitudes × the
    10^-decimals rounding step. The guard therefore tests |det| against
    100·10^-decimals scaled by the dominant second-moment product
    (floored at 1 for sub-unit features); a conditioned design's det
    carries the variance product and sits orders of magnitude above.
    """
    exprs = cramer2_exprs(x1, x2)
    m11, m22 = f"m_{x1}_{x1}", f"m_{x2}_{x2}"
    tol = 100.0 * (10.0 ** -decimals)
    return (
        f"(abs({exprs['det']}) > {tol!r} * "
        f"greatest(1.0, abs({m11} * {m22})))"
    )


def ols_closed_form(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    decimals: int = 6,
) -> DataFrame:
    """Distributed two-feature OLS with the solve inside the plan:
    moments → Cramer's rule → (n, moments…, b0, b1, b2, r2), one row,
    one corpus pass, zero Python. Degenerate (collinear) designs yield
    NULL coefficients via the tolerance determinant guard
    (:func:`det_guard_expr` — rounded moments make a singular design's
    det tiny-but-nonzero, so an exact-zero test would pass garbage
    coefficients through)."""
    if len(x_cols) != 2:
        raise ValueError(
            "ols_closed_form solves the 2-feature normal equations in-plan; "
            f"got {len(x_cols)} features — use ols_moments + a driver solve"
        )
    mom = ols_moments(df, y_col, x_cols, decimals=decimals)
    exprs = cramer2_exprs(*x_cols)
    ok = F.expr(det_guard_expr(*x_cols, decimals=decimals))
    out = mom.withColumn("__ok", ok)
    for name in ("b0", "b1", "b2", "r2"):
        out = out.withColumn(
            name, F.round(F.when(F.col("__ok"), F.expr(exprs[name])), decimals)
        )
    return out.drop("__ok")
