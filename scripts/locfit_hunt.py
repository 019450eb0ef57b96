"""Experiment harness: pure-numpy replica of the EdgeR_Unpaired
estimateDisp chain on the golden 4x6 fixture, with a PLUGGABLE trend
smoother — used to identify which locfit-faithful smoother reproduces
R's golden p-values (the only remaining parity gap is the trend).

Run: python scripts/locfit_hunt.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mdataframe_spark.functions import edger  # noqa: E402

Y = np.array(
    [
        [23, 2, 21, 23, 3, 4],
        [12, 14, 14, 4, 4, 5],
        [9, 6, 6, 21, 22, 23],
        [40, 80, 80, 90, 90, 80],
    ],
    dtype=float,
)
GENES = ["genA", "genB", "genC", "genD"]
# TMM factors for the fixture (tmm_norm_factors output, fixed)
FACTORS = np.array([
    1.305097012837139, 1.0355386367533572, 0.8729333962714252,
    0.8931169802402497, 1.0004487802949256, 0.9486512485464873,
])
GOLDEN_P = np.array([5.263604e-01, 1.429378e-04, 6.638539e-06, 4.473013e-01])
GOLDEN_LFC = np.array([0.7643766, 1.7107356, -1.5167703, -0.2533613])

GRID_LENGTH = 21
GRID_RANGE = (-10.0, 10.0)
MIN_ROW_SUM = 5.0


def pipeline(trend_fn, verbose=False):
    """Full chain with trend_fn(alc, l0, counts) -> m0 (genes x grid)."""
    lib = Y.sum(axis=0)
    eff = lib * FACTORS
    group = np.array(["a"] * 3 + ["b"] * 3)
    pts = np.linspace(GRID_RANGE[0], GRID_RANGE[1], GRID_LENGTH)
    disps = 0.1 * 2.0 ** pts

    l0 = np.empty((len(Y), GRID_LENGTH))
    for i, d in enumerate(disps):
        l0[:, i] = edger.adjusted_profile_lik(d, Y, group, np.log(eff)[None, :])
    alc = edger.ave_log_cpm(Y, eff)
    sel = Y.sum(axis=1) >= MIN_ROW_SUM

    sum_curve = l0[sel].sum(axis=0)
    common_pt = edger._spline_argmax(pts, sum_curve)
    common_disp = 0.1 * 2.0 ** common_pt

    m0 = trend_fn(alc[sel], l0[sel], Y[sel])

    # prior df (fitFDist via deviance moments) — replica of
    # differential._distributed_prior_df at n=4
    trended = 0.1 * 2.0 ** edger.maximize_interpolant(pts, m0)
    s2, dfres = edger.deviance_s2(Y[sel], group, np.log(eff)[None, :], trended)
    ok = (dfres > 0) & (s2 > 0)
    d1 = dfres[ok].astype(float)
    e = np.log(s2[ok]) - edger.digamma(d1 / 2.0) + np.log(d1 / 2.0)
    trig = edger.trigamma(d1 / 2.0)
    n_ok = ok.sum()
    covariate = alc[sel][ok]
    df_spline = edger.spline_basis_df(n_ok)
    interior = max(df_spline - 2, 0)
    if interior > 0:
        qs = np.quantile(covariate, np.linspace(0, 1, interior + 2)[1:-1])
        knots = sorted(list(qs) + [covariate.min(), covariate.max()])
    else:
        knots = []
    # basis replica of _ns_basis_exprs
    X = [np.ones(n_ok), covariate]
    if df_spline > 2 and len(knots) >= 3:
        k_last, k_prev = knots[-1], knots[-2]

        def dd(kn):
            return (
                np.maximum(covariate - kn, 0.0) ** 3
                - np.maximum(covariate - k_last, 0.0) ** 3
            ) / (k_last - kn)

        dp = dd(k_prev)
        for kn in knots[:-2]:
            X.append(dd(kn) - dp)
    else:
        X = X[: max(df_spline, 1)]
    X = np.column_stack(X)
    rank = np.linalg.matrix_rank(X.T @ X)
    coef = np.linalg.pinv(X.T @ X) @ (X.T @ e)
    rss = max(e @ e - coef @ (X.T @ e), 0.0)
    if n_ok - rank <= 0:
        prior_df = np.inf
    else:
        evar = rss / (n_ok - rank) - trig.mean()
        prior_df = (
            2.0 * float(edger.trigamma_inverse(np.array([evar]))[0])
            if evar > 0
            else np.inf
        )
    df_resid = 6 - 2
    prior_n = prior_df / df_resid if np.isfinite(prior_df) else 1e8

    # phase B
    shrunk = np.where(sel[:, None], l0 + prior_n * m0, m0)
    tagwise = 0.1 * 2.0 ** edger.maximize_interpolant(pts, shrunk)
    pseudo, _ = edger.equalize_pooled(Y, tagwise, eff)
    pv = edger.exact_test_doubletail(pseudo[:, :3], pseudo[:, 3:], tagwise)
    lfc = edger.exact_test_logfc(Y, tagwise, eff, 3)
    if verbose:
        print("  common_disp", common_disp, "prior_df", prior_df)
        print("  tagwise", tagwise)
    return pv, lfc, tagwise


def tricube_direct(alc, l0, counts, span=1.0):
    """Current production stand-in (_TrendMixer with per-gene bins)."""
    centers = alc
    w_counts = np.ones(len(alc))
    total = w_counts.sum()
    d = np.abs(centers[None, :] - alc[:, None])
    order = np.argsort(d, axis=1)
    cum = np.cumsum(np.take_along_axis(
        np.broadcast_to(w_counts[None, :], d.shape), order, axis=1), axis=1)
    kidx = np.argmax(cum >= span * total, axis=1)
    h = np.take_along_axis(d, order, axis=1)[np.arange(len(alc)), kidx]
    h = np.maximum(h, 1e-10)[:, None]
    w = np.clip(1.0 - (d / h) ** 3, 0.0, None) ** 3
    w = np.maximum(w, 1e-8) * w_counts[None, :]
    w = w / w.sum(axis=1, keepdims=True)
    return w @ l0


def locfit_emulated(alc, l0, counts, span=1.0, cut=0.8, kfun="floor",
                    slope=False):
    """locfit deg-0 gaussian emulation: adaptive 1-D tree + cubic
    Hermite interpolation with zero end slopes (deg 0 stores no
    derivative). Bandwidth at v = distance to k-th nearest data point,
    k = floor/ceil(n * span)."""
    x = np.asarray(alc, dtype=float)
    n = len(x)
    k = int(np.floor(n * span)) if kfun == "floor" else int(np.ceil(n * span))
    k = min(max(k, 1), n)

    def h_at(v):
        d = np.sort(np.abs(x - v))
        return d[k - 1]

    def fit_at(v):
        h = max(h_at(v), 1e-10)
        d = np.abs(x - v) / h
        w = np.clip(1 - d ** 3, 0, None) ** 3
        if w.sum() <= 0:
            w = np.ones(n)
        w = w / w.sum()
        return w @ l0  # (grid,)

    # grow the tree: split [l, u] if width > cut * min(h(l), h(u))
    lo, hi = float(x.min()), float(x.max())
    verts = [lo, hi]

    def grow(l, u, depth=0):
        if depth > 12:
            return
        if (u - l) > cut * min(h_at(l), h_at(u)):
            m = 0.5 * (l + u)
            verts.append(m)
            grow(l, m, depth + 1)
            grow(m, u, depth + 1)

    grow(lo, hi)
    verts = np.array(sorted(set(verts)))
    fits = np.array([fit_at(v) for v in verts])  # (V, grid)

    # fitted at data points: cubic Hermite, zero slopes
    out = np.empty_like(l0)
    for i, v in enumerate(x):
        j = np.searchsorted(verts, v, side="right") - 1
        j = min(max(j, 0), len(verts) - 2)
        v0, v1 = verts[j], verts[j + 1]
        t = 0.0 if v1 == v0 else (v - v0) / (v1 - v0)
        h00 = 2 * t ** 3 - 3 * t ** 2 + 1
        h01 = -2 * t ** 3 + 3 * t ** 2
        out[i] = h00 * fits[j] + h01 * fits[j + 1]
    return out


def report(name, trend_fn):
    pv, lfc, tw = pipeline(trend_fn)
    dp = np.abs(pv - GOLDEN_P)
    dl = np.abs(np.log10(pv) - np.log10(GOLDEN_P))
    print(f"{name:40s} max|dp|={dp.max():.2e} max|dlog10|={dl.max():.4f} "
          f"tagwise={np.round(tw, 5)}")
    return dp.max(), dl.max()


if __name__ == "__main__":
    report("tricube_direct (production)", tricube_direct)
    for cut in (0.8, 0.7, 0.9):
        report(f"locfit tree cut={cut} floor zero-slope",
               lambda a, l, c, cut=cut: locfit_emulated(a, l, c, cut=cut))
    report("locfit 2-vertex only (no split)",
           lambda a, l, c: locfit_emulated(a, l, c, cut=1e9))
    report("locfit linear interp",
           lambda a, l, c: locfit_emulated(a, l, c, cut=0.8))


# ---------------------------------------------------------------------------
# Round-4 findings (kept as the experiment record)
# ---------------------------------------------------------------------------
# 1. The locfit smoother is NOT the residual gap. A faithful emulation of
#    locfit's adaptive 1-D tree (midpoint splits while cell width >
#    cut*min(h(vertex)), deg-0 tricube fits at vertices, cubic Hermite
#    zero-slope interpolation) produces tagwise dispersions within 0.1%
#    of the production tricube stand-in at span=1 (genD sits exactly on
#    the boundary vertex; interior genes interpolate to nearly the same
#    values). Run this script to reproduce.
# 2. Inverting the golden p-values through the (enumeration-exact)
#    doubled-tail test gives R's tagwise dispersions:
#      genA 0.81973, genB 0.0086604, genC 9.7656e-5 (grid floor),
#      genD 0.062072.
#    With OUR m0 and a SINGLE prior.n, the best fit is maxlogerr 0.024 —
#    genA requires prior.n ~0.240 while genB requires ~0.2788. No scalar
#    prior satisfies both: the reference must be using estimateDisp
#    (robust=TRUE), whose limma fitFDistRobustly returns a PER-GENE
#    df2.shrunk.
# 3. The robust-EB structure matches quantitatively: required
#    df2.shrunk_A / df2_B = 0.96/1.115 = 0.86, and the ProbNotOutlier
#    mixing (TailP vs (n-rank+0.5)/n empirical tail) reproduces 0.855
#    on this fixture. The absolute scalar df2 from winsorized-moment
#    matching lands at 1.03-1.30 depending on quantile type/variance
#    divisor conventions (target 1.115) — conventions that cannot be
#    pinned without R in the container. Implementing a guessed variant
#    end-to-end moved genB the wrong way (log10 err 0.20), so the
#    non-robust fitFDist prior (documented, within 2x of the robust
#    target) remains the shipped estimator.
# ---------------------------------------------------------------------------
# Round-5 addendum (second robust-prior attempt — also negative)
# ---------------------------------------------------------------------------
# Hypothesis tested: with n=4 genes, winsor.tail.p=c(0.05,0.1) cannot
# winsorize a single point (n*p < 1), so fitFDistRobustly's SCALAR df2
# may fall back to plain fitFDist (ours: 1.1399 vs inverted target
# 1.115 — 2% off, plausibly our spline-basis vs R's ns()), leaving only
# the per-gene ProbNotOutlier mixing to reproduce. Implemented the
# mixing end-to-end (TailP = upper-tail F(df.residual, df2) of
# deviance-s2 over the per-gene spline scale; EmpiricalTailProb =
# (n-rank+0.5)/n; df2.outlier from the max-F median rule; cummax
# monotonicity): genA's TailP comes out 0.368 >> the 0.107 needed for
# the known 0.855 mixing weight, so NO gene is flagged and the result
# is numerically identical to the non-robust pipeline (maxdlog10
# 0.0301). The outlier-flagging convention (what exactly Fstat is
# measured against) therefore also cannot be pinned without the limma
# source — `find / -iname '*fitFDist*'` confirms no R/limma in this
# container. Experiment: /tmp-era script preserved in git history via
# this note; the shipped estimator remains the documented non-robust
# fitFDist.
