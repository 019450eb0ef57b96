"""DESeq2-style LRT (M5): general-design NB GLM likelihood-ratio test.

The reference's DESeq2Timeseries ships no golden (its test only checks
construction), so correctness is property-based:
- a condition effect that exists → tiny p; pure-noise factor → large p
- LRT stat ≈ Wald stat² on a two-group design (asymptotic equivalence)
- nested invariance and chi2 distribution bounds
"""

import numpy as np
import pytest

from mdataframe_spark.functions.deseq2 import DESeq2LRT, DESeq2UnpairedAB


SAMPLES = {
    # 2 conditions × (batch x/y) × 2 replicates = 8 samples
    f"s{i}": {"condition": ("A" if i < 4 else "B"), "batch": ("x" if i % 2 else "y")}
    for i in range(8)
}


@pytest.fixture
def lrt_frame(spark):
    rng = np.random.RandomState(11)
    rows = []
    for gi in range(30):
        base = rng.randint(20, 200)
        effect = 3.0 if gi < 10 else 1.0  # first 10 genes differential
        vals = []
        for i in range(8):
            mu = base * (effect if i >= 4 else 1.0)
            vals.append(int(max(rng.poisson(mu), 0)))
        rows.append((f"g{gi}", *vals))
    return spark.createDataFrame(rows, ["__row_id"] + [f"s{i}" for i in range(8)])


def test_lrt_contract():
    t = DESeq2LRT(SAMPLES, full=["condition", "batch"], reduced=["batch"])
    assert t.p_column == "p (DESeq2TimeSeries)"
    assert t.logFC_column == "log2FC (DESeq2TimeSeries)"
    with pytest.raises(ValueError, match="more coefficients"):
        DESeq2LRT(SAMPLES, full=["batch"], reduced=["batch"])


def test_lrt_detects_condition_effect(lrt_frame):
    t = DESeq2LRT(SAMPLES, full=["condition", "batch"], reduced=["batch"],
                  dispersion=0.05)
    rows = {r["__row_id"]: r for r in t(lrt_frame).collect()}
    diff_p = [rows[f"g{i}"][t.p_column] for i in range(10)]
    null_p = [rows[f"g{i}"][t.p_column] for i in range(10, 30)]
    assert max(diff_p) < 1e-4          # 3x effects are unmissable
    assert np.median(null_p) > 0.05    # null genes mostly non-significant
    for r in rows.values():
        assert 0 <= r[t.p_column] <= 1
        assert r[t.stat_column] >= 0
        assert r[t.fdr_column] >= r[t.p_column] - 1e-12


def test_lrt_matches_wald_asymptotically(lrt_frame):
    """Two-group design: LRT stat should approximate the Wald stat²."""
    c2c = {"A": [f"s{i}" for i in range(4)], "B": [f"s{i}" for i in range(4, 8)]}
    wald = DESeq2UnpairedAB("A", "B", c2c, dispersion=0.05)
    lrt = DESeq2LRT(SAMPLES, full=["condition"], reduced=[], dispersion=0.05)
    w = {r["__row_id"]: r[wald.stat_column] for r in wald(lrt_frame).collect()}
    l = {r["__row_id"]: r[lrt.stat_column] for r in lrt(lrt_frame).collect()}
    ratios = [l[g] / max(w[g] ** 2, 1e-9) for g in w if abs(w[g]) > 0.5]
    assert len(ratios) > 5
    # asymptotic equivalence: within 30% for non-degenerate genes
    assert np.median(np.abs(np.array(ratios) - 1.0)) < 0.3


def test_lrt_estimated_dispersions_are_shrunk(spark):
    """The estimated-dispersion path (dispersion=None) applies EB MAP
    shrinkage to the trend — same estimators as the Wald pipeline. With
    few replicates and a common true dispersion, raw gene-wise MLEs are
    noisy and anti-conservative; shrinkage must (a) agree with the Wald
    pipeline's shrunken p on a two-group design (same prior machinery)
    and (b) keep null p-values roughly uniform (not anti-conservative)."""
    rng = np.random.RandomState(7)
    n_genes, disp = 400, 0.1
    rows = []
    for gi in range(n_genes):
        base = rng.randint(30, 500)
        r = 1.0 / disp
        vals = rng.negative_binomial(r, r / (r + base), 8).astype(int)
        rows.append((f"g{gi}", *[int(v) for v in vals]))
    df = spark.createDataFrame(rows, ["__row_id"] + [f"s{i}" for i in range(8)])

    lrt = DESeq2LRT(SAMPLES, full=["condition"], reduced=[])
    out = {r["__row_id"]: r for r in lrt(df).collect()}
    pvals = np.array([out[f"g{i}"][lrt.p_column] for i in range(n_genes)])
    assert np.all((pvals >= 0) & (pvals <= 1))
    # anti-conservativeness check: with proper shrinkage the null
    # false-positive rate at 0.05 stays near nominal
    assert (pvals < 0.05).mean() < 0.12, (pvals < 0.05).mean()

    c2c = {"A": [f"s{i}" for i in range(4)], "B": [f"s{i}" for i in range(4, 8)]}
    wald = DESeq2UnpairedAB("A", "B", c2c)
    wp = {r["__row_id"]: r[wald.p_column] for r in wald(df).collect()}
    lp = np.array([out[g][lrt.p_column] for g in wp])
    wpv = np.array([wp[g] for g in wp])
    # same shrinkage machinery -> strongly correlated p-values
    assert np.corrcoef(np.log10(np.maximum(lp, 1e-12)),
                       np.log10(np.maximum(wpv, 1e-12)))[0, 1] > 0.9


def test_lrt_matches_independent_numpy_reference(spark):
    """M5 validation (r4 verdict item 6): the LRT stat and p-value are
    pinned against an INDEPENDENTLY written maximizer — derivative-free
    Nelder-Mead directly on the NB likelihood kernel, hand-built design
    matrices, and a Simpson-integrated normal tail for the chi2(1)
    survival function. Nothing is shared with the engine's IRLS /
    gammaln / gammainc code paths. For integer counts at a common fixed
    dispersion the Gamma terms cancel inside the likelihood RATIO, so
    the reference needs no special functions at all:
        kernel(beta) = sum_i r*log(r/(r+mu_i)) + y_i*log(mu_i/(r+mu_i))
        stat = 2 * (max kernel_full - max kernel_reduced).
    """
    disp = 0.1
    r = 1.0 / disp
    # 8 samples: condition A/A/A/A/B/B/B/B, batch y/x/y/x/y/x/y/x
    # (sorted sample-column order s0..s7 matches SAMPLES above)
    counts = {
        "g0": [35, 50, 41, 47, 151, 140, 180, 123],
        "g1": [90, 81, 103, 99, 94, 88, 107, 95],
        "g2": [12, 20, 9, 15, 51, 40, 63, 44],
        "g3": [200, 260, 231, 241, 221, 198, 252, 260],
        "g4": [5, 9, 4, 8, 6, 11, 3, 7],
        "g5": [400, 380, 430, 390, 150, 120, 170, 130],
    }
    rows = [(g, *map(int, v)) for g, v in counts.items()]
    df = spark.createDataFrame(rows, ["__row_id"] + [f"s{i}" for i in range(8)])

    # --- independent reference ---------------------------------------
    y_mat = np.array([counts[f"g{i}"] for i in range(6)], dtype=float)
    # median-of-ratios size factors, straight from the DESeq2 paper
    logg = np.log(y_mat)  # all counts positive in this fixture
    log_geo = logg.mean(axis=1)
    sf = np.exp(np.median(logg - log_geo[:, None], axis=0))
    # hand-built dummy-coded designs (intercept; B=1; batch y=1 — the
    # engine codes first SORTED level as reference: batch levels
    # {x, y} -> x is reference, y gets the dummy)
    cond = np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=float)
    batch = np.array([1, 0, 1, 0, 1, 0, 1, 0], dtype=float)
    X_full = np.column_stack([np.ones(8), batch, cond])
    X_red = np.column_stack([np.ones(8), batch])

    def kernel(beta, X, y):
        mu = sf * np.exp(X @ beta)
        return float(np.sum(r * np.log(r / (r + mu)) + y * np.log(mu / (r + mu))))

    def nelder_mead(f, x0, iters=2000):
        n = len(x0)
        simplex = [np.array(x0, dtype=float)]
        for i in range(n):
            p = np.array(x0, dtype=float)
            p[i] += 0.25
            simplex.append(p)
        vals = [f(p) for p in simplex]
        for _ in range(iters):
            order = np.argsort(vals)[::-1]  # maximize: best first
            simplex = [simplex[i] for i in order]
            vals = [vals[i] for i in order]
            if abs(vals[0] - vals[-1]) < 1e-12:
                break
            centroid = np.mean(simplex[:-1], axis=0)
            worst = simplex[-1]
            refl = centroid + (centroid - worst)
            fr = f(refl)
            if fr > vals[0]:
                exp_p = centroid + 2.0 * (centroid - worst)
                fe = f(exp_p)
                simplex[-1], vals[-1] = (
                    (exp_p, fe) if fe > fr else (refl, fr)
                )
            elif fr > vals[-2]:
                simplex[-1], vals[-1] = refl, fr
            else:
                contr = centroid + 0.5 * (worst - centroid)
                fc = f(contr)
                if fc > vals[-1]:
                    simplex[-1], vals[-1] = contr, fc
                else:
                    best = simplex[0]
                    simplex = [best] + [
                        best + 0.5 * (p - best) for p in simplex[1:]
                    ]
                    vals = [vals[0]] + [f(p) for p in simplex[1:]]
        return max(vals)

    def chi2_sf_df1(x):
        # sf = 2 * (1 - Phi(sqrt(x))): Simpson-integrate the standard
        # normal density over [sqrt(x), sqrt(x) + 12]
        a = np.sqrt(x)
        grid = np.linspace(a, a + 12.0, 4001)
        dens = np.exp(-grid * grid / 2.0) / np.sqrt(2.0 * np.pi)
        h = grid[1] - grid[0]
        simpson = h / 3.0 * (
            dens[0] + dens[-1] + 4.0 * dens[1:-1:2].sum() + 2.0 * dens[2:-1:2].sum()
        )
        return 2.0 * simpson

    ref = {}
    for gi in range(6):
        y = y_mat[gi]
        x0 = [np.log((y / sf).mean()), 0.0, 0.0]
        k_full = nelder_mead(lambda b: kernel(b, X_full, y), x0)
        k_red = nelder_mead(lambda b: kernel(b, X_red, y), x0[:2])
        stat = max(2.0 * (k_full - k_red), 0.0)
        ref[f"g{gi}"] = (stat, chi2_sf_df1(stat))

    # --- engine -------------------------------------------------------
    t = DESeq2LRT(SAMPLES, full=["condition", "batch"], reduced=["batch"],
                  dispersion=disp)
    got = {r["__row_id"]: (r[t.stat_column], r[t.p_column]) for r in t(df).collect()}

    for g, (stat_ref, p_ref) in ref.items():
        stat_eng, p_eng = got[g]
        assert abs(stat_eng - stat_ref) < 5e-4, (g, stat_eng, stat_ref)
        assert abs(p_eng - p_ref) < 1e-5, (g, p_eng, p_ref)
