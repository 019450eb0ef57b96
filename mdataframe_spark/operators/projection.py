"""Dimensionality reduction (reference: projection.py:9-99, M12-M14).

PCA runs on Spark ML (distributed covariance/SVD) and reproduces the
reference's output-column contract ``"PC{i} (expl.var = X.X%)"``
(projection.py:63-68). t-SNE and UMAP are inherently single-node
algorithms (the reference fits them via sklearn/umap-learn in memory,
projection.py:71-99, with the ``"{name} dim {i}"`` column contract,
projection.py:40-41). Here both follow the capped driver-side shape
(collect ≤ max_rows, fit in numpy, broadcast-join the embedding back
on the row id):

- ``TSNE`` prefers sklearn when installed; otherwise it runs the
  built-in EXACT t-SNE (van der Maaten & Hinton, JMLR 2008 —
  perplexity-calibrated Gaussian affinities, early exaggeration,
  adaptive-gain gradient descent) with a deterministic PCA
  initialization, so results are reproducible with no RNG.
- ``UMAP`` prefers umap-learn when installed; otherwise it runs the
  built-in NATIVE UMAP (McInnes et al. 2018): fuzzy simplicial set
  over the kNN graph (smooth-kNN-distance calibration, probabilistic
  t-conorm symmetrization), Laplacian-eigenmap spectral initial
  layout, and the cross-entropy optimization as negative-sampling SGD
  with umap-learn's per-edge epoch schedule — fully deterministic
  (seeded generator, fixed edge order, sequential scatter-adds).
  ``method_`` reports which path ran.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame

from ..transformer import Transformer

_VEC_COL = "__features"


class PCA(Transformer):
    """Distributed PCA with the reference's column-naming contract."""

    def __init__(self, name: str = "PCA", n_components: int = 2,
                 index_column: str = "__row_id", **kwargs):
        super().__init__(name, n_components=n_components, **kwargs)
        self.n_components = n_components
        self.index_column = index_column
        self.model = None
        self.explained_variance_ratio_ = None

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import PCA as MLPCA, VectorAssembler
        from pyspark.ml.functions import vector_to_array
        from pyspark.sql import functions as F

        cols = [
            c for c, t in df.dtypes
            if c != self.index_column and t in ("double", "float", "bigint", "int")
        ]
        assembled = VectorAssembler(inputCols=cols, outputCol=_VEC_COL).transform(df)
        self.model = MLPCA(
            k=self.n_components, inputCol=_VEC_COL, outputCol="__pca"
        ).fit(assembled)
        self.explained_variance_ratio_ = list(self.model.explainedVariance)
        new_cols = [
            f"PC{i + 1} (expl.var = {100 * self.explained_variance_ratio_[i]:1.1f}%)"
            for i in range(self.n_components)
        ]
        out = self.model.transform(assembled).withColumn("__arr", vector_to_array("__pca"))
        for i, nc in enumerate(new_cols):
            out = out.withColumn(nc, F.col("__arr")[i])
        return out.drop(_VEC_COL, "__pca", "__arr", *cols)


def _pca_project(x: np.ndarray, k: int) -> np.ndarray:
    """Deterministic PCA projection (top-k eigenvectors of the sample
    covariance, sign-canonicalized: largest-|loading| positive)."""
    xc = x - x.mean(axis=0, keepdims=True)
    cov = xc.T @ xc / max(len(x) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    v = vecs[:, order]
    for i in range(v.shape[1]):
        j = int(np.argmax(np.abs(v[:, i])))
        if v[j, i] < 0:
            v[:, i] = -v[:, i]
    return xc @ v


def tsne_exact(
    x: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 500,
    learning_rate: float = 200.0,
) -> np.ndarray:
    """Exact t-SNE (van der Maaten & Hinton, JMLR 2008): O(n²) affinity
    matrix, perplexity via per-point binary search on the Gaussian
    bandwidth, early exaggeration (×12, first half of the schedule),
    momentum 0.5→0.8, adaptive per-parameter gains. Initialization is
    the PCA projection scaled to std 1e-4 — fully deterministic, no RNG
    anywhere."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 3:
        return np.zeros((n, n_components))
    perplexity = min(perplexity, max((n - 1) / 3.0, 1.0))

    d2 = np.square(x[:, None, :] - x[None, :, :]).sum(axis=-1)
    np.fill_diagonal(d2, np.inf)
    log_u = np.log(perplexity)
    p = np.zeros((n, n))
    for i in range(n):
        beta, blo, bhi = 1.0, 0.0, np.inf
        di = d2[i]
        for _ in range(60):
            w = np.exp(-di * beta)
            s = w.sum()
            if s <= 0:
                h = 0.0
                pi = np.zeros_like(w)
            else:
                pi = w / s
                h = beta * (di[np.isfinite(di)] * pi[np.isfinite(di)]).sum() + np.log(s)
            if abs(h - log_u) < 1e-6:
                break
            if h > log_u:
                blo = beta
                beta = beta * 2 if not np.isfinite(bhi) else (beta + bhi) / 2
            else:
                bhi = beta
                beta = (beta + blo) / 2
        p[i] = pi
    p = (p + p.T) / (2.0 * n)
    p = np.maximum(p, 1e-12)

    y = _pca_project(x, n_components)
    std = y.std(axis=0).max()
    y = y / (std if std > 0 else 1.0) * 1e-4
    vel = np.zeros_like(y)
    gains = np.ones_like(y)
    exag_until = n_iter // 2
    for it in range(n_iter):
        pp = p * 12.0 if it < exag_until else p
        yd2 = np.square(y[:, None, :] - y[None, :, :]).sum(axis=-1)
        num = 1.0 / (1.0 + yd2)
        np.fill_diagonal(num, 0.0)
        q = np.maximum(num / num.sum(), 1e-12)
        pq = (pp - q) * num
        grad = 4.0 * ((np.diag(pq.sum(axis=1)) - pq) @ y)
        mom = 0.5 if it < 250 else 0.8
        inc = np.sign(grad) != np.sign(vel)
        gains = np.clip(np.where(inc, gains + 0.2, gains * 0.8), 0.01, None)
        vel = mom * vel - learning_rate * gains * grad
        y = y + vel
        y = y - y.mean(axis=0, keepdims=True)
    return y


def _pairwise_d2(x: np.ndarray) -> np.ndarray:
    """Dense squared-distance matrix with +inf diagonal (the shared
    O(n²) input of the driver-capped embedding algorithms — computed
    once per fit, not once per consumer)."""
    d2 = np.square(x[:, None, :] - x[None, :, :]).sum(axis=-1)
    np.fill_diagonal(d2, np.inf)
    return d2


def spectral_embed(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    d2: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Laplacian-eigenmap embedding of the symmetrized kNN graph
    (Belkin & Niyogi 2003): heat-kernel weights with per-point
    bandwidth = the kth-NN distance, normalized Laplacian, bottom
    non-trivial eigenvectors. Deterministic (dense eigh,
    sign-canonicalized). Pass a precomputed ``d2`` (inf diagonal) to
    share the O(n²) distance matrix with other consumers."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 3:
        return np.zeros((n, n_components))
    k = min(n_neighbors, n - 1)
    if d2 is None:
        d2 = _pairwise_d2(x)
    knn_idx = np.argsort(d2, axis=1)[:, :k]
    sigma2 = np.maximum(
        d2[np.arange(n), knn_idx[:, -1]], 1e-12
    )
    w = np.zeros((n, n))
    rows = np.repeat(np.arange(n), k)
    cols = knn_idx.ravel()
    w[rows, cols] = np.exp(-d2[rows, cols] / sigma2[rows])
    w = np.maximum(w, w.T)
    deg = np.maximum(w.sum(axis=1), 1e-12)
    dinv = 1.0 / np.sqrt(deg)
    lap = np.eye(n) - (dinv[:, None] * w) * dinv[None, :]
    vals, vecs = np.linalg.eigh(lap)
    order = np.argsort(vals)
    emb = vecs[:, order[1 : n_components + 1]] * dinv[:, None]
    for i in range(emb.shape[1]):
        j = int(np.argmax(np.abs(emb[:, i])))
        if emb[j, i] < 0:
            emb[:, i] = -emb[:, i]
    return emb


def _umap_fit_ab(min_dist: float = 0.1, spread: float = 1.0):
    """Fit the UMAP low-dimensional similarity curve 1/(1 + a·d^{2b})
    to the target offset-exponential psi(d) = 1 (d ≤ min_dist) else
    exp(-(d - min_dist)/spread) — the same least-squares fit
    umap-learn performs with scipy.curve_fit (McInnes et al. 2018,
    §3.2), done here as a damped Gauss-Newton in numpy (deterministic,
    no scipy dependency). Defaults converge to (a≈1.577, b≈0.895)."""
    xv = np.linspace(1e-3, 3.0 * spread, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))
    a, b = 1.0, 1.0
    lx = np.log(xv)
    prev = np.inf
    for _ in range(100):
        da = xv ** (2.0 * b)
        f = 1.0 / (1.0 + a * da)
        r = yv - f
        sse = float(r @ r)
        if abs(prev - sse) < 1e-14:
            break
        prev = sse
        j_a = -da * f * f
        j_b = -2.0 * a * da * lx * f * f
        jac = np.stack([j_a, j_b], axis=1)
        step, *_ = np.linalg.lstsq(jac, r, rcond=None)
        # damped update: halve until the residual does not increase
        lam = 1.0
        for _ in range(30):
            na, nb = a + lam * step[0], b + lam * step[1]
            if nb > 0:
                nf = 1.0 / (1.0 + na * xv ** (2.0 * nb))
                if float((yv - nf) @ (yv - nf)) <= sse:
                    a, b = na, nb
                    break
            lam *= 0.5
        else:
            break
    return float(a), float(b)


def _umap_fuzzy_graph(
    x: np.ndarray, n_neighbors: int, d2: Optional[np.ndarray] = None
):
    """UMAP's fuzzy simplicial set over the kNN graph (McInnes et al.
    2018 §3.1): per-point connectivity offset rho_i = nearest-neighbor
    distance, bandwidth sigma_i calibrated by binary search so the
    smoothed neighborhood cardinality is log2(k), then the directed
    memberships are symmetrized with the probabilistic t-conorm
    W + Wᵀ - W∘Wᵀ. Returns the dense symmetric weight matrix (the
    driver cap bounds n, so dense is fine and deterministic)."""
    n = len(x)
    k = min(n_neighbors, n - 1)
    if d2 is None:
        d2 = _pairwise_d2(x)
    d = np.sqrt(np.maximum(d2, 0.0))  # inf diagonal survives the sqrt
    knn_idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    knn_d = np.take_along_axis(d, knn_idx, axis=1)
    rho = knn_d[:, 0]
    target = np.log2(k) if k > 1 else 1.0
    sigma = np.ones(n)
    for i in range(n):
        lo, hi, mid = 0.0, np.inf, 1.0
        di = np.maximum(knn_d[i] - rho[i], 0.0)
        for _ in range(64):
            s = np.exp(-di / mid).sum()
            if abs(s - target) < 1e-5:
                break
            if s > target:
                hi = mid
                mid = (lo + hi) / 2.0
            else:
                lo = mid
                mid = mid * 2.0 if not np.isfinite(hi) else (lo + hi) / 2.0
        sigma[i] = max(mid, 1e-10)
    w = np.zeros((n, n))
    rows = np.repeat(np.arange(n), k)
    cols = knn_idx.ravel()
    vals = np.exp(
        -np.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None]
    ).ravel()
    w[rows, cols] = vals
    return w + w.T - w * w.T


def umap_native(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    n_epochs: int = 300,
    n_negative: int = 5,
    seed: int = 0,
) -> np.ndarray:
    """Native UMAP (McInnes, Healy & Melville 2018): fuzzy simplicial
    set over the kNN graph, spectral (Laplacian-eigenmap) initial
    layout, and the cross-entropy layout optimization as negative-
    sampling SGD with umap-learn's edge schedule (an edge of weight w
    is sampled every w_max/w epochs; learning rate anneals linearly).

    Deterministic by construction: seeded numpy Generator for the
    negative samples, fixed edge order, and scatter-adds via
    np.add.at (sequential ufunc semantics) — two runs are bit-equal.
    Batched-per-epoch updates replace umap-learn's asynchronous
    Hogwild loop (a valid gradient scheme; Hogwild is itself an
    approximation and non-deterministic, which the engine refuses)."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    if n < 3:
        return np.zeros((n, n_components))
    a, b = _umap_fit_ab(min_dist)
    d2_shared = _pairwise_d2(x)  # one O(n²) matrix for graph AND init
    w = _umap_fuzzy_graph(x, n_neighbors, d2=d2_shared)

    # directed edge list (i, j, weight); both directions are present
    # after symmetrization. The attractive update moves BOTH endpoints
    # (umap-learn's move_other=True) — with the mirrored edge also
    # firing, each undirected pair attracts twice per co-active epoch,
    # matching umap-learn's symmetric-COO + move_other accounting.
    ei, ej = np.nonzero(w > 0.0)
    ew = w[ei, ej]
    w_max = ew.max()
    epochs_per_sample = w_max / ew
    next_sample = epochs_per_sample.copy()

    y = spectral_embed(x, n_components, n_neighbors, d2=d2_shared)
    scale = np.abs(y).max()
    y = y / (scale if scale > 0 else 1.0) * 10.0

    rng = np.random.default_rng(seed)
    for epoch in range(1, n_epochs + 1):
        alpha = 1.0 * (1.0 - epoch / n_epochs) + 1e-4
        active = next_sample <= epoch
        if active.any():
            ai, aj = ei[active], ej[active]
            diff = y[ai] - y[aj]
            d2 = np.maximum((diff * diff).sum(1), 0.0)
            d2s = np.where(d2 > 0.0, d2, 1.0)  # avoid 0^(b-1) for b<1
            att = np.where(
                d2 > 0.0,
                (-2.0 * a * b * d2s ** (b - 1.0)) / (1.0 + a * d2s ** b),
                0.0,
            )
            g = np.clip(att[:, None] * diff, -4.0, 4.0)
            np.add.at(y, ai, alpha * g)
            np.add.at(y, aj, -alpha * g)
            # negative sampling: repulse each active head from
            # n_negative uniform points. Coincident-but-distinct points
            # (d2 == 0, different index) get the capped 4.0 push
            # (umap-learn's grad_coeff<=0 branch); sampling YOURSELF is
            # skipped entirely (zeroed below), matching umap-learn's
            # `if j == k: continue`.
            neg = rng.integers(0, n, size=(len(ai), n_negative))
            hi = np.repeat(ai, n_negative)
            nj = neg.ravel()
            ndiff = y[hi] - y[nj]
            nd2 = np.maximum((ndiff * ndiff).sum(1), 0.0)
            rep = (2.0 * b) / ((0.001 + nd2) * (1.0 + a * nd2 ** b))
            gn = np.where(
                (nd2 > 0)[:, None],
                np.clip(rep[:, None] * ndiff, -4.0, 4.0),
                4.0,
            )
            gn[hi == nj] = 0.0
            np.add.at(y, hi, alpha * gn)
            next_sample[active] += epochs_per_sample[active]
    return y - y.mean(axis=0, keepdims=True)


class _DriverReducer(Transformer):
    """Shared shape for driver-side embeddings: collect under a cap
    (these algorithms are O(n²) — the reference runs them in-memory
    via sklearn/umap-learn, same bound), fit, broadcast-join the
    embedding back on the row id. Output columns follow the
    reference's ``"{name} dim {i}"`` contract (projection.py:40-41)."""

    def __init__(self, name: str, n_components: int = 2,
                 index_column: str = "__row_id", max_rows: int = 5000, **kwargs):
        super().__init__(name, n_components=n_components, **kwargs)
        self.display_name = name
        self.n_components = n_components
        self.index_column = index_column
        self.max_rows = max_rows
        self.method_: Optional[str] = None

    def _fit_embed(self, x: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def _transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        idx = self.index_column
        cols = [
            c for c, t in df.dtypes
            if c != idx and t in ("double", "float", "bigint", "int")
        ]
        rows = df.select(idx, *cols).limit(self.max_rows + 1).toPandas()
        if len(rows) > self.max_rows:
            raise ValueError(
                f"{self.name}: embedding {len(rows)}+ rows exceeds max_rows="
                f"{self.max_rows}; these algorithms are O(n²) — pre-filter "
                "(top-variance rows) or raise max_rows explicitly."
            )
        emb = self._fit_embed(rows[cols].to_numpy(dtype=float))
        out_cols = [
            f"{self.display_name} dim {i + 1}" for i in range(self.n_components)
        ]
        spark = df.sparkSession
        emb_df = spark.createDataFrame(
            [
                (rows[idx].iloc[i], *[float(v) for v in emb[i]])
                for i in range(len(rows))
            ],
            [idx, *out_cols],
        )
        # match the PCA contract: the reduced components REPLACE the
        # input feature columns (MFrame.reduce derives its new data
        # matrix from the output schema)
        return df.join(F.broadcast(emb_df), idx).drop(*cols)


class TSNE(_DriverReducer):
    """t-SNE (M13): sklearn when available, built-in exact t-SNE
    otherwise (see module docstring)."""

    def __init__(self, name: str = "TSNE", n_components: int = 2, perplexity: float = 30,
                 **kwargs):
        super().__init__(name, n_components=n_components, perplexity=perplexity, **kwargs)
        self.perplexity = perplexity

    def _fit_embed(self, x: np.ndarray) -> np.ndarray:
        try:
            from sklearn.manifold import TSNE as SKTSNE  # noqa: N811

            self.method_ = "sklearn"
            return SKTSNE(
                n_components=self.n_components,
                perplexity=min(self.perplexity, max((len(x) - 1) / 3.0, 1.0)),
                init="pca",
                random_state=0,
            ).fit_transform(x)
        except ImportError:
            self.method_ = "native exact t-SNE"
            return tsne_exact(x, self.n_components, self.perplexity)


class UMAP(_DriverReducer):
    """UMAP (M14): umap-learn when available; otherwise the built-in
    native implementation (fuzzy simplicial set + spectral init +
    deterministic negative-sampling SGD — the full McInnes et al. 2018
    optimization, see :func:`umap_native`), reported via ``method_``.
    Reference surface: projection.py:91-99 (umap-learn wrapper)."""

    def __init__(self, name: str = "UMAP", n_components: int = 2,
                 n_neighbors: int = 15, min_dist: float = 0.1,
                 n_epochs: int = 300, **kwargs):
        super().__init__(name, n_components=n_components, **kwargs)
        self.n_neighbors = n_neighbors
        self.min_dist = min_dist
        self.n_epochs = n_epochs

    def _fit_embed(self, x: np.ndarray) -> np.ndarray:
        try:
            from umap import UMAP as ULUMAP  # noqa: N811

            self.method_ = "umap-learn"
            return ULUMAP(
                n_components=self.n_components,
                n_neighbors=self.n_neighbors,
                random_state=0,
            ).fit_transform(x)
        except ImportError:
            self.method_ = "native umap (fuzzy simplicial SGD)"
            return umap_native(
                x,
                self.n_components,
                self.n_neighbors,
                self.min_dist,
                self.n_epochs,
            )
