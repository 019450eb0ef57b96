"""Clustering transformers (reference: clustering.py:9-60,
strategies.py:136-333, M7/M8/M10/M11/M15).

API parity with the reference's ``Cluster`` protocol: construct with
model kwargs, call with ``(df, sort=, ascending=, add=)``, get the
label column named after the transformer appended to the frame.

Spark mapping:
- KMeans / BisectingKMeans: ``pyspark.ml`` on an assembled feature
  vector — fully distributed fit + predict (M7). BisectingKMeans is
  the scale answer to hierarchical clustering (divisive, distributed).
- Agglo: true agglomerative (Ward linkage, Lance-Williams update)
  implemented in numpy on DRIVER-collected features — the algorithm is
  inherently O(n²); a hard ``max_rows`` guard makes the non-scalability
  explicit (reference uses sklearn in-memory anyway, M8).
- ClassLabel: labels from a provided dict — a broadcast map join (M11).
- fitted models expose ``.predict(new_df)`` (M15).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..transformer import Transformer

_VEC_COL = "__features"


def _assemble(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(cols), outputCol=_VEC_COL).transform(df)


class Cluster(Transformer):
    """Base: fit on the numeric columns, append the label column."""

    def __init__(self, name: str, column_name: Optional[str] = None,
                 index_column: str = "__row_id", **kwargs):
        super().__init__(name, **kwargs)
        self.new_column = column_name if column_name is not None else name
        self.index_column = index_column
        self.model_kwargs = kwargs
        self.model = None  # set after fit

    def _feature_cols(self, df: DataFrame) -> list:
        return [
            c for c, t in df.dtypes
            if c != self.index_column and t in ("double", "float", "bigint", "int", "smallint")
        ]

    def _fit_predict(self, df: DataFrame, cols: Sequence[str]) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame, sort: bool = True, ascending: bool = True,
                 add: bool = True, **kwargs) -> DataFrame:
        if not isinstance(df, DataFrame):
            raise ValueError(
                f"Transformer calls need a DataFrame as first parameter, was {type(df)}."
            )
        cols = self._feature_cols(df)
        labeled = self._fit_predict(df, cols)
        if sort:
            labeled = labeled.orderBy(
                F.col(self.new_column).asc() if ascending else F.col(self.new_column).desc()
            )
        if not add:
            labeled = labeled.drop(self.new_column)
        return labeled


class KMeans(Cluster):
    """Distributed k-means via Spark ML (reference: strategies.py:136-184)."""

    def __init__(self, name: str = "KMeans", n_clusters: int = 2, seed: int = 42,
                 column_name: Optional[str] = None, index_column: str = "__row_id", **kwargs):
        super().__init__(name, column_name, index_column,
                         n_clusters=n_clusters, seed=seed, **kwargs)
        self.n_clusters = n_clusters
        self.seed = seed

    def _fit_predict(self, df: DataFrame, cols):
        from pyspark.ml.clustering import KMeans as MLKMeans

        assembled = _assemble(df, cols)
        self.model = MLKMeans(
            k=self.n_clusters, seed=self.seed, featuresCol=_VEC_COL,
            predictionCol=self.new_column
        ).fit(assembled)
        return self.model.transform(assembled).drop(_VEC_COL)

    def predict(self, df: DataFrame) -> DataFrame:
        """Apply the fitted model to new data (M15)."""
        if self.model is None:
            raise RuntimeError("call the transformer on a frame before predict()")
        cols = self._feature_cols(df)
        return self.model.transform(_assemble(df, cols)).drop(_VEC_COL)


class BisectingKMeans(Cluster):
    """Divisive hierarchical clustering — the distributed analog of
    agglomerative clustering (SURVEY.md M8 scale path)."""

    def __init__(self, name: str = "BisectingKMeans", n_clusters: int = 2, seed: int = 42,
                 column_name: Optional[str] = None, index_column: str = "__row_id", **kwargs):
        super().__init__(name, column_name, index_column,
                         n_clusters=n_clusters, seed=seed, **kwargs)
        self.n_clusters = n_clusters
        self.seed = seed

    def _fit_predict(self, df: DataFrame, cols):
        from pyspark.ml.clustering import BisectingKMeans as MLBKM

        assembled = _assemble(df, cols)
        self.model = MLBKM(
            k=self.n_clusters, seed=self.seed, featuresCol=_VEC_COL,
            predictionCol=self.new_column
        ).fit(assembled)
        return self.model.transform(assembled).drop(_VEC_COL)


class Agglo(Cluster):
    """Agglomerative clustering, Ward linkage (reference: clustering.py:46-52).

    Inherently O(n²): features are collected to the driver under a hard
    ``max_rows`` guard (the explicit non-scalable escape hatch; use
    BisectingKMeans beyond it). Labels are assigned in first-appearance
    order, so they are deterministic given row order by index.
    """

    def __init__(self, name: str = "Agglo", n_clusters: int = 2,
                 column_name: Optional[str] = None, index_column: str = "__row_id",
                 max_rows: int = 20000, **kwargs):
        super().__init__(name, column_name, index_column, n_clusters=n_clusters, **kwargs)
        self.n_clusters = n_clusters
        self.max_rows = max_rows

    def _fit_predict(self, df: DataFrame, cols):
        import numpy as np

        rows = df.select(self.index_column, *cols).orderBy(self.index_column).collect()
        if len(rows) > self.max_rows:
            raise ValueError(
                f"Agglo is O(n^2) and capped at {self.max_rows} rows "
                f"(got {len(rows)}); use BisectingKMeans at scale."
            )
        ids = [r[self.index_column] for r in rows]
        x = np.array([[r[c] for c in cols] for r in rows], dtype=float)
        labels = _ward_labels(x, self.n_clusters)
        spark = df.sparkSession
        label_df = spark.createDataFrame(
            list(zip(ids, [int(v) for v in labels])),
            [self.index_column, self.new_column],
        )
        return df.join(F.broadcast(label_df), self.index_column)


def _ward_merge_sequence(x):
    """Full Ward agglomeration via the Lance-Williams update, recording
    every merge. Returns (merges, members_at) where merges is a list of
    (slot_i, slot_j, cost_ij, new_size) in merge order — the raw
    material for both label cuts and the scipy-format linkage matrix
    (M9). Deterministic: ties break by smallest (i, j) slot pair."""
    import numpy as np

    n = len(x)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    # Ward objective uses squared distances scaled by cluster sizes
    size = np.ones(n)
    active = list(range(n))
    members = {i: [i] for i in range(n)}
    cost = d2 / 2.0  # initial Ward cost between singletons
    merges = []
    while len(active) > 1:
        sub = np.ix_(active, active)
        flat = cost[sub]
        i_loc, j_loc = np.unravel_index(np.argmin(flat), flat.shape)
        i, j = active[i_loc], active[j_loc]
        if i > j:
            i, j = j, i
        merge_cost = cost[i, j]
        # Lance-Williams for Ward: d(k, i∪j)
        for k in active:
            if k in (i, j):
                continue
            si, sj, sk = size[i], size[j], size[k]
            tot = si + sj + sk
            cost[i, k] = cost[k, i] = (
                (si + sk) / tot * cost[i, k]
                + (sj + sk) / tot * cost[j, k]
                - sk / tot * cost[i, j]
            )
        members[i] = members[i] + members[j]
        size[i] += size[j]
        active.remove(j)
        merges.append((i, j, float(merge_cost), int(size[i])))
    return merges, members


def _ward_labels(x, n_clusters: int):
    """Ward-linkage cluster labels: cut the merge sequence at
    ``n_clusters`` (replay all but the last n_clusters-1 merges)."""
    n = len(x)
    if n <= n_clusters:
        return list(range(n))
    merges, _ = _ward_merge_sequence(x)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j, _cost, _sz in merges[: n - n_clusters]:
        parent[find(j)] = find(i)
    roots = {}
    labels = [0] * n
    # first-appearance order: cluster containing the smallest row index
    # gets label 0, etc. — deterministic
    for m in range(n):
        r = find(m)
        if r not in roots:
            roots[r] = len(roots)
        labels[m] = roots[r]
    return labels


def ward_linkage(x):
    """scipy-format Ward linkage matrix (M9, reference
    strategies.py:450-486 feeds scipy linkage into dendrogram-ordered
    heatmaps).

    Returns an (n-1, 4) float array: row t = [id_a, id_b, dist, size]
    where ids < n are leaves, id n+t is the cluster formed at step t,
    and dist = sqrt(2 x Ward merge cost) — the same height scale as
    ``scipy.cluster.hierarchy.linkage(x, method='ward')`` (for
    singletons it equals the euclidean distance). id_a < id_b.
    """
    import numpy as np

    n = len(x)
    if n < 2:
        return np.zeros((0, 4))
    merges, _ = _ward_merge_sequence(x)
    slot_id = list(range(n))  # current linkage id held by each slot
    Z = np.empty((n - 1, 4))
    for t, (i, j, cost, new_size) in enumerate(merges):
        a, b = slot_id[i], slot_id[j]
        if a > b:
            a, b = b, a
        Z[t] = (a, b, np.sqrt(max(2.0 * cost, 0.0)), new_size)
        slot_id[i] = n + t
    return Z


def dendrogram_leaf_order(Z):
    """Left-to-right leaf ordering of the linkage tree — the row order
    scipy's dendrogram would draw (no optimal-ordering pass)."""
    n = len(Z) + 1
    if n == 1:
        return [0]
    order = []
    stack = [2 * n - 2]
    while stack:
        node = stack.pop()
        if node < n:
            order.append(node)
            continue
        a, b = int(Z[node - n][0]), int(Z[node - n][1])
        stack.append(b)
        stack.append(a)  # a pops first: left-to-right
    return order


def ward_dendrogram(
    df: DataFrame,
    value_cols,
    index_column: str = "__row_id",
    max_rows: int = 20000,
):
    """Linkage matrix + dendrogram-ordered row ids for a frame.

    Driver-collected under the same O(n²) cap as Agglo (the explicit
    escape hatch; dendrograms above the cap are not meaningful to draw
    anyway). Returns (Z, ordered_ids): Z is the scipy-format linkage
    matrix, ordered_ids the index values in leaf order — feed to
    plots.heatmap_data(rank_by="dendrogram") for the reference's
    clustered-heatmap row ordering (strategies.py:450-486)."""
    import numpy as np

    rows = df.select(index_column, *value_cols).orderBy(index_column).collect()
    if not rows:
        return np.zeros((0, 4)), []
    if len(rows) > max_rows:
        raise ValueError(
            f"ward_dendrogram is O(n^2) and capped at {max_rows} rows "
            f"(got {len(rows)})"
        )
    ids = [r[index_column] for r in rows]
    x = np.array([[r[c] for c in value_cols] for r in rows], dtype=float)
    Z = ward_linkage(x)
    return Z, [ids[i] for i in dendrogram_leaf_order(Z)]


class DBSCAN(Cluster):
    """Density-based clustering (reference: strategies.py:214-281, M10).

    Exact DBSCAN on driver-collected features under a row cap (the
    reference wraps sklearn in-memory too). Noise points get label -1,
    clusters are numbered in first-appearance order (deterministic).
    The scale path for density clustering is LSH-bucketed local DBSCAN;
    out of scope until a corpus needs it.
    """

    def __init__(self, name: str = "DBSCAN", eps: float = 0.5, min_samples: int = 5,
                 column_name: Optional[str] = None, index_column: str = "__row_id",
                 max_rows: int = 50000, **kwargs):
        super().__init__(name, column_name, index_column,
                         eps=eps, min_samples=min_samples, **kwargs)
        self.eps = eps
        self.min_samples = min_samples
        self.max_rows = max_rows

    def _fit_predict(self, df: DataFrame, cols):
        import numpy as np

        rows = df.select(self.index_column, *cols).orderBy(self.index_column).collect()
        if len(rows) > self.max_rows:
            raise ValueError(
                f"DBSCAN is O(n^2) here and capped at {self.max_rows} rows "
                f"(got {len(rows)})."
            )
        ids = [r[self.index_column] for r in rows]
        x = np.array([[r[c] for c in cols] for r in rows], dtype=float)
        labels = _dbscan_labels(x, self.eps, self.min_samples)
        label_df = df.sparkSession.createDataFrame(
            list(zip(ids, [int(v) for v in labels])), [self.index_column, self.new_column]
        )
        return df.join(F.broadcast(label_df), self.index_column)


def _dbscan_labels(x, eps: float, min_samples: int):
    """Classic DBSCAN: BFS over the eps-neighborhood graph from cores."""
    import numpy as np

    n = len(x)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    neigh = d2 <= eps * eps
    n_neigh = neigh.sum(axis=1)  # includes self
    core = n_neigh >= min_samples
    labels = np.full(n, -1)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # grow a new cluster from this unvisited core point
        stack = [i]
        labels[i] = cluster
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(neigh[p])[0]:
                if labels[q] == -1:
                    labels[q] = cluster
                    stack.append(q)
        cluster += 1
    return labels


class ClassLabel(Cluster):
    """Pseudo-clustering: labels from a provided mapping (reference:
    strategies.py:187-211) — a broadcast map join on the row id."""

    def __init__(self, labels: Dict, name: str = "ClassLabel",
                 column_name: Optional[str] = None, index_column: str = "__row_id",
                 fill_value: int = -1):
        super().__init__(name, column_name, index_column, labels=sorted(labels.items()))
        self.labels = dict(labels)
        self.fill_value = fill_value

    def _fit_predict(self, df: DataFrame, cols):
        spark = df.sparkSession
        label_df = spark.createDataFrame(
            list(self.labels.items()), [self.index_column, self.new_column]
        )
        return df.join(F.broadcast(label_df), self.index_column, "left").fillna(
            {self.new_column: self.fill_value}
        )
