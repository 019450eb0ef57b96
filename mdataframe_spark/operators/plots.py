"""Plot sinks (reference: mdataframe.py:975-1248, plots.py:14-542, S8).

The reference renders heatmaps (simple / single / multi-page PDF) and
2-D scatters with matplotlib, capping at 60,000 pixels per dimension
(mdataframe.py:1128-1135) and paginating beyond that. The engine split:

- **data plane (Spark, scalable)**: select/top-N/sample/paginate the
  rows to plot — ``heatmap_data`` ranks rows by variance and pages them
  with a row_number window; ``scatter_data`` deterministically samples.
  This is the part that must survive 100 TB.
- **render plane (driver, bounded)**: matplotlib calls, gated behind an
  import — the library is not in this container, so ``render_heatmap``
  raises a clear error; the data plane is fully tested.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_PIXELS = 60_000  # reference parity: mdataframe.py:1128-1135


def heatmap_data(
    df: DataFrame,
    value_cols: Sequence[str],
    index_column: str = "__row_id",
    max_rows: int = 2_000,
    page_size: Optional[int] = None,
    rank_by: str = "variance",
) -> List["object"]:
    """Prepare heatmap pages: top ``max_rows`` rows (by row variance or
    row mean) or ALL rows in Ward-dendrogram leaf order
    (``rank_by="dendrogram"``, the reference's clustered heatmap,
    strategies.py:450-486), split into pages of ``page_size``
    (reference pagination, mdataframe.py:1123-1139). Returns a list of
    pandas DataFrames — driver-bounded by construction."""
    cols = list(value_cols)
    k = len(cols)
    if rank_by == "dendrogram":
        from .clustering import ward_dendrogram

        # keep max_rows TRUNCATION semantics (matching the other modes):
        # frames above the cap are pre-filtered to the top-variance rows
        # and the dendrogram is drawn over that subset, instead of
        # failing on the O(n^2) guard
        if df.count() > max_rows:
            mean = sum((F.col(c) for c in cols), F.lit(0.0)) / k
            var = sum(((F.col(c) - mean) ** 2 for c in cols), F.lit(0.0)) / k
            w = Window.orderBy(F.col("__metric").desc(), F.col(index_column).asc())
            df = (
                df.withColumn("__metric", var)
                .withColumn("__vrn", F.row_number().over(w))
                .filter(F.col("__vrn") <= max_rows)
                .drop("__metric", "__vrn")
            )
        _Z, ordered = ward_dendrogram(df, cols, index_column, max_rows=max_rows)
        pos = df.sparkSession.createDataFrame(
            [(v, i + 1) for i, v in enumerate(ordered)], [index_column, "__rn"]
        )
        ranked = df.join(F.broadcast(pos), index_column)
    else:
        mean = sum((F.col(c) for c in cols), F.lit(0.0)) / k
        if rank_by == "variance":
            metric = sum(((F.col(c) - mean) ** 2 for c in cols), F.lit(0.0)) / k
        elif rank_by == "mean":
            metric = mean
        else:
            raise ValueError(
                f"rank_by must be variance, mean or dendrogram, got {rank_by!r}"
            )
        w = Window.orderBy(F.col("__metric").desc(), F.col(index_column).asc())
        ranked = (
            df.withColumn("__metric", metric)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_rows)
        )
    if page_size is None:
        page_size = min(max_rows, MAX_PIXELS)
    pages = []
    total = ranked.count()
    for start in range(1, total + 1, page_size):
        page = (
            ranked.filter(
                (F.col("__rn") >= start) & (F.col("__rn") < start + page_size)
            )
            .orderBy("__rn")
            .select(index_column, *cols)
            .toPandas()
        )
        pages.append(page)
    return pages


def scatter_data(
    df: DataFrame,
    x_col: str,
    y_col: str,
    index_column: str = "__row_id",
    max_points: int = 50_000,
    seed: int = 42,
):
    """Prepare a 2-D scatter: deterministic sample down to
    ``max_points`` (reference plots.py scatter sinks)."""
    n = df.count()
    sampled = df
    if n > max_points:
        sampled = df.sample(fraction=max_points / n, seed=seed)
    return sampled.select(index_column, x_col, y_col).toPandas()


def _require_matplotlib():
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot as plt  # noqa: F401

        return plt
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "matplotlib is not available in this environment; the Spark "
            "data plane (heatmap_data/scatter_data) is fully functional — "
            "install matplotlib to render."
        ) from exc


def render_heatmap(pages, filename: str, cmap: str = "coolwarm"):  # pragma: no cover
    """Multi-page heatmap PDF (reference plots.py:130-300 shape)."""
    plt = _require_matplotlib()
    from matplotlib.backends.backend_pdf import PdfPages

    with PdfPages(filename) as pdf:
        for page in pages:
            fig, ax = plt.subplots(
                figsize=(max(4, 0.3 * (len(page.columns) - 1)), max(4, 0.02 * len(page)))
            )
            vals = page.iloc[:, 1:].to_numpy()
            im = ax.imshow(vals, aspect="auto", cmap=cmap)
            ax.set_yticks(range(len(page)))
            ax.set_yticklabels(page.iloc[:, 0])
            ax.set_xticks(range(vals.shape[1]))
            ax.set_xticklabels(page.columns[1:], rotation=90)
            fig.colorbar(im)
            pdf.savefig(fig)
            plt.close(fig)


def render_scatter(points, filename: str, x_col: str, y_col: str):  # pragma: no cover
    plt = _require_matplotlib()
    fig, ax = plt.subplots()
    ax.scatter(points[x_col], points[y_col], s=4, alpha=0.6)
    ax.set_xlabel(x_col)
    ax.set_ylabel(y_col)
    fig.savefig(filename, dpi=150)
    plt.close(fig)
