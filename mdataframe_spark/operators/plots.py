"""Plot sinks (reference: mdataframe.py:975-1248, plots.py:14-542, S8).

The reference renders heatmaps (simple / single / multi-page PDF) and
2-D scatters with matplotlib, capping at 60,000 pixels per dimension
(mdataframe.py:1128-1135) and paginating beyond that. The engine split:

- **data plane (Spark, scalable)**: select/top-N/sample/paginate the
  rows to plot — ``heatmap_data`` ranks rows by variance and pages them
  with a row_number window; ``scatter_data`` deterministically samples.
  This is the part that must survive 100 TB.
- **render plane (driver, bounded)**: matplotlib when available, with a
  built-in SVG backend (zero dependencies) as the always-available
  path — pass an ``.svg`` filename to use it explicitly; non-SVG
  filenames without matplotlib raise a clear error. ``label_fn``
  (C10, the reference's label-transform callable) rewrites display
  labels in either backend.
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


def render_heatmap(pages, filename: str, cmap: str = "coolwarm",
                   label_fn=None):
    """Multi-page heatmap (reference plots.py:130-300 shape).

    ``.svg`` filenames use the built-in SVG backend (page ``i`` of a
    multi-page result is written to ``stem_p{i}.svg``); other
    extensions render a multi-page PDF via matplotlib. ``label_fn``
    transforms the row labels for display (C10)."""
    if filename.endswith(".svg"):
        return render_heatmap_svg(pages, filename, cmap=cmap, label_fn=label_fn)
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
            labels = page.iloc[:, 0]
            if label_fn is not None:
                labels = [label_fn(v) for v in labels]
            ax.set_yticklabels(labels)
            ax.set_xticks(range(vals.shape[1]))
            ax.set_xticklabels(page.columns[1:], rotation=90)
            fig.colorbar(im)
            pdf.savefig(fig)
            plt.close(fig)
    return [filename]


def render_scatter(points, filename: str, x_col: str, y_col: str,
                   label_fn=None):
    """2-D scatter; ``.svg`` filenames use the built-in SVG backend."""
    if filename.endswith(".svg"):
        return render_scatter_svg(points, filename, x_col, y_col)
    plt = _require_matplotlib()
    fig, ax = plt.subplots()
    ax.scatter(points[x_col], points[y_col], s=4, alpha=0.6)
    ax.set_xlabel(x_col)
    ax.set_ylabel(y_col)
    fig.savefig(filename, dpi=150)
    plt.close(fig)
    return [filename]


# ---------------------------------------------------------------------------
# built-in SVG backend (no dependencies)
# ---------------------------------------------------------------------------
def _esc(s) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _coolwarm(t: float) -> str:
    """Diverging blue→white→red map on t ∈ [0, 1] (coolwarm-style
    anchors)."""
    t = min(max(t, 0.0), 1.0)
    lo, mid, hi = (59, 76, 192), (240, 240, 240), (180, 4, 38)
    if t < 0.5:
        a, b, u = lo, mid, t * 2
    else:
        a, b, u = mid, hi, (t - 0.5) * 2
    r, g, bch = (round(a[i] + (b[i] - a[i]) * u) for i in range(3))
    return f"rgb({r},{g},{bch})"


def _gray(t: float) -> str:
    v = round(255 * (1 - min(max(t, 0.0), 1.0)))
    return f"rgb({v},{v},{v})"


_CMAPS = {"coolwarm": _coolwarm, "gray": _gray}


def render_heatmap_svg(pages, filename: str, cmap: str = "coolwarm",
                       label_fn=None, cell_w: int = 18, cell_h: int = 12):
    """Heatmap pages as standalone SVG files — the dependency-free
    render path. Color scale is normalized over EACH page's values
    (matching imshow's per-axes normalization); a vertical colorbar
    with min/max annotations sits to the right. Returns the list of
    files written (one per page; single page keeps ``filename``)."""
    color = _CMAPS.get(cmap, _coolwarm)
    out_files = []
    multi = len(pages) > 1
    for pi, page in enumerate(pages, start=1):
        labels = list(page.iloc[:, 0])
        if label_fn is not None:
            labels = [label_fn(v) for v in labels]
        cols = list(page.columns[1:])
        vals = page.iloc[:, 1:].to_numpy(dtype=float)
        n, k = vals.shape
        vmin = float(vals.min()) if vals.size else 0.0
        vmax = float(vals.max()) if vals.size else 1.0
        span = (vmax - vmin) or 1.0
        left, top = 120, 90
        width = left + k * cell_w + 70
        height = top + n * cell_h + 20
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" font-family="sans-serif" font-size="9">'
        ]
        for j, c in enumerate(cols):
            x = left + j * cell_w + cell_w / 2
            parts.append(
                f'<text x="{x}" y="{top - 6}" text-anchor="start" '
                f'transform="rotate(-60 {x} {top - 6})">{_esc(c)}</text>'
            )
        for i in range(n):
            parts.append(
                f'<text x="{left - 6}" y="{top + i * cell_h + cell_h - 3}" '
                f'text-anchor="end">{_esc(labels[i])}</text>'
            )
            for j in range(k):
                t = (vals[i, j] - vmin) / span
                parts.append(
                    f'<rect x="{left + j * cell_w}" y="{top + i * cell_h}" '
                    f'width="{cell_w}" height="{cell_h}" fill="{color(t)}">'
                    f"<title>{_esc(labels[i])} / {_esc(cols[j])}: "
                    f"{vals[i, j]:g}</title></rect>"
                )
        # colorbar
        cb_x, cb_h = left + k * cell_w + 15, max(n * cell_h, 60)
        steps = 32
        for s in range(steps):
            parts.append(
                f'<rect x="{cb_x}" y="{top + cb_h * s / steps:.1f}" width="12" '
                f'height="{cb_h / steps + 0.5:.1f}" '
                f'fill="{color(1 - s / (steps - 1))}"/>'
            )
        parts.append(
            f'<text x="{cb_x + 16}" y="{top + 8}">{vmax:g}</text>'
            f'<text x="{cb_x + 16}" y="{top + cb_h}">{vmin:g}</text>'
        )
        parts.append("</svg>")
        out = (
            filename if not multi
            else filename[: -len(".svg")] + f"_p{pi}.svg"
        )
        with open(out, "w") as f:
            f.write("".join(parts))
        out_files.append(out)
    return out_files


def render_scatter_svg(points, filename: str, x_col: str, y_col: str,
                       width: int = 640, height: int = 480, r: float = 2.0):
    """2-D scatter as a standalone SVG with axes and tick labels."""
    xs = points[x_col].to_numpy(dtype=float)
    ys = points[y_col].to_numpy(dtype=float)
    left, bottom, top, right = 60, 40, 15, 15
    pw, ph = width - left - right, height - top - bottom
    xmin, xmax = (float(xs.min()), float(xs.max())) if len(xs) else (0, 1)
    ymin, ymax = (float(ys.min()), float(ys.max())) if len(ys) else (0, 1)
    xspan = (xmax - xmin) or 1.0
    yspan = (ymax - ymin) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif" font-size="10">',
        f'<rect x="{left}" y="{top}" width="{pw}" height="{ph}" '
        'fill="none" stroke="black"/>',
    ]
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        xv, yv = xmin + frac * xspan, ymin + frac * yspan
        px = left + frac * pw
        py = top + (1 - frac) * ph
        parts.append(
            f'<text x="{px:.1f}" y="{height - bottom + 14}" '
            f'text-anchor="middle">{xv:g}</text>'
            f'<text x="{left - 6}" y="{py + 3:.1f}" text-anchor="end">{yv:g}</text>'
        )
    for x, y in zip(xs, ys):
        px = left + (x - xmin) / xspan * pw
        py = top + (1 - (y - ymin) / yspan) * ph
        parts.append(
            f'<circle cx="{px:.1f}" cy="{py:.1f}" r="{r}" '
            'fill="steelblue" fill-opacity="0.6"/>'
        )
    parts.append(
        f'<text x="{left + pw / 2}" y="{height - 6}" text-anchor="middle">'
        f"{_esc(x_col)}</text>"
        f'<text x="14" y="{top + ph / 2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {top + ph / 2})">{_esc(y_col)}</text>'
    )
    parts.append("</svg>")
    with open(filename, "w") as f:
        f.write("".join(parts))
    return [filename]
