"""Scaling transformers (reference: mdataframe.py:127-157, C1/C2).

ZScaler standardizes each ROW across the sample columns (the
reference's double-transpose trick, mdataframe.py:156) — here pure
horizontal arithmetic, no transpose, no shuffle. ColumnScaler
standardizes each COLUMN (the sklearn StandardScaler default used by
``.scale()``, mdataframe.py:760-763) — per-column stats via one
aggregation, then column arithmetic.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.norm import zscore_rows
from ..transformer import Transformer


class ZScaler(Transformer):
    """Row-standardize: (x - row_mean) / row_std(ddof=1); constant rows → 0."""

    def __init__(self, columns: Optional[Sequence[str]] = None, index_column: str = "__row_id"):
        super().__init__("ZScaler", columns)
        self.columns = list(columns) if columns else None
        self.index_column = index_column

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.columns or [c for c in df.columns if c != self.index_column]
        return zscore_rows(df, cols)


class ColumnScaler(Transformer):
    """Column-standardize: (x - col_mean) / col_std.

    ddof=0 by default to match sklearn's StandardScaler (the
    reference's `.scale()` default); pass ddof=1 for sample std.
    """

    def __init__(
        self,
        columns: Optional[Sequence[str]] = None,
        ddof: int = 0,
        index_column: str = "__row_id",
    ):
        super().__init__("ColumnScaler", columns, ddof)
        self.columns = list(columns) if columns else None
        self.ddof = ddof
        self.index_column = index_column

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.columns or [c for c in df.columns if c != self.index_column]
        std_fn = F.stddev_samp if self.ddof == 1 else F.stddev_pop
        aggs = [F.avg(c).alias(f"m_{c}") for c in cols] + [
            std_fn(c).alias(f"s_{c}") for c in cols
        ]
        stats = df.agg(*aggs).collect()[0]
        out = {}
        for c in cols:
            m, s = float(stats[f"m_{c}"]), float(stats[f"s_{c}"])
            out[c] = (F.col(c) - F.lit(m)) / F.lit(s) if s > 0 else F.lit(0.0)
        return df.withColumns(out)
