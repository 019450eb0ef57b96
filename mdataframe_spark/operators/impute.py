"""Imputation transformers (reference: mdataframe.py:90-124, F12/F13).

ImputeFixed replaces a sentinel (default NULL) with a constant —
pure `coalesce`/`replace`, codegen'd. ImputeMeanMedian fills with a
per-column statistic computed distributed (mean via avg, median via
exact `percentile` — switch to `percentile_approx` at extreme scale),
then applied as column arithmetic; the stats collect is one scalar per
column, never per row.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..transformer import Transformer


class ImputeFixed(Transformer):
    """Replace a missing-value sentinel with a constant.

    NULL sentinel → fillna; numeric sentinel → replace then fillna
    (mirrors the reference's ImputeFixed(missing_value=np.nan,
    replacement_value=0)).
    """

    def __init__(self, missing_value=None, replacement_value=0, columns: Optional[Sequence[str]] = None):
        super().__init__("ImputeFixed", missing_value, replacement_value)
        self.missing_value = missing_value
        self.replacement_value = replacement_value
        self.columns = list(columns) if columns else None

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.columns or [
            c for c, t in df.dtypes if t in ("double", "float", "bigint", "int", "smallint")
        ]
        if self.missing_value is not None:
            df = df.replace(self.missing_value, None, subset=cols)
        return df.fillna(self.replacement_value, subset=cols)


class ImputeMeanMedian(Transformer):
    """Fill NULLs with the column mean or median (reference
    ImputeMeanMedian wraps sklearn's SimpleImputer; here the statistic
    is one distributed aggregation)."""

    def __init__(self, strategy: str = "mean", columns: Optional[Sequence[str]] = None):
        if strategy not in ("mean", "median"):
            raise ValueError(f"strategy must be mean or median, got {strategy!r}")
        super().__init__("ImputeMeanMedian", strategy)
        self.strategy = strategy
        self.columns = list(columns) if columns else None

    def _transform(self, df: DataFrame) -> DataFrame:
        cols = self.columns or [
            c for c, t in df.dtypes if t in ("double", "float", "bigint", "int")
        ]
        if self.strategy == "mean":
            aggs = [F.avg(c).alias(c) for c in cols]
        else:
            aggs = [F.expr(f"percentile(`{c}`, 0.5)").alias(c) for c in cols]
        stats = df.agg(*aggs).collect()[0]
        return df.fillna({c: float(stats[c]) for c in cols if stats[c] is not None})
