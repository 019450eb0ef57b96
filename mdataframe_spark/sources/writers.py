"""Sinks (reference: mdataframe.py:925-973, S6-S7).

TSV/Parquet are distributed writes; ``single_file=True`` coalesces for
one-file parity with the reference's output (use only for bounded
results). Excel is driver-side pandas, bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_tsv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sep: str = "\t",
    single_file: bool = False,
):
    writer = df.coalesce(1) if single_file else df
    writer.write.mode(mode).option("sep", sep).option("header", True).csv(path)


def write_excel(df: DataFrame, path: str, sheet_name: str = "data", max_rows: int = 1_000_000):
    """Excel sink — collects to the driver; guarded by max_rows since
    Excel is inherently a bounded format."""
    import pandas as pd

    limited = df.limit(max_rows + 1).toPandas()
    if len(limited) > max_rows:
        raise ValueError(f"refusing to write >{max_rows} rows to Excel")
    with pd.ExcelWriter(path) as writer:
        limited.to_excel(writer, sheet_name=sheet_name, index=False)
