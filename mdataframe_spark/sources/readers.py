"""Sources (reference: mdataframe.py:211-295 S1-S5, mbf_compliance.py:57-63).

The reference's FromFile reads Excel via pandas and everything else as
TSV; here TSV/CSV go straight to Spark's distributed CSV reader with
schema inference, Excel goes through driver-side pandas (bounded —
Excel files are not a 100 TB format) into a Spark DataFrame via Arrow.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_tsv(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    return (
        spark.read.option("sep", sep)
        .option("header", header)
        .option("inferSchema", infer_schema)
        .csv(path)
    )


def read_table_file(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Extension-dispatched tabular read (reference FromFile.parse:
    .xls/.xlsx via pandas, else TSV — mbf_compliance.py:57-63)."""
    lower = path.lower()
    if lower.endswith((".xls", ".xlsx")):
        import pandas as pd

        return spark.createDataFrame(pd.read_excel(path, **kwargs))
    return read_tsv(spark, path, **kwargs)


def from_pandas(
    spark: SparkSession,
    pdf,
    index_column: str = "__row_id",
) -> DataFrame:
    """In-memory ingest (S1) keeping the pandas index as the engine's
    explicit row-id column (reference MDF keeps the index as identity)."""
    pdf = pdf.copy()
    if index_column not in pdf.columns:
        pdf.insert(0, index_column, pdf.index.astype(str))
    return spark.createDataFrame(pdf.reset_index(drop=True))


def annotate_from_file(
    df: DataFrame,
    table: DataFrame,
    key: str,
    columns: Sequence[str],
    fill_value=None,
    df_key: Optional[str] = None,
) -> DataFrame:
    """Annotation join (J1; reference mbf_compliance.py:69-91): left-join
    selected columns of an external table, filling missing with
    ``fill_value``. The annotation side is broadcast — it is a dimension
    table by construction."""
    df_key = df_key or key
    sel = table.select(F.col(key).alias(df_key), *columns)
    out = df.join(F.broadcast(sel), df_key, "left")
    if fill_value is not None:
        out = out.fillna({c: fill_value for c in columns})
    return out


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    multiline: bool = False,
) -> DataFrame:
    """Newline-delimited JSON ingest — the lingua franca of LLM training
    corpora (one document object per line).

    With an explicit ``schema`` the reader skips the inference pass
    (one full scan saved — at 100 TB schema inference is a job, not a
    convenience) and unknown keys are preserved in
    ``_corrupt_record``-free mode by simply not being selected. JSONL
    splits by line, so the scan parallelizes like CSV; multiline JSON
    (one array per file) does not split and is only for small side
    inputs.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", multiline).json(path)


def read_orc(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """ORC ingest. Column pruning and predicate pushdown reach the ORC
    stripe/row-group level exactly as with parquet (asserted by
    tests/test_operators.py::test_orc_roundtrip_pushdown), so filters
    compiled from the DSL skip non-matching stripes at any scale."""
    return spark.read.option("mergeSchema", merge_schema).orc(path)
