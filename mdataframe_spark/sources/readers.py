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


def _xlsx_col_index(ref: str) -> int:
    """A1-style cell ref -> 0-based column index ('C7' -> 2)."""
    i = 0
    for ch in ref:
        if not ch.isalpha():
            break
        i = i * 26 + (ord(ch.upper()) - ord("A") + 1)
    return i - 1


def read_xlsx_rows(path: str):
    """Minimal OOXML (.xlsx) reader on the standard library only — the
    scan half of the Excel sink pair (write_xlsx_native). Parses
    xl/worksheets/sheet1.xml with ElementTree, honouring cell refs
    (missing cells come back as None), inline strings, shared strings
    (openpyxl-written files), booleans, and numbers (int when the
    stored lexical form has no fraction). Returns (header, rows).

    Excel is a bounded driver-side format here exactly as in the
    writer: this never touches the cluster."""
    import zipfile
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(
                "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"))
                for si in sroot.findall("m:si", ns)]
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))

    def value(c):
        t = c.get("t")
        if t == "inlineStr":
            tx = c.find("m:is/m:t", ns)
            return tx.text if tx is not None and tx.text is not None else ""
        v = c.find("m:v", ns)
        if v is None or v.text is None:
            return None
        if t == "s":
            return shared[int(v.text)]
        if t == "b":
            return v.text == "1"
        if t == "str":
            return v.text
        txt = v.text
        return float(txt) if ("." in txt or "e" in txt.lower()) else int(txt)

    out = []
    for row in root.findall("m:sheetData/m:row", ns):
        cells = {}
        for c in row.findall("m:c", ns):
            cells[_xlsx_col_index(c.get("r", "A"))] = value(c)
        width = max(cells) + 1 if cells else 0
        out.append([cells.get(j) for j in range(width)])
    if not out:
        return [], []
    width = max(len(r) for r in out)
    out = [r + [None] * (width - len(r)) for r in out]
    return [str(h) for h in out[0]], out[1:]


def read_excel(spark: SparkSession, path: str, schema) -> DataFrame:
    """Excel scan -> DataFrame: driver-side stdlib parse + one
    createDataFrame. ``schema`` is required (Excel cells carry no
    column types); header names are matched to the schema's fields and
    reordered if needed."""
    header, rows = read_xlsx_rows(path)
    order = [header.index(f.name) for f in schema.fields]
    data = [tuple(r[j] for j in order) for r in rows]
    return spark.createDataFrame(data, schema)
