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
    Excel is inherently a bounded format (reference writes via pandas
    ExcelWriter, mdataframe.py:925-973).

    Uses pandas/openpyxl when available; otherwise falls back to the
    built-in minimal OOXML writer (:func:`write_xlsx_native`) — same
    file format, zero extra dependencies."""
    limited = df.limit(max_rows + 1).toPandas()
    if len(limited) > max_rows:
        raise ValueError(f"refusing to write >{max_rows} rows to Excel")
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        with pd.ExcelWriter(path) as writer:
            limited.to_excel(writer, sheet_name=sheet_name, index=False)
    except ImportError:
        write_xlsx_native(limited, path, sheet_name=sheet_name)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _col_ref(i: int) -> str:
    """0-based column index -> A1-style column letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def write_xlsx_native(pdf, path: str, sheet_name: str = "data") -> None:
    """Minimal OOXML (.xlsx) writer on the standard library only.

    An xlsx file is a zip of XML parts; this emits the four mandatory
    parts plus one worksheet. Strings are written as inline strings
    (``t="inlineStr"``) so no sharedStrings table is needed; numbers
    and booleans use native cell types; None/NaN become empty cells.
    Verified by round-trip XML parse in tests (no Excel library in the
    container to read it back, so the test unzips and walks the sheet
    XML directly)."""
    import math
    import zipfile

    cols = list(pdf.columns)

    def cell(ref, v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{_xml_escape(str(v))}</t></is></c>"
        )

    rows_xml = []
    header = "".join(cell(f"{_col_ref(j)}1", c) for j, c in enumerate(cols))
    rows_xml.append(f'<row r="1">{header}</row>')
    for i, (_, row) in enumerate(pdf.iterrows(), start=2):
        body = "".join(
            cell(f"{_col_ref(j)}{i}", row[c]) for j, c in enumerate(cols)
        )
        rows_xml.append(f'<row r="{i}">{body}</row>')

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(rows_xml)
        + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        f'<sheet name="{_xml_escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by=None,
):
    """Newline-delimited JSON sink (one object per row/line). With
    ``compression='gzip'`` each task writes an independently-splittable
    .json.gz part file; ``partition_by`` lays out hive-style dirs so
    downstream scans prune partitions."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(
            *(partition_by if isinstance(partition_by, (list, tuple)) else [partition_by])
        )
    w.json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols,
    n_buckets: int = 32,
    sort_cols=None,
    mode: str = "overwrite",
    format: str = "parquet",
):
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles the data ON WRITE: two tables bucketed the
    same way on the join key equi-join WITHOUT any Exchange at read
    time (verified by tests/test_sources_bucketed.py asserting the
    physical plan is exchange-free) — the standard way to amortize the
    shuffle of a 100 TB fact table across every downstream join.
    ``sort_cols`` additionally sorts within buckets so merge joins skip
    their sort.
    """
    bucket_cols = list(bucket_cols) if isinstance(bucket_cols, (list, tuple)) else [bucket_cols]
    w = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = list(sort_cols) if isinstance(sort_cols, (list, tuple)) else [sort_cols]
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    partition_by=None,
):
    """ORC sink (columnar, predicate-pushdown-capable like parquet —
    the interchange format for Hive/Trino-centric lakes). zstd default;
    ``partition_by`` lays out hive-style dirs for partition pruning.
    ORC is built into Spark, so this sink has no extra dependency."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(
            *(partition_by if isinstance(partition_by, (list, tuple)) else [partition_by])
        )
    w.orc(path)
