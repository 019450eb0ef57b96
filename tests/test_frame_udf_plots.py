"""UDF surface (X1/X2), column-axis sort (O3), and plot data plane (S8)."""

import numpy as np
import pytest

from mdataframe_spark import MFrame
from mdataframe_spark.operators.plots import heatmap_data, scatter_data


def test_apply_axis0_column_udf(test_frame):
    mf = MFrame(test_frame, name="counts")
    doubled = mf.apply(lambda s: s * 2.0, axis=0)
    a = {r["__row_id"]: r for r in test_frame.collect()}
    b = {r["__row_id"]: r for r in doubled.df.collect()}
    for g in a:
        assert b[g]["sampleA_1"] == 2.0 * a[g]["sampleA_1"]


def test_apply_axis1_rowwise(test_frame):
    mf = MFrame(test_frame, name="counts")
    out = mf.apply(lambda row: float(row.max() - row.min()), axis=1, result_name="rng")
    rows = {r["__row_id"]: r["rng"] for r in out.df.collect()}
    assert rows["genA"] == 23 - 2
    assert rows["genD"] == 90 - 40


def test_apply_frame_escape_hatch(test_frame):
    mf = MFrame(test_frame, name="counts")
    out = mf.apply_frame(lambda pdf: pdf.assign(total=pdf.iloc[:, 1:].sum(axis=1)))
    rows = {r["__row_id"]: r["total"] for r in out.df.collect()}
    assert rows["genA"] == 23 + 2 + 21 + 23 + 3 + 4


def test_apply_frame_rejects_non_frame(test_frame):
    mf = MFrame(test_frame, name="counts")
    with pytest.raises(ValueError, match="pandas DataFrame"):
        mf.apply_frame(lambda pdf: 42)


def test_sort_columns_by_row(test_frame):
    mf = MFrame(test_frame, name="counts")
    out = mf.sort_columns("genA", ascending=True)
    # genA = [23, 2, 21, 23, 3, 4] -> ascending column order by value
    vals = [2, 3, 4, 21, 23, 23]
    row = out.df.filter("__row_id = 'genA'").collect()[0]
    assert [row[c] for c in out.data_columns] == vals
    with pytest.raises(ValueError, match="not found"):
        mf.sort_columns("nope")


def test_heatmap_pages(test_frame):
    cols = [c for c in test_frame.columns if c != "__row_id"]
    pages = heatmap_data(test_frame, cols, max_rows=3, page_size=2)
    assert [len(p) for p in pages] == [2, 1]
    # ranked by row variance: genD (largest spread) first
    assert pages[0].iloc[0]["__row_id"] == "genD"
    assert set(pages[0].columns) == {"__row_id", *cols}


def test_scatter_sample(spark):
    df = spark.range(1000).selectExpr(
        "cast(id as string) as __row_id", "id * 1.0 as x", "id * 2.0 as y"
    )
    pts = scatter_data(df, "x", "y", max_points=100)
    assert 50 <= len(pts) <= 200  # sampled down
    assert list(pts.columns) == ["__row_id", "x", "y"]


def test_write_tsv_full_output(spark, tmp_path):
    """J4 golden: full_output() matches the reference's
    df.T.join(meta_columns).T.join(meta_rows) shape (mdataframe.py:
    937-944) — data rows with row-meta columns, then one attribute row
    per column-meta key with per-sample values and null row-meta."""
    import csv

    import pandas as pd

    from mdataframe_spark.frame import MFrame

    rows = [("g1", 1.0, 2.0, "x"), ("g2", 3.0, 4.0, "y")]
    df = spark.createDataFrame(rows, ["__row_id", "s1", "s2", "anno"])
    meta = {"s1": {"group": "A", "batch": "b1"}, "s2": {"group": "B", "batch": "b2"}}
    mf = MFrame(df, index_column="__row_id", data_columns=["s1", "s2"],
                column_meta=meta)

    # reference-shape expectation built with the same pandas ops
    pdf = pd.DataFrame({"s1": [1.0, 3.0], "s2": [2.0, 4.0]},
                       index=["g1", "g2"])
    meta_cols = pd.DataFrame(meta).T  # index s1/s2, columns group/batch
    meta_rows = pd.DataFrame({"anno": ["x", "y"]}, index=["g1", "g2"])
    expected = pdf.T.join(meta_cols).T.join(meta_rows)

    # typed access path: schema (incl. numeric data columns) preserved
    assert mf.full_output().schema == df.schema

    out = mf.full_output(include_attributes=True).drop("__is_attr").collect()
    got = {r["__row_id"]: r for r in out}
    assert set(got) == set(expected.index)
    for ridx in expected.index:
        for c in ("s1", "s2", "anno"):
            e = expected.loc[ridx, c]
            g = got[ridx][c]
            if pd.isna(e):
                assert g is None, (ridx, c, g)
            else:
                assert g == str(e), (ridx, c, g, e)

    # the sink writes data rows first, then attribute rows
    mf.write_tsv(str(tmp_path / "full"), single_file=True, full=True)
    part = next((tmp_path / "full").glob("part-*.csv"))
    with open(part) as fh:
        lines = list(csv.reader(fh, delimiter="\t"))
    assert lines[0] == ["__row_id", "s1", "s2", "anno"]
    # data rows in index order, then attribute rows in the column-meta
    # dicts' first-seen insertion order (group before batch — matching
    # the reference's meta_columns column order, not alphabetical)
    assert [l[0] for l in lines[1:]] == ["g1", "g2", "group", "batch"]


def test_from_long_null_semantics_both_paths(spark):
    """Both from_long paths (conditional agg with samples, generic pivot
    without) agree cell-for-cell, including when a group's first long row
    holds a null but a later one doesn't: the cell is the first NON-NULL
    value on either path."""
    long_df = spark.createDataFrame(
        [
            (1, "s1", None), (1, "s1", 7.0),   # null first, value later
            (1, "s2", 3.0),
            (2, "s1", None),                    # all-null group -> null
            (2, "s2", None), (2, "s2", None),
        ],
        ["__row_id", "sample", "value"],
    )
    with_samples = MFrame.from_long(long_df, samples=["s1", "s2"]).df
    generic = MFrame.from_long(long_df).df
    a = {r["__row_id"]: (r["s1"], r["s2"]) for r in with_samples.collect()}
    b = {r["__row_id"]: (r["s1"], r["s2"]) for r in generic.collect()}
    assert a == b == {1: (7.0, 3.0), 2: (None, None)}
