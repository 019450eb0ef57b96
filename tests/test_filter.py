"""Filter DSL semantics — behavioral parity with the reference's
tests/test_filter.py:23-144 (same fixture, same expected surviving rows)."""

import pytest

from mdataframe_spark import CombinedFilter, Filter


def surviving(df, myfilter):
    out = myfilter(df)
    return sorted(r["__row_id"] for r in out.select("__row_id").collect())


def test_init():
    myfilter = Filter([("log", "|>", 1)])
    assert myfilter.filter_args == [("log", "|>", 1)]
    assert myfilter.name == "Filter"
    assert myfilter.hash  # param hash present


def test_hash_equal_params():
    f1 = Filter([("log", "|>", 1)])
    f2 = Filter([("log", "|>", 1)])
    f3 = Filter([("log", "|>", 2)])
    assert f1.hash == f2.hash
    assert f1.hash != f3.hash


def test_filter_gt(stats_frame):
    assert surviving(stats_frame, Filter([("log", ">", 0.9)])) == ["A", "B"]


def test_filter_geq(stats_frame):
    assert surviving(stats_frame, Filter([("log", ">=", 2)])) == ["A"]


def test_filter_leq(stats_frame):
    assert surviving(stats_frame, Filter([("log", "<=", -1)])) == ["C"]


def test_filter_abs_gt(stats_frame):
    assert surviving(stats_frame, Filter([("log", "|>", 0.9)])) == ["A", "B", "C"]


def test_filter_k_of_n_geq(stats_frame):
    assert surviving(stats_frame, Filter([(["log", "cnt"], "1>=", 2)])) == ["A", "B"]
    assert surviving(stats_frame, Filter([(["log", "cnt"], "a>=", 2)])) == ["A"]
    assert surviving(stats_frame, Filter([(["log", "cnt", "fdr"], "2>=", 2)])) == ["A"]


def test_filter_k_of_n_gt(stats_frame):
    assert surviving(stats_frame, Filter([(["log", "cnt"], "1>", 1.9)])) == ["A", "B"]
    assert surviving(stats_frame, Filter([(["log", "cnt"], "a>", 1.9)])) == ["A"]
    assert surviving(stats_frame, Filter([(["log", "cnt", "fdr"], "2>", 1.9999)])) == ["A"]


def test_filter_k_of_n_leq(stats_frame):
    assert surviving(stats_frame, Filter([(["log", "fdr"], "1<=", 0.05)])) == ["B", "C", "D"]
    assert surviving(stats_frame, Filter([(["log", "fdr"], "a<=", 0.3)])) == ["D"]
    assert surviving(stats_frame, Filter([(["log", "cnt", "fdr"], "2<=", 0)])) == ["C", "D"]


def test_filter_k_of_n_lt(stats_frame):
    assert surviving(stats_frame, Filter([(["log", "cnt"], "1<", 1.0001)])) == ["B", "C", "D"]
    assert surviving(stats_frame, Filter([(["log", "cnt"], "a<", 0)])) == ["C"]
    assert surviving(stats_frame, Filter([(["log", "fdr", "cnt"], "2<", 0)])) == ["C"]


def test_filter_conjunction(stats_frame):
    assert surviving(stats_frame, Filter([("log", ">", 0.5), ("fdr", "<", 0.2)])) == ["A", "B"]


def test_filter_isin_notin(stats_frame):
    assert surviving(stats_frame, Filter([("type", "in", ["A"])])) == ["A", "C"]
    assert surviving(stats_frame, Filter([("type", "notin", ["A"])])) == ["B", "D"]


def test_filter_operator_unknown():
    with pytest.raises(ValueError):
        Filter([("log", "!!", 1)])


def test_combined_and_or(stats_frame):
    f_abs = Filter([("log", "|>", 1)])          # A, C
    f_fdr = Filter([("fdr", "<", 0.2)])          # A, B
    assert surviving(stats_frame, f_abs & f_fdr) == ["A"]
    assert surviving(stats_frame, f_abs | f_fdr) == ["A", "B", "C"]


def test_combined_invalid_op(stats_frame):
    f1 = Filter([("log", "|>", 1)])
    with pytest.raises(ValueError):
        CombinedFilter(f1, f1, "frobnicate")


def test_pushdown_into_parquet_scan(spark, tmp_path):
    """The compiled predicate must reach the parquet scan (no shuffle,
    PushedFilters populated) — the 100 TB-scale property."""
    p = str(tmp_path / "t.parquet")
    spark.range(1000).selectExpr("id", "id * 2 as v").write.parquet(p)
    df = spark.read.parquet(p)
    plan = Filter([("v", ">", 100)])(df)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(v," in plan
    assert "Exchange" not in plan
