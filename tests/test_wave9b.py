"""Unit tests for the round-9 wave B operators: association rules,
degree assortativity, Benford audit, l-diversity, LLR keywords."""

import math

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.baskets import (
    association_rules,
    degree_assortativity,
)
from mdataframe_spark.operators.diagnostics import (
    benford_expected,
    benford_test,
    l_diversity,
)
from mdataframe_spark.operators.text import keyword_llr


def test_association_rules_fixture(spark):
    # 4 baskets: {1,2} x3, {1,3} x1 -> rule 1->2: conf 2/4... build
    # explicit: baskets b1{1,2}, b2{1,2}, b3{1,2}, b4{1,3}
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2), (4, 1), (4, 3)]
    df = spark.createDataFrame(rows, "b BIGINT, i BIGINT")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "b", "i", min_count=2).collect()
    }
    # pair (1,2): co=3, n(1)=4, n(2)=3, N=4
    r12 = out[(1, 2)]
    assert r12["n_co"] == 3
    assert r12["support"] == pytest.approx(0.75)
    assert r12["confidence"] == pytest.approx(3 / 4)
    assert r12["lift"] == pytest.approx(4 * 3 / (4 * 3))
    r21 = out[(2, 1)]
    assert r21["confidence"] == pytest.approx(1.0)
    assert r21["lift"] == r12["lift"]
    # pair (1,3) has co=1 < min_count -> no rules
    assert (1, 3) not in out and (3, 1) not in out


def test_association_rules_direction_counts(spark):
    rows = [(b, i) for b in range(10) for i in (1, 2)]
    df = spark.createDataFrame(rows, "b BIGINT, i BIGINT")
    out = association_rules(df, "b", "i").collect()
    # one undirected pair -> exactly two directed rules
    assert len(out) == 2
    assert {(r["antecedent"], r["consequent"]) for r in out} == {
        (1, 2),
        (2, 1),
    }


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a BIGINT, id_b BIGINT")


def test_assortativity_star_is_minus_one(spark):
    # star K1,5: every edge joins deg-5 hub to deg-1 leaf -> r = -1
    out = degree_assortativity(_edges(spark, [(0, i) for i in range(1, 6)]))
    row = out.collect()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_regular_graph_is_null(spark):
    # cycle: all degrees equal -> zero variance -> NULL
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    row = degree_assortativity(_edges(spark, cyc)).collect()[0]
    assert row["assortativity"] is None
    assert row["n_edges"] == 6


def test_assortativity_matches_numpy(spark):
    import numpy as np

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (0, 3)]
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r = np.corrcoef(xs, ys)[0, 1]
    assert row["assortativity"] == pytest.approx(r, abs=1e-6)
    assert row["n_directed"] == 12


def test_assortativity_dedupes_and_drops_self_loops(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (3, 3)]
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    assert row["n_edges"] == 1 and row["n_nodes"] == 2


def test_benford_expected_sums_to_one():
    ps = [float(p) for p in benford_expected()]
    assert sum(ps) == pytest.approx(1.0, abs=1e-9)
    assert ps[0] == pytest.approx(math.log10(2), abs=1e-12)


def test_benford_fixture(spark):
    # values engineered: digits 1,1,2,9; zero/negative/sub-cent dropped
    vals = [1.23, 150.0, 29.9, 900.0, 0.0, -5.0, 0.001]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    out = {r["digit"]: r for r in benford_test(df, "x").collect()}
    assert len(out) == 9
    assert out[1]["n_observed"] == 2
    assert out[2]["n_observed"] == 1
    assert out[9]["n_observed"] == 1
    assert out[5]["n_observed"] == 0
    n = 4
    e1 = round(n * float(benford_expected()[0]), 6)
    assert out[1]["n_expected"] == pytest.approx(e1, abs=1e-9)
    assert out[1]["chi2_term"] == pytest.approx((2 - e1) ** 2 / e1, abs=1e-5)


def test_benford_uniform_data_fails_the_law(spark):
    # uniform first digits deviate hard from Benford: chi2 sum is large
    df = spark.createDataFrame(
        [(float(d) * 10 + 1,) for d in range(1, 10) for _ in range(100)],
        "x DOUBLE",
    )
    out = benford_test(df, "x").toPandas()
    assert out["chi2_term"].sum() > 100


def test_l_diversity_fixture(spark):
    rows = [
        # class (1,'A'): two distinct sensitive values -> meets l=2
        (1, "A", "x"),
        (1, "A", "y"),
        # class (2,'B'): one value repeated -> fails l=2
        (2, "B", "z"),
        (2, "B", "z"),
        # class (3,'C'): NULL is a distinct observable bucket
        (3, "C", None),
        (3, "C", "w"),
    ]
    df = spark.createDataFrame(rows, "q1 INT, q2 STRING, s STRING")
    out = {
        (r["q1"], r["q2"]): r
        for r in l_diversity(df, ["q1", "q2"], "s", l=2).collect()
    }
    assert out[(1, "A")]["n_sensitive"] == 2 and out[(1, "A")]["meets_l"]
    assert out[(2, "B")]["n_sensitive"] == 1 and not out[(2, "B")]["meets_l"]
    assert out[(3, "C")]["n_sensitive"] == 2 and out[(3, "C")]["meets_l"]
    assert out[(2, "B")]["n_rows"] == 2


def test_keyword_llr_finds_the_planted_keyword(spark):
    # token "zebra" appears only in source A, common words everywhere
    rows = []
    for i in range(20):
        rows.append((i, "A", "the cat sat zebra zebra zebra"))
    for i in range(20, 40):
        rows.append((i, "B", "the cat sat on the mat"))
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")
    out = keyword_llr(df, "source", "text", k=3, min_count=3).collect()
    a_tokens = [r["token"] for r in out if r["source"] == "A"]
    assert a_tokens[0] == "zebra"
    zebra = [r for r in out if r["token"] == "zebra"][0]
    assert zebra["n_in_group"] == 60 and zebra["n_elsewhere"] == 0
    assert zebra["llr"] > 10
    # underrepresented tokens never rank as keywords of A
    assert "mat" not in a_tokens


def test_keyword_llr_rank_is_dense_per_group(spark):
    rows = [(i, "A" if i % 2 else "B", "alpha beta gamma delta") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")
    out = keyword_llr(df, "source", "text", k=5, min_count=1).collect()
    # perfectly balanced corpus: no token is overrepresented anywhere
    assert out == []
