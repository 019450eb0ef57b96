"""Unit tests for the round-9 wave F operators: k-core peeling and
Markov stationary distribution."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.baskets import k_core
from mdataframe_spark.operators.events import markov_stationary


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a BIGINT, id_b BIGINT")


def test_kcore_triangle_with_tail(spark):
    # triangle {1,2,3} plus a tail 3-4-5: the 2-core is the triangle
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    out = {r["v"]: r["core_degree"] for r in k_core(_edges(spark, pairs), k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    # a path graph has no 2-core at all — peeling cascades from the
    # leaves inward and must empty the graph (this is what a single
    # degree-filter pass WITHOUT iteration would get wrong)
    path = [(i, i + 1) for i in range(8)]
    assert k_core(_edges(spark, path), k=2, rounds=8).count() == 0


def test_kcore_k3_on_k4_plus_pendant(spark):
    # K4 survives a 3-core; a pendant vertex hanging off it does not
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = k4 + [(3, 9)]
    out = {r["v"]: r["core_degree"] for r in k_core(_edges(spark, pairs), k=3).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_fixed_point_on_testdata_graph(spark):
    # the query's 6 rounds reach the peeling fixed point at sf0.001:
    # one more round changes nothing
    from mdataframe_spark.operators.baskets import co_occurrence_pairs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pairs = co_occurrence_pairs(
        li, "l_orderkey", "l_partkey", min_count=2, with_stats=False
    ).select(F.col("item_a").alias("id_a"), F.col("item_b").alias("id_b"))
    six = {(r["v"], r["core_degree"]) for r in k_core(pairs, k=2, rounds=6).collect()}
    seven = {(r["v"], r["core_degree"]) for r in k_core(pairs, k=2, rounds=7).collect()}
    assert six == seven


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, event_type STRING, ts BIGINT"
    )


def test_markov_stationary_two_state_chain(spark):
    # A->B always, B->A always: stationary = (0.5, 0.5)
    rows = []
    eid = 0
    for u in range(5):
        for i, t in enumerate(["A", "B"] * 10):
            eid += 1
            rows.append((eid, u, t, i * 1000))
    out = {r["event_type"]: r["stationary_p"] for r in markov_stationary(_ev(spark, rows)).collect()}
    assert out["A"] == pytest.approx(0.5, abs=1e-4)
    assert out["B"] == pytest.approx(0.5, abs=1e-4)


def test_markov_stationary_absorbing_state(spark):
    # A->B, B->END, END absorbs: all mass ends in END
    rows = []
    eid = 0
    for u in range(10):
        for i, t in enumerate(["A", "B", "END"]):
            eid += 1
            rows.append((eid, u, t, i * 1000))
    out = {r["event_type"]: r["stationary_p"] for r in markov_stationary(_ev(spark, rows)).collect()}
    assert out["END"] == pytest.approx(1.0, abs=1e-3)
    assert out["A"] == pytest.approx(0.0, abs=1e-3)


def test_markov_stationary_sums_to_one_on_testdata(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = markov_stationary(ev).toPandas()
    assert len(out) == 5
    # row-normalized chain with no absorbing states conserves mass up
    # to the per-round 9-dp rounding drift
    assert out["stationary_p"].sum() == pytest.approx(1.0, abs=1e-3)


def test_markov_stationary_empty_input(spark):
    out = markov_stationary(_ev(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["event_type", "stationary_p"]


def test_lpa_two_cliques_with_bridge(spark):
    from mdataframe_spark.operators.baskets import label_propagation

    # two 4-cliques joined by one bridge edge: two communities, the
    # bridge does not merge them
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = cl1 + cl2 + [(3, 10)]
    out = label_propagation(_edges(spark, pairs), rounds=6).collect()
    comms = {}
    for r in out:
        comms.setdefault(r["community"], set()).add(r["v"])
    assert len(comms) == 2
    sizes = sorted(r["community_size"] for r in out)
    assert set(sizes) == {4}
    # lowest-label convention: each clique's community is its min id
    assert set(comms) == {0, 10}


def test_lpa_clique_converges_to_min_label(spark):
    from mdataframe_spark.operators.baskets import label_propagation

    k5 = [(a, b) for a in range(5, 10) for b in range(a + 1, 10)]
    out = label_propagation(_edges(spark, k5), rounds=4).collect()
    assert {r["community"] for r in out} == {5}
    assert all(r["community_size"] == 5 for r in out)


def test_lpa_deterministic_across_runs(spark):
    from mdataframe_spark.operators.baskets import label_propagation

    pairs = [
        (a, b)
        for a in range(15)
        for b in range(a + 1, 15)
        if (a * 5 + b * 3) % 4 == 0
    ]
    a = sorted(map(tuple, label_propagation(_edges(spark, pairs)).collect()))
    b = sorted(map(tuple, label_propagation(_edges(spark, pairs)).collect()))
    assert a == b
