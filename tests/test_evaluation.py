"""Unit tests for the evaluation & observability wave: AUC,
calibration, silhouette (operators/evaluation.py), funnel / cohort /
rate anomaly (operators/events.py), per-group top-k sampling
(operators/datasets.py) and key-skew profiling
(operators/diagnostics.py).

Cross-engine hash parity for the same operators is covered by the
EXTRA registry (tests/test_extra_parity.py); these tests pin the
SEMANTICS to hand-computed fixtures instead.
"""

import math

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.datasets import group_topk_sample
from mdataframe_spark.operators.diagnostics import key_skew_profile
from mdataframe_spark.operators.evaluation import (
    auc,
    calibration_bins,
    centroid_silhouette,
)
from mdataframe_spark.operators.events import (
    cohort_retention,
    funnel,
    rate_anomaly,
)

NS = 1_000_000_000


# ---------------------------------------------------------------------------
# AUC
# ---------------------------------------------------------------------------
def test_auc_hand_computed_with_ties(spark):
    # scores: two tied blocks; manual tie-aware AUC
    rows = [
        (0.1, 0), (0.1, 0), (0.4, 0), (0.4, 1), (0.8, 1), (0.9, 1),
    ]
    df = spark.createDataFrame(rows, ["s", "y"])
    got = auc(df, "s", "y").first()
    # ranks: 0.1 -> avg 1.5 (x2), 0.4 -> avg 3.5 (x2), 0.8 -> 5, 0.9 -> 6
    # R_pos = 3.5 + 5 + 6 = 14.5; P=3, N=3
    expect = (14.5 - 3 * 4 / 2) / (3 * 3)
    assert got["n_pos"] == 3 and got["n_neg"] == 3
    # the operator rounds auc to 6 dp
    assert abs(got["auc"] - expect) < 5e-7


def test_auc_perfect_and_degenerate(spark):
    df = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)], ["s", "y"]
    )
    assert auc(df, "s", "y").first()["auc"] == 1.0
    # single-class input -> NULL auc, not a division error
    ones = spark.createDataFrame([(0.3, 1), (0.7, 1)], ["s", "y"])
    row = auc(ones, "s", "y").first()
    assert row["auc"] is None and row["n_neg"] == 0


def test_auc_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(0.2, 0), (0.9, 1), (None, 1), (0.5, None)],
        "s double, y int",
    )
    row = auc(df, "s", "y").first()
    assert row["n_pos"] == 1 and row["n_neg"] == 1 and row["auc"] == 1.0


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------
def test_calibration_bins_fixture(spark):
    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y").collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 0
    assert out[0]["mean_confidence"] == pytest.approx(0.05)
    assert out[0]["positive_rate"] == 0.0
    # score exactly 1.0 clamps into the last bin
    assert out[9]["n"] == 3 and out[9]["n_pos"] == 2
    assert out[9]["calibration_gap"] == pytest.approx(
        abs(2 / 3 - (0.95 + 0.95 + 1.0) / 3), abs=2e-6
    )


# ---------------------------------------------------------------------------
# silhouette
# ---------------------------------------------------------------------------
def test_centroid_silhouette_separated_clusters(spark):
    rows = [
        (0, [0.0, 0.1], 0),
        (1, [0.0, -0.1], 0),
        (2, [10.0, 0.1], 1),
        (3, [10.0, -0.1], 1),
        # sits exactly ON the other cluster's centroid -> b=0 < a -> s=-1
        (4, [10.0, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["vec_id"]: r for r in centroid_silhouette(df).collect()}
    # label-0 centroid is pulled toward x=10/3 by the outlier; the two
    # tight points still score positive, the outlier scores negative
    assert out[0]["silhouette"] > 0
    assert out[1]["silhouette"] > 0
    assert out[4]["silhouette"] < 0
    # a_dist of a point is the distance to its own centroid
    cx = (0.0 + 0.0 + 10.0) / 3
    assert out[0]["a_dist"] == pytest.approx(
        math.sqrt(cx**2 + 0.1**2), abs=1e-5
    )


def test_centroid_silhouette_label_cap(spark):
    df = spark.createDataFrame(
        [(i, [float(i)], i) for i in range(5)],
        ["vec_id", "embedding", "label"],
    )
    with pytest.raises(ValueError, match="max_labels"):
        centroid_silhouette(df, max_labels=3)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------
def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, ts * NS) for u, t, ts in rows],
        "user_id bigint, event_type string, ts bigint",
    )


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2 clicked BEFORE viewing: click must not count
        (2, "click", 5), (2, "view", 10),
        # u3 views only
        (3, "view", 1),
        # u4 purchase before click: purchase must not count
        (4, "view", 1), (4, "purchase", 2), (4, "click", 3),
    ]
    out = {
        r["step"]: r
        for r in funnel(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["users"] == 4
    assert out["click"]["users"] == 2  # u1 and u4
    assert out["purchase"]["users"] == 1  # u1 only
    assert out["view"]["conv_from_prev"] == 1.0
    assert out["click"]["conv_from_first"] == 0.5
    assert out["purchase"]["conv_from_prev"] == 0.5


def test_funnel_equal_timestamps_not_counted(spark):
    # strict ">": a click at the exact view instant is not a follow-up
    rows = [(1, "view", 10), (1, "click", 10)]
    out = {
        r["step"]: r["users"]
        for r in funnel(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert out == {"view": 1, "click": 0}


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------
def test_cohort_retention_fixture(spark):
    day = 86400
    rows = [
        (1, "view", 0 * day), (1, "view", 1 * day + 5),
        (2, "view", 0 * day + 7), (2, "view", 2 * day),
        (3, "view", 1 * day),
    ]
    out = {
        (r["cohort_epoch"], r["offset_periods"]): r
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert out[(0, 0)]["active_users"] == 2
    assert out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 1)]["active_users"] == 1
    assert out[(0, 1)]["retention_rate"] == 0.5
    assert out[(0, 2)]["retention_rate"] == 0.5
    assert out[(day, 0)]["cohort_size"] == 1
    assert len(out) == 4


# ---------------------------------------------------------------------------
# rate anomaly
# ---------------------------------------------------------------------------
def test_rate_anomaly_spike_flagged(spark):
    hour = 3600
    rows = []
    # 9 calm hours at 10 events, one hour at 100
    for h in range(9):
        rows += [(u, "click", h * hour + u) for u in range(10)]
    rows += [(u, "click", 9 * hour + u) for u in range(100)]
    # a constant type: z must be NULL, flag false
    rows += [(1, "view", h * hour) for h in range(5)]
    out = rate_anomaly(_ev(spark, rows), threshold=2.5).collect()
    clicks = {r["bucket_epoch"]: r for r in out if r["event_type"] == "click"}
    assert clicks[9 * hour]["is_anomaly"] is True
    assert all(not clicks[h * hour]["is_anomaly"] for h in range(9))
    views = [r for r in out if r["event_type"] == "view"]
    assert all(r["z_score"] is None and r["is_anomaly"] is False for r in views)


# ---------------------------------------------------------------------------
# group top-k sampling
# ---------------------------------------------------------------------------
def test_group_topk_exact_k_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(200)], ["doc_id", "grp"]
    )
    out = group_topk_sample(df, "grp", k=5, key="doc_id", seed=7)
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # stable across recomputation and partitioning
    ids1 = sorted(r["doc_id"] for r in out.collect())
    out2 = group_topk_sample(
        df.repartition(7), "grp", k=5, key="doc_id", seed=7
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == ids1


def test_group_topk_small_groups_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "grp"]
    )
    out = group_topk_sample(df, "grp", k=5, key="doc_id", seed=7).collect()
    assert len(out) == 3


def test_group_topk_prefilter_equivalence(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2)) for i in range(500)], ["doc_id", "grp"]
    )
    base = group_topk_sample(df, "grp", k=10, key="doc_id", seed=3)
    fast = group_topk_sample(
        df, "grp", k=10, key="doc_id", seed=3, prefilter_overshoot=4.0
    )
    # an absurdly tight overshoot forces the verified fallback path
    forced = group_topk_sample(
        df, "grp", k=10, key="doc_id", seed=3, prefilter_overshoot=0.01
    )
    want = sorted(r["doc_id"] for r in base.collect())
    assert sorted(r["doc_id"] for r in fast.collect()) == want
    assert sorted(r["doc_id"] for r in forced.collect()) == want


# ---------------------------------------------------------------------------
# key skew profile
# ---------------------------------------------------------------------------
def test_key_skew_profile_fixture(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in out] == ["hot", "warm"]
    hot = out[0]
    assert hot["cnt"] == 60 and hot["rank"] == 1
    assert hot["share"] == pytest.approx(0.6)
    assert hot["cum_share"] == pytest.approx(0.6)
    # 3 keys, mean 100/3: hot is 1.8x the mean
    assert hot["skew_vs_mean"] == pytest.approx(1.8)
    assert out[1]["cum_share"] == pytest.approx(0.9)
