"""Round-13 extension of the loud-cap guard discipline to the
rank-block family (the round-12 verdict's one `weak` grade): the
shared `_rank_blocks` distinct-value table feeding auc, mannwhitney_u,
ks_two_sample and effect_sizes, plus spearman_rho's two per-axis
doubled-rank tables, all run unpartitioned `Window.orderBy` sums over
tables that grow with the number of DISTINCT raw values — the exact
single-reducer exposure wasserstein_1d was guarded against in round
12. Same contract per site: a deliberately unquantized input raises
CollapsedTableTooLarge naming the `max_values` knob, a bounded input
passes and matches the open arm bit-for-bit, and max_values=None
disables the guard (restoring full laziness)."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.evaluation import auc
from mdataframe_spark.operators.guards import CollapsedTableTooLarge
from mdataframe_spark.operators.stats_tests import (
    effect_sizes,
    ks_two_sample,
    mannwhitney_u,
    spearman_rho,
)


@pytest.fixture(scope="module")
def continuous(spark):
    """600 distinct raw values — past any toy cap, fine for real."""
    return spark.range(600).select(
        (F.col("id").cast("double") + 0.123456).alias("v"),
        (F.col("id") * 1.7 + 0.5).alias("w"),
        (F.col("id") % 2 == 0).alias("g"),
    )


def _quantized(continuous):
    return continuous.select(
        F.floor(F.col("v") / 10).alias("v"),
        F.floor(F.col("w") / 20).alias("w"),
        "g",
    )


def test_mannwhitney_raises_past_max_values(continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        mannwhitney_u(continuous, "v", "g", max_values=100)


def test_mannwhitney_guard_open_matches(continuous):
    q = _quantized(continuous)
    guarded = mannwhitney_u(q, "v", "g", max_values=100).collect()[0]
    open_arm = mannwhitney_u(q, "v", "g", max_values=None).collect()[0]
    assert guarded == open_arm
    assert guarded["u1"] is not None


def test_ks_raises_past_max_values(continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        ks_two_sample(continuous, "v", "g", max_values=100)


def test_ks_guard_open_matches(continuous):
    q = _quantized(continuous)
    guarded = ks_two_sample(q, "v", "g", max_values=100).collect()[0]
    open_arm = ks_two_sample(q, "v", "g", max_values=None).collect()[0]
    assert guarded == open_arm
    assert guarded["d"] is not None


def test_effect_sizes_raises_past_max_values(continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        effect_sizes(continuous, "v", "g", max_values=100)


def test_effect_sizes_guard_open_matches(continuous):
    q = _quantized(continuous)
    guarded = effect_sizes(q, "v", "g", max_values=100).collect()[0]
    open_arm = effect_sizes(q, "v", "g", max_values=None).collect()[0]
    assert guarded == open_arm
    assert guarded["vd_a"] is not None


def test_auc_raises_past_max_values(continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        auc(continuous, "v", "g", max_values=100)


def test_auc_score_decimals_is_the_documented_escape(continuous):
    # the operator's own quantization knob bounds the table BEFORE the
    # probe — the two knobs compose
    r = auc(continuous, "v", "g", score_decimals=-2, max_values=100)
    assert r.collect()[0]["auc"] is not None


def test_auc_guard_open_matches(continuous):
    q = _quantized(continuous)
    guarded = auc(q, "v", "g", max_values=100).collect()[0]
    open_arm = auc(q, "v", "g", max_values=None).collect()[0]
    assert guarded == open_arm
    assert guarded["auc"] is not None


def test_spearman_raises_past_max_values_either_axis(continuous):
    # x axis bounded (one distinct value), y axis raw: the per-axis
    # probe must still fire
    d = continuous.select(F.lit(1.0).alias("x"), F.col("v").alias("y"))
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        spearman_rho(d, "x", "y", max_values=100)
    with pytest.raises(CollapsedTableTooLarge, match="max_values"):
        spearman_rho(continuous, "v", "w", max_values=100)


def test_spearman_guard_open_matches(continuous):
    q = _quantized(continuous)
    guarded = spearman_rho(q, "v", "w", max_values=100).collect()[0]
    open_arm = spearman_rho(q, "v", "w", max_values=None).collect()[0]
    assert guarded == open_arm
    assert guarded["rho"] is not None and guarded["rho"] > 0.9
