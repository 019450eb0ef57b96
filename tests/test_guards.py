"""Loud-cap runtime guards (round-12, carried from the r10/r11
verdicts): the "bounded if quantized" collapsed-table contracts are
now ENFORCED by count probes, not just documented. One test per
guarded site: a deliberately unquantized input must raise
CollapsedTableTooLarge naming the knob, a quantized input must pass
and return the same values it always did, and cap=None must disable
the guard."""

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.experiments import msprt_monitor
from mdataframe_spark.operators.guards import (
    DEFAULT_MAX_CELLS,
    DEFAULT_MAX_STEPS,
    CollapsedTableTooLarge,
    probe_collapsed,
)
from mdataframe_spark.operators.stats_tests import (
    kendall_tau_cells,
    wasserstein_1d,
)
from mdataframe_spark.operators.survival import (
    kaplan_meier,
    log_rank_test,
    rmst,
)


@pytest.fixture(scope="module")
def continuous(spark):
    """600 distinct raw values — past any toy cap, fine for real."""
    return spark.range(600).select(
        (F.col("id").cast("double") + 0.123456).alias("v"),
        (F.col("id") % 2 == 0).alias("g"),
        (F.col("id") % 3 != 0).alias("e"),
        (F.col("id") * 3_600_000_000_000).alias("ts"),
    )


def test_probe_collapsed_none_disables(spark):
    df = spark.range(100)
    assert probe_collapsed(df, None, "x", "cell", "max_cells") is None


def test_probe_collapsed_under_cap_returns_count(spark):
    df = spark.range(7)
    assert probe_collapsed(df, 10, "x", "cell", "max_cells") == 7


def test_kendall_raises_past_max_cells(spark, continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_cells"):
        kendall_tau_cells(continuous, "v", "v", max_cells=100)


def test_kendall_quantized_passes_and_matches(spark, continuous):
    q = continuous.select(
        F.floor(F.col("v") / 100).alias("x"),
        F.floor(F.col("v") / 200).alias("y"),
    )
    guarded = kendall_tau_cells(q, "x", "y", max_cells=100).collect()[0]
    open_arm = kendall_tau_cells(q, "x", "y", max_cells=None).collect()[0]
    assert guarded == open_arm
    assert guarded["tau_b"] is not None and guarded["tau_b"] > 0


def test_wasserstein_raises_past_max_blocks(spark, continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_blocks"):
        wasserstein_1d(continuous, "v", "g", max_blocks=100)


def test_wasserstein_guard_open_matches(spark, continuous):
    guarded = wasserstein_1d(
        continuous, "v", "g", max_blocks=1000
    ).collect()[0]
    open_arm = wasserstein_1d(
        continuous, "v", "g", max_blocks=None
    ).collect()[0]
    assert guarded == open_arm
    assert guarded["wasserstein"] is not None


def test_kaplan_meier_raises_past_max_steps(spark, continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_steps"):
        kaplan_meier(continuous, "v", "e", max_steps=100)


def test_kaplan_meier_quantized_passes(spark, continuous):
    q = continuous.select(F.floor(F.col("v") / 10).alias("d"), "e")
    out = kaplan_meier(q, "d", "e", max_steps=100)
    rows = out.collect()
    assert len(rows) == 60
    assert rows[0]["survival"] <= 1.0


def test_log_rank_raises_past_max_steps(spark, continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_steps"):
        log_rank_test(continuous, "v", "e", "g", max_steps=100)


def test_rmst_passes_max_steps_through(spark, continuous):
    with pytest.raises(CollapsedTableTooLarge, match="max_steps"):
        rmst(continuous, "v", "e", max_steps=100)


def test_msprt_raises_past_max_buckets(spark, continuous):
    # one bucket per row at this period: 600 buckets > 100 cap
    with pytest.raises(CollapsedTableTooLarge, match="max_buckets"):
        msprt_monitor(
            continuous, "ts", "g", "e",
            period_ns=3_600_000_000_000, max_buckets=100,
        )


def test_msprt_coarse_buckets_pass(spark, continuous):
    out = msprt_monitor(
        continuous, "ts", "g", "e",
        period_ns=3_600_000_000_000 * 100, max_buckets=100,
    )
    rows = out.collect()
    assert 0 < len(rows) <= 100
    assert all(r["p_always_valid"] is None or r["p_always_valid"] <= 1.0
               for r in rows)


def test_default_caps_are_sane():
    assert DEFAULT_MAX_CELLS == 10_000
    assert DEFAULT_MAX_STEPS == 100_000
