"""Round-11 wave 2: matched-block and sequence tests — Cochran's Q,
Friedman, Wald-Wolfowitz runs, Cochran-Armitage trend, Page-Hinkley
drift. Each pinned against an independent plain-Python computation;
relational oracles live in queries.py."""

import math

import pytest

from mdataframe_spark.operators.stats_tests import (
    cochran_armitage_trend,
    cochran_q,
    friedman_test,
    runs_test,
)
from mdataframe_spark.operators.timeseries import page_hinkley

HOUR_NS = 3_600_000_000_000


# --- Cochran's Q -------------------------------------------------------

def _cochran_reference(table):
    """table: list of per-block outcome tuples (one per condition)."""
    k = len(table[0])
    cj = [sum(row[j] for row in table) for j in range(k)]
    ri = [sum(row) for row in table]
    n = sum(cj)
    num = (k - 1) * (k * sum(c * c for c in cj) - n * n)
    den = k * n - sum(r * r for r in ri)
    return num / den if den > 0 else None


def test_cochran_q_matches_reference(spark):
    table = [
        (1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0),
        (1, 0, 0), (1, 1, 0), (1, 0, 1), (0, 0, 0),
        (1, 1, 0), (1, 0, 0), (1, 1, 0), (1, 1, 1),
    ]
    rows = [
        (b, f"c{j}", table[b][j])
        for b in range(len(table))
        for j in range(3)
    ]
    df = spark.createDataFrame(rows, "blk long, cond string, out int")
    got = cochran_q(df, "blk", "cond", "out").collect()[0]
    want = _cochran_reference(table)
    assert got["n_blocks"] == 12 and got["k"] == 3 and got["dof"] == 2
    assert got["q"] == pytest.approx(want, abs=1e-6)
    assert got["p_value"] is not None


def test_cochran_q_rejects_incomplete_blocks(spark):
    rows = [(0, "a", 1), (0, "b", 0), (1, "a", 1)]  # block 1 lacks b
    df = spark.createDataFrame(rows, "blk long, cond string, out int")
    with pytest.raises(ValueError, match="complete blocks"):
        cochran_q(df, "blk", "cond", "out")


def test_cochran_q_k2_reduces_to_mcnemar_uncorrected(spark):
    # with k=2, Q equals the UNCORRECTED McNemar chi2 (b-c)^2/(b+c)
    table = [(1, 1)] * 10 + [(1, 0)] * 6 + [(0, 1)] * 2 + [(0, 0)] * 12
    rows = [
        (b, f"c{j}", table[b][j])
        for b in range(len(table))
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "blk long, cond string, out int")
    got = cochran_q(df, "blk", "cond", "out", with_p=False).collect()[0]
    assert got["q"] == pytest.approx((6 - 2) ** 2 / (6 + 2), abs=1e-6)


# --- Friedman ----------------------------------------------------------

def _friedman_reference(blocks):
    """blocks: list of per-block value tuples (one per treatment)."""
    n, k = len(blocks), len(blocks[0])
    rank_sums = [0.0] * k
    t3t = 0
    for row in blocks:
        sv = sorted(row)
        ranks = []
        for v in row:
            lo = sum(1 for w in row if w < v)
            t = sum(1 for w in row if w == v)
            ranks.append(lo + (t + 1) / 2.0)
        for j, r in enumerate(ranks):
            rank_sums[j] += r
        seen = set()
        for v in row:
            if v not in seen:
                seen.add(v)
                t = sum(1 for w in row if w == v)
                t3t += t ** 3 - t
        del sv
    fr = 12.0 / (n * k * (k + 1)) * sum(r * r for r in rank_sums) \
        - 3.0 * n * (k + 1)
    c = 1.0 - t3t / (n * (k ** 3 - k))
    return fr / c if c > 0 else None


def test_friedman_matches_reference_with_ties(spark):
    blocks = [
        (3.0, 1.0, 2.0), (2.0, 2.0, 4.0), (5.0, 1.0, 1.0),
        (3.0, 3.0, 3.0), (1.0, 2.0, 4.0), (4.0, 1.0, 2.0),
        (2.0, 1.0, 3.0), (6.0, 2.0, 2.0),
    ]
    rows = [
        (b, f"t{j}", blocks[b][j])
        for b in range(len(blocks))
        for j in range(3)
    ]
    df = spark.createDataFrame(rows, "blk long, trt string, v double")
    got = friedman_test(df, "blk", "trt", "v").collect()[0]
    want = _friedman_reference(blocks)
    assert got["n_blocks"] == 8 and got["k"] == 3 and got["dof"] == 2
    assert got["chi2"] == pytest.approx(want, abs=1e-6)


def test_friedman_rejects_incomplete_blocks(spark):
    rows = [(0, "a", 1.0), (0, "b", 2.0), (1, "a", 1.0)]
    df = spark.createDataFrame(rows, "blk long, trt string, v double")
    with pytest.raises(ValueError, match="complete grid"):
        friedman_test(df, "blk", "trt", "v")


# --- runs test ---------------------------------------------------------

def test_runs_test_hand_sequence(spark):
    # sequence around median: + + + - - + - - - +  (median excluded
    # values constructed explicitly)
    vals = [9.0, 8.0, 7.0, 1.0, 2.0, 9.5, 1.5, 0.5, 2.5, 8.5]
    # median of the 10 values = 4.75 -> above: 5, below: 5, runs: 5
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v double"
    )
    got = runs_test(df, "o", "v").collect()[0]
    assert (got["n_above"], got["n_below"], got["n_runs"]) == (5, 5, 5)
    n1 = n2 = 5.0
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert got["z"] == pytest.approx((5 - mu) / math.sqrt(var), abs=1e-6)
    assert got["p_value"] is not None


def test_runs_test_alternating_is_high_z(spark):
    vals = [1.0 if i % 2 else 9.0 for i in range(40)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v double"
    )
    got = runs_test(df, "o", "v", with_p=False).collect()[0]
    assert got["n_runs"] == 40  # perfect alternation
    assert got["z"] > 5.0


# --- Cochran-Armitage trend ---------------------------------------------

def test_trend_matches_reference(spark):
    # rising dose-response: groups (score, n, x)
    groups = [(1, 50, 5), (2, 50, 10), (3, 50, 18), (4, 50, 30)]
    rows = []
    uid = 0
    for s, n, x in groups:
        for i in range(n):
            rows.append((s, i < x))
            uid += 1
    df = spark.createDataFrame(rows, "score long, conv boolean")
    got = cochran_armitage_trend(df, "score", "conv").collect()[0]
    n_tot = sum(n for _, n, _ in groups)
    x_tot = sum(x for _, _, x in groups)
    pbar = x_tot / n_tot
    sx = sum(s * x for s, _, x in groups)
    sn = sum(s * n for s, n, _ in groups)
    ssn = sum(s * s * n for s, n, _ in groups)
    num = sx - pbar * sn
    var = pbar * (1 - pbar) * (ssn - sn * sn / n_tot)
    assert got["n"] == n_tot and got["n_groups"] == 4
    assert got["z"] == pytest.approx(num / math.sqrt(var), abs=1e-5)
    assert got["z"] > 4.0  # strong positive trend
    assert got["p_value"] is not None and got["p_value"] < 1e-4


def test_trend_flat_is_near_zero(spark):
    rows = []
    for s in (1, 2, 3, 4):
        rows += [(s, i < 10) for i in range(50)]
    df = spark.createDataFrame(rows, "score long, conv boolean")
    got = cochran_armitage_trend(df, "score", "conv", with_p=False).collect()[0]
    assert abs(got["z"]) < 1e-6  # identical rates -> zero trend


# --- Page-Hinkley ------------------------------------------------------

def _ph_reference(xs, delta=0.0):
    out = []
    cs = 0.0
    u = 0.0
    runmin = 0.0
    for i, x in enumerate(xs, start=1):
        cs += x
        m = cs / i
        u += x - m - delta
        runmin = min(runmin, u) if i > 1 else u
        out.append((u, u - runmin))
    return out


def test_page_hinkley_alarms_after_shift(spark):
    # 30 calm hours at ~10 events, then 20 hours at ~60: the monitor
    # must stay quiet before the shift and alarm after it
    rows = []
    for b in range(30):
        for j in range(10):
            rows.append((b * HOUR_NS + j,))
    for b in range(30, 50):
        for j in range(60):
            rows.append((b * HOUR_NS + j,))
    df = spark.createDataFrame(rows, "ts bigint")
    got = page_hinkley(df, lam=25.0).collect()
    by = {int(r["bucket"]): r for r in got}
    assert not any(by[b]["alarm"] for b in range(30))
    assert any(by[b]["alarm"] for b in range(30, 50))
    # replay against plain python on the same counts
    xs = [10.0] * 30 + [60.0] * 20
    ref = _ph_reference(xs)
    for b in range(50):
        assert by[b]["u"] == pytest.approx(ref[b][0], abs=1e-4)
        assert by[b]["ph"] == pytest.approx(ref[b][1], abs=1e-4)


def test_page_hinkley_stationary_stays_quiet(spark):
    rows = []
    for b in range(40):
        for j in range(10 + (b % 3)):  # small bounded wiggle
            rows.append((b * HOUR_NS + j,))
    df = spark.createDataFrame(rows, "ts bigint")
    got = page_hinkley(df, lam=25.0).collect()
    assert not any(r["alarm"] for r in got)


# --- randomized properties ----------------------------------------------

def test_cochran_q_random_tables_match_reference(spark):
    import random

    rnd = random.Random(1107)
    for trial in range(3):
        k = rnd.choice([2, 3, 4])
        table = [
            tuple(rnd.randint(0, 1) for _ in range(k))
            for _ in range(rnd.randint(8, 25))
        ]
        rows = [
            (b, f"c{j}", table[b][j])
            for b in range(len(table))
            for j in range(k)
        ]
        df = spark.createDataFrame(rows, "blk long, cond string, out int")
        got = cochran_q(df, "blk", "cond", "out", with_p=False).collect()[0]
        want = _cochran_reference(table)
        if want is None:
            assert got["q"] is None
        else:
            assert got["q"] == pytest.approx(want, abs=1e-6), (trial, table)


def test_friedman_random_blocks_match_reference(spark):
    import random

    rnd = random.Random(42)
    for trial in range(3):
        k = rnd.choice([3, 4])
        blocks = [
            tuple(float(rnd.randint(0, 5)) for _ in range(k))
            for _ in range(rnd.randint(6, 20))
        ]
        rows = [
            (b, f"t{j}", blocks[b][j])
            for b in range(len(blocks))
            for j in range(k)
        ]
        df = spark.createDataFrame(rows, "blk long, trt string, v double")
        got = friedman_test(df, "blk", "trt", "v", with_p=False).collect()[0]
        want = _friedman_reference(blocks)
        if want is None:
            assert got["chi2"] is None
        else:
            assert got["chi2"] == pytest.approx(want, abs=1e-6), (trial, blocks)
