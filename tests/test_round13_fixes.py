"""Regression tests for the round-12 ADVICE items fixed in round 13:

1. mutual_information yields NULL mi (not 0.0) on empty/degenerate
   input: Spark's greatest() skips NULLs, so the clamp greatest(mi,
   0.0) silently replaced the degenerate NULL with 0.0, breaking the
   NULL convention the rest of the battery follows (and that nmi
   already followed). The clamp now rides behind an isNotNull guard.
2. conversion_lag's documented semantics match the implementation:
   the lag runs to the user's GLOBAL first to_event (forward-only
   check on two per-user minimums) — a user whose first purchase
   precedes their first view counts as NOT converted even when a
   later purchase exists. This is the min-monoid contract that keeps
   the streaming twin legal; the docstring previously promised
   "first to_event at or after the first from_event".
3. (doc-only, asserted here as a grep) operators/guards.py carries
   the BEHAVIOR CHANGE note: default-on caps + the lazy->eager count
   probe are called out for existing callers, with <knob>=None as the
   restore path.
4. (doc-only) functions/stats.py no longer claims the BY window and
   scale-safe arms agree "bit-for-bit" — the window arm's harmonic
   accumulation order is a WindowExec implementation detail; the
   comment now matches what the 200k-row test asserts (1e-12).
"""

import datetime
import pathlib

from mdataframe_spark.operators.events import conversion_lag
from mdataframe_spark.operators.stats_tests import mutual_information

PKG = pathlib.Path(__file__).resolve().parents[1] / "mdataframe_spark"


# --- 1. mutual_information NULL convention ------------------------------

def test_mutual_information_empty_input_yields_null_mi(spark):
    df = spark.createDataFrame([], "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] is None
    assert r["nmi"] is None
    assert r["n"] is None or r["n"] == 0


def test_mutual_information_all_null_input_yields_null_mi(spark):
    df = spark.createDataFrame(
        [(None, "x"), ("y", None), (None, None)], "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] is None
    assert r["nmi"] is None


def test_mutual_information_clamp_still_active_on_real_input(spark):
    # independent uniform cells: true MI is 0; the ln-sum may land a
    # hair negative in FP — the clamp must still floor it at 0.0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi"] == 0.0
    assert r["n"] == 20


# --- 2. conversion_lag forward-only global-first semantics ---------------

def _ts(h):
    return datetime.datetime(2024, 1, 1, h, 0, 0)


def test_conversion_lag_purchase_before_and_after_first_view(spark):
    # u1: purchase@1, view@2, purchase@5 — the GLOBAL first purchase
    # (1) precedes the first view (2), so u1 is NOT converted even
    # though a later purchase (5) exists. u2: view@1, purchase@4 —
    # converted with lag 3h.
    rows = [
        ("u1", _ts(1), "purchase"),
        ("u1", _ts(2), "view"),
        ("u1", _ts(5), "purchase"),
        ("u2", _ts(1), "view"),
        ("u2", _ts(4), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    r = conversion_lag(df).collect()[0]
    assert r["n_users"] == 2
    assert r["n_converted"] == 1
    assert r["max_lag"] == 3


# --- 3/4. doc guards ------------------------------------------------------

def test_guards_module_carries_behavior_change_note():
    src = (PKG / "operators" / "guards.py").read_text()
    assert "BEHAVIOR CHANGE" in src
    assert "lazy" in src.lower() and "eager" in src.lower()


def test_stats_comment_no_longer_claims_bitwise_by_agreement():
    src = (PKG / "functions" / "stats.py").read_text()
    assert "agree bit-for-bit" not in src
    assert "accumulation-order ulps" in src
