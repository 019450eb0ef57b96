"""Semantic pins for the round-12 wave (oracle parity is covered by
tests/test_extra_parity.py; these check the MATH on hand-sized inputs
where the right answer is computable by hand or numpy)."""

import math

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.functions.stats import holm_adjust
from mdataframe_spark.operators.baskets import degree_histogram, reciprocity
from mdataframe_spark.operators.datasets import kfold_assign, kfold_profile
from mdataframe_spark.operators.diagnostics import format_patterns
from mdataframe_spark.operators.events import conversion_lag
from mdataframe_spark.operators.stats_tests import (
    cohens_kappa,
    concordance_ccc,
    levene_test,
    mutual_information,
)
from mdataframe_spark.operators.text import casing_profile
from mdataframe_spark.operators.timeseries import durbin_watson, ljung_box


# --- kappa -------------------------------------------------------------

def test_kappa_perfect_and_known_2x2(spark):
    same = spark.createDataFrame(
        [("x", "x")] * 7 + [("y", "y")] * 3, "a string, b string"
    )
    r = cohens_kappa(same, "a", "b").collect()[0]
    assert r["kappa"] == pytest.approx(1.0)
    # classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10
    rows = (
        [("yes", "yes")] * 20 + [("no", "no")] * 15
        + [("yes", "no")] * 5 + [("no", "yes")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = 50.0
    po = 35 / n
    pe = (25 / n) * (30 / n) + (25 / n) * (20 / n)
    assert r["po"] == pytest.approx(po, abs=1e-6)
    assert r["pe"] == pytest.approx(pe, abs=1e-6)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-5)


def test_kappa_disjoint_categories(spark):
    # rater_b uses categories rater_a never does: agreement 0, pe 0
    df = spark.createDataFrame(
        [("a", "p"), ("b", "q")] * 5, "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 0.0 and r["pe"] == 0.0 and r["kappa"] == 0.0
    assert r["n_categories"] == 4


# --- mutual information --------------------------------------------------

def test_mi_identity_and_independence(spark):
    ident = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    r = mutual_information(ident, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-5)
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    r2 = mutual_information(indep, "a", "b").collect()[0]
    assert r2["mi"] == pytest.approx(0.0, abs=1e-6)


# --- levene -------------------------------------------------------------

def test_levene_matches_numpy(spark):
    import numpy as np

    g1 = [1.0, 2.0, 3.0, 4.0, 5.0]
    g2 = [10.0, 10.5, 11.0, 11.5, 12.0]
    df = spark.createDataFrame(
        [(v, "a") for v in g1] + [(v, "b") for v in g2],
        "v double, g string",
    )
    r = levene_test(df, "v", "g", with_p=False).collect()[0]
    # hand Levene: z = |x - group mean|, one-way ANOVA F on z
    z1 = np.abs(np.array(g1) - np.mean(g1))
    z2 = np.abs(np.array(g2) - np.mean(g2))
    z = np.concatenate([z1, z2])
    ssb = sum(
        len(zi) * (zi.mean() - z.mean()) ** 2 for zi in (z1, z2)
    )
    ssw = sum(((zi - zi.mean()) ** 2).sum() for zi in (z1, z2))
    f = (ssb / 1) / (ssw / (len(z) - 2))
    assert r["f_stat"] == pytest.approx(f, rel=1e-4)


# --- CCC ----------------------------------------------------------------

def test_ccc_identity_and_shift(spark):
    xs = [float(i) for i in range(1, 21)]
    ident = spark.createDataFrame([(x, x) for x in xs], "x double, y double")
    r = concordance_ccc(ident, "x", "y").collect()[0]
    assert r["ccc"] == pytest.approx(1.0, abs=1e-6)
    assert r["pearson_r"] == pytest.approx(1.0, abs=1e-6)
    shifted = spark.createDataFrame(
        [(x, x + 10.0) for x in xs], "x double, y double"
    )
    r2 = concordance_ccc(shifted, "x", "y").collect()[0]
    # r stays perfect, CCC penalizes the calibration shift
    assert r2["pearson_r"] == pytest.approx(1.0, abs=1e-6)
    vx = sum((x - sum(xs) / 20) ** 2 for x in xs) / 20
    assert r2["ccc"] == pytest.approx(2 * vx / (2 * vx + 100.0), abs=1e-5)


# --- Holm ---------------------------------------------------------------

def test_holm_matches_hand_reference(spark):
    ps = [0.01, 0.04, 0.03, 0.005]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "k long, p double"
    )
    got = {r["k"]: r["p_holm"] for r in
           holm_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    # hand step-down: sorted p (.005,.01,.03,.04) * (4,3,2,1), run max
    order = sorted(range(4), key=lambda i: ps[i])
    ref, run = {}, 0.0
    for rank, idx in enumerate(order, start=1):
        run = max(run, min(ps[idx] * (4 - rank + 1), 1.0))
        ref[idx] = run
    for k in range(4):
        assert got[k] == pytest.approx(ref[k], abs=1e-12)
        assert got[k] >= ps[k] - 1e-12  # adjusted dominates raw


def test_holm_null_p_stays_null(spark):
    df = spark.createDataFrame(
        [(1, 0.01), (2, None), (3, 0.5)], "k long, p double"
    )
    got = {r["k"]: r["p_holm"] for r in
           holm_adjust(df, "p", tiebreak_cols=["k"]).collect()}
    assert got[2] is None
    assert got[1] == pytest.approx(0.02)  # n=2 non-null


# --- Ljung-Box / Durbin-Watson -------------------------------------------

def _ts_frame(spark, counts):
    """One event per unit at hour-bucket i, repeated counts[i] times."""
    H = 3_600_000_000_000
    rows = [
        (i * H + j,) for i, c in enumerate(counts) for j in range(c)
    ]
    return spark.createDataFrame(rows, "ts long")


def test_ljung_box_matches_numpy(spark):
    import numpy as np

    counts = [5, 9, 4, 10, 3, 11, 5, 9, 4, 10, 3, 11, 5, 9, 4, 10]
    df = _ts_frame(spark, counts)
    r = ljung_box(df, max_lag=3, with_p=False).collect()[0]
    x = np.array(counts, dtype=float)
    n = len(x)
    m = x.mean()
    den = ((x - m) ** 2).sum()
    q = 0.0
    for k in range(1, 4):
        rk = ((x[:-k] - m) * (x[k:] - m)).sum() / den
        rk = round(rk, 6)  # the acf_lags 6-dp grid the operator consumes
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert r["n"] == n
    assert r["q_stat"] == pytest.approx(q, abs=1e-4)


def test_durbin_watson_extremes(spark):
    import numpy as np

    alt = [2, 10] * 10
    r = durbin_watson(_ts_frame(spark, alt)).collect()[0]
    x = np.array(alt, dtype=float)
    d = x - x.mean()
    dw = (np.diff(d) ** 2).sum() / (d ** 2).sum()
    assert r["dw"] == pytest.approx(dw, abs=1e-5)
    assert r["dw"] > 3.0  # alternating -> strong negative autocorr
    trend = list(range(1, 21))
    r2 = durbin_watson(_ts_frame(spark, trend)).collect()[0]
    assert r2["dw"] < 1.0  # smooth trend -> strong positive autocorr


# --- graph shape ----------------------------------------------------------

def test_degree_histogram_hand_graph(spark):
    # star: hub 0 connected to 1..4 -> degrees {4:1, 1:4}
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    rows = {r["degree"]: r for r in degree_histogram(edges).collect()}
    assert rows[1]["n_nodes"] == 4 and rows[4]["n_nodes"] == 1
    assert rows[1]["share"] == pytest.approx(0.8)
    assert rows[4]["ccdf"] == pytest.approx(0.2)
    assert rows[1]["ccdf"] == pytest.approx(1.0)


def test_reciprocity_hand_graph(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c")],
        "src string, dst string",
    )
    r = reciprocity(edges).collect()[0]
    assert r["n_edges"] == 3  # self-loop dropped
    assert r["n_reciprocal"] == 2
    assert r["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


# --- profiling ------------------------------------------------------------

def test_format_patterns_masks(spark):
    df = spark.createDataFrame(
        [("Clerk#0001",), ("Clerk#0002",), ("x9",), (None,)],
        "v string",
    )
    rows = {r["pattern"]: r["n_rows"] for r in
            format_patterns(df, "v").collect()}
    assert rows["Aaaaa#9999"] == 2
    assert rows["a9"] == 1
    assert rows["<null>"] == 1


def test_casing_profile_hand_string(spark):
    df = spark.createDataFrame([("AAbb 99!", "s1")], "text string, source string")
    r = casing_profile(df, "text", "source").collect()[0]
    assert r["n_chars"] == 8
    assert r["upper_ratio"] == pytest.approx(2 / 8)
    assert r["lower_ratio"] == pytest.approx(2 / 8)
    assert r["digit_ratio"] == pytest.approx(2 / 8)
    assert r["space_ratio"] == pytest.approx(1 / 8)
    assert r["other_ratio"] == pytest.approx(1 / 8)


# --- folds ------------------------------------------------------------------

def test_kfold_deterministic_and_leakage_safe(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(500)], "id long, grp string"
    )
    a = kfold_assign(df, "id", k=5)
    assert a.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).count() == 0
    b = kfold_assign(df, "id", k=5)
    assert a.join(b.withColumnRenamed("fold", "f2"), "id").filter(
        F.col("fold") != F.col("f2")
    ).count() == 0
    # group folds: every row of a group shares one fold
    g = kfold_assign(df, "id", k=5, group_col="grp")
    assert g.groupBy("grp").agg(
        F.countDistinct("fold").alias("nf")
    ).filter(F.col("nf") > 1).count() == 0
    prof = kfold_profile(df, "id", k=5).collect()
    assert sum(r["n_rows"] for r in prof) == 500
    assert abs(sum(r["share"] for r in prof) - 1.0) < 1e-4


# --- funnel latency ---------------------------------------------------------

def test_conversion_lag_hand_events(spark):
    H = 3_600_000_000_000
    rows = [
        (1, 0 * H, "view"), (1, 5 * H, "purchase"),       # lag 5
        (2, 1 * H, "view"),                                # no purchase
        (3, 4 * H, "purchase"), (3, 6 * H, "view"),        # backwards -> not converted
        (4, 2 * H, "view"), (4, 2 * H + H // 2, "purchase"),  # lag 0 (same hour)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    r = conversion_lag(df).collect()[0]
    assert r["n_users"] == 4
    assert r["n_converted"] == 2
    assert r["conversion_rate"] == pytest.approx(0.5)
    assert r["p50_lag"] == pytest.approx(2.5)
    assert r["mean_lag"] == pytest.approx(2.5)
    assert r["max_lag"] == 5


def test_durbin_watson_exact_on_tiny_fractional_steps(spark):
    """Review regression (round-12): a 4-dp value series whose
    consecutive buckets differ by 0.0001 — the direct (xb − xa)²
    decimal square overflowed Spark's 38-precision cap to scale 7 and
    rounded every 1e-8 step to ZERO (dw = 0.0, 'perfect positive
    autocorrelation'); the scaled-integer form (diff·10⁴ squared in
    decimal(38,0), divided by 10⁸ once) keeps the sum exact."""
    import numpy as np

    H = 3_600_000_000_000
    vals = [1.0 + 0.0001 * i for i in range(30)]
    rows = [(i * H, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts long, value double")
    r = durbin_watson(df, value_col="value").collect()[0]
    x = np.array(vals)
    d = x - x.mean()
    dw = (np.diff(d) ** 2).sum() / (d ** 2).sum()
    assert r["dw"] is not None and r["dw"] > 0
    assert r["dw"] == pytest.approx(dw, rel=1e-4)


def test_ljung_box_single_bucket_series_keeps_n(spark):
    """Review regression (round-12): a single-bucket series has an
    empty lag table — the result must still be ONE row with the REAL
    series length (n=1, h=0, q NULL), matching the oracle's shape."""
    H = 3_600_000_000_000
    df = spark.createDataFrame([(10,), (20,), (30,)], "ts long")
    df = df.select((F.col("ts") % H).alias("ts"))  # all in bucket 0
    rows = ljung_box(df, max_lag=3, with_p=False).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 1
    assert rows[0]["h"] == 0
    assert rows[0]["q_stat"] is None


# --- bigram entropy rate / seasonal strength (wave addendum) --------------

def test_bigram_entropy_deterministic_sequence(spark):
    """'a b a b ...' — every context fully determines the next word:
    H(w2|w1) = 0, info_gain = H(w2) = ln 2 (two equiprobable-ish
    next-words over the bigram stream)."""
    from mdataframe_spark.operators.text import bigram_entropy_rate

    docs = spark.createDataFrame(
        [(1, "a b " * 50)], "doc_id long, text string"
    )
    r = bigram_entropy_rate(docs).collect()[0]
    assert r["h_conditional"] == pytest.approx(0.0, abs=1e-9)
    assert r["info_gain"] == pytest.approx(r["h_unigram"], abs=1e-9)
    assert r["h_unigram"] > 0.69  # ~ln 2 over the near-balanced margin


def test_bigram_entropy_info_gain_nonneg_and_unk_cap(spark):
    from mdataframe_spark.operators.text import bigram_entropy_rate

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} common w{i+1} common x{i}") for i in range(30)],
        "doc_id long, text string",
    )
    r = bigram_entropy_rate(docs, vocab_cap=5).collect()[0]
    # plug-in MI is always >= 0; the <unk> cap bounds the grid
    assert r["info_gain"] >= -1e-9
    assert r["n_next_tokens"] <= 6  # capped vocab + <unk>


def test_seasonal_strength_periodic_vs_constant(spark):
    import numpy as np

    from mdataframe_spark.operators.timeseries import seasonal_strength

    H = 3_600_000_000_000
    # perfectly 24-periodic counts -> within-phase variance 0 -> 1.0
    pattern = [3 + (h % 24) for h in range(24 * 5)]
    rows = [(i * H + j,) for i, c in enumerate(pattern) for j in range(c)]
    df = spark.createDataFrame(rows, "ts long")
    r = seasonal_strength(df, cycle=24).collect()[0]
    assert r["n_phases"] == 24
    assert r["seasonal_strength"] == pytest.approx(1.0, abs=1e-9)
    # constant series -> SST 0 -> NULL strength
    flat = spark.createDataFrame(
        [(i * H + j,) for i in range(48) for j in range(5)], "ts long"
    )
    r2 = seasonal_strength(flat, cycle=24).collect()[0]
    assert r2["seasonal_strength"] is None
    # eta^2 against numpy on a mixed series
    mixed = [5 + (h % 24) + (3 if h % 7 == 0 else 0) for h in range(24 * 4)]
    rows3 = [(i * H + j,) for i, c in enumerate(mixed) for j in range(c)]
    r3 = seasonal_strength(
        spark.createDataFrame(rows3, "ts long"), cycle=24
    ).collect()[0]
    x = np.array(mixed, dtype=float)
    phases = np.arange(len(x)) % 24
    sst = ((x - x.mean()) ** 2).sum()
    ssw = sum(((x[phases == p] - x[phases == p].mean()) ** 2).sum()
              for p in range(24))
    assert r3["seasonal_strength"] == pytest.approx(
        (sst - ssw) / sst, abs=1e-6
    )
