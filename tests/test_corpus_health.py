"""Unit tests for the corpus-health & sketch wave: source KL
divergence, normalization collisions (operators/text.py) and the
Bloom decontamination filter (operators/sketches.py). Cross-engine
hash parity runs in the EXTRA registry; these pin semantics.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.sketches import bloom_contamination
from mdataframe_spark.operators.text import (
    ngram_contamination,
    normalization_collisions,
    source_token_divergence,
)


# ---------------------------------------------------------------------------
# source KL divergence
# ---------------------------------------------------------------------------
def test_source_kl_identical_groups_near_zero(spark):
    text = "alpha beta gamma delta " * 10
    df = spark.createDataFrame(
        [(1, text, "a"), (2, text, "b")], ["doc_id", "text", "source"]
    )
    out = {r["source"]: r for r in source_token_divergence(df).collect()}
    # same distribution on both sides: KL is exactly the smoothing
    # residue, which is 0 here because p == q term-by-term
    assert out["a"]["kl_vs_corpus"] == pytest.approx(0.0, abs=1e-9)
    assert out["b"]["kl_vs_corpus"] == pytest.approx(0.0, abs=1e-9)
    assert out["a"]["n_vocab_tokens"] == 40


def test_source_kl_skewed_group_positive(spark):
    rows = [(1, "common words shared by every source here", "base")] * 5 + [
        (2, "zzz zzz zzz zzz zzz zzz zzz zzz", "weird")
    ]
    df = spark.createDataFrame(
        [(i, t, s) for i, (_, t, s) in enumerate(rows)],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in source_token_divergence(df).collect()}
    assert out["weird"]["kl_vs_corpus"] > out["base"]["kl_vs_corpus"]
    assert out["weird"]["kl_vs_corpus"] > 0.5


# ---------------------------------------------------------------------------
# normalization collisions
# ---------------------------------------------------------------------------
def test_normalization_collisions_fixture(spark):
    rows = [
        (1, "Hello,   World!"),
        (2, "hello world"),        # merges with 1 after normalization
        (3, "hello world"),        # exact dup of 2
        (4, "something else"),     # singleton: filtered out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = normalization_collisions(df).collect()
    assert len(out) == 1
    g = out[0]
    assert g["n_docs"] == 3
    # two raw variants: "Hello,   World!" and the duplicated "hello world"
    assert g["n_raw_variants"] == 2
    assert g["rep_id"] == 1
    assert g["newly_merged"] is True


def test_normalization_collisions_exact_dup_not_newly_merged(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], ["doc_id", "text"]
    )
    g = normalization_collisions(df).first()
    assert g["n_docs"] == 2 and g["n_raw_variants"] == 1
    assert g["newly_merged"] is False


# ---------------------------------------------------------------------------
# Bloom contamination
# ---------------------------------------------------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bloom_no_false_negatives_and_probe_formula(spark):
    shared = "one two three four five"
    train = _docs(
        spark,
        [
            (1, f"prefix {shared} suffix tokens here"),
            (2, "totally different words without any overlap at all"),
        ],
    )
    ev = spark.createDataFrame(
        [(100, f"{shared} and more evaluation text")], ["eval_id", "text"]
    )
    m, k = 1 << 16, 3
    out = {
        r["doc_id"]: r
        for r in bloom_contamination(
            train, ev, n=5, m=m, n_hashes=k
        ).collect()
    }
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(train, ev, n=5).collect()
    }
    # the guarantee: every exactly-contaminated doc is bloom-flagged
    assert out[1]["bloom_contaminated"] is True and exact[1] is True
    # pure-python replica of the filter agrees on the shared gram
    positions = set()
    ev_grams = set()
    toks = "one two three four five and more evaluation text".split()
    for i in range(len(toks) - 4):
        ev_grams.add(" ".join(toks[i : i + 5]))
    for g in ev_grams:
        for i in range(k):
            positions.add(
                int(hashlib.md5(f"{g}:{i}".encode()).hexdigest()[:15], 16) % m
            )

    def probe(g):
        return all(
            int(hashlib.md5(f"{g}:{i}".encode()).hexdigest()[:15], 16) % m
            in positions
            for i in range(k)
        )

    assert probe(shared) is True
    # doc 2 has no shared gram; with m=65536 and ~5 eval grams the FP
    # odds are ~(15/65536)^3 — flag must be off
    assert out[2]["bloom_contaminated"] is False


def test_bloom_counts_match_exact_when_no_fp(spark):
    train = _docs(
        spark, [(1, "a b c d e f g h"), (2, "p q r s t u v w")]
    )
    ev = spark.createDataFrame([(9, "c d e f g")], ["eval_id", "text"])
    bloom = {
        r["doc_id"]: r
        for r in bloom_contamination(train, ev, n=5, m=1 << 16).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in ngram_contamination(train, ev, n=5).collect()
    }
    for d in (1, 2):
        assert bloom[d]["n_grams"] == exact[d]["n_grams"]
        assert bloom[d]["n_hit_grams_bloom"] == exact[d]["n_hit_grams"]


def test_pmi_collocations_detects_fixed_phrase(spark):
    from mdataframe_spark.operators.text import pmi_collocations

    # "hong kong" always adjacent; filler words shuffled around it
    rows = [
        (i, f"alpha hong kong beta w{i % 3} gamma hong kong delta")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["word_a"], r["word_b"]): r
        for r in pmi_collocations(df, min_count=5).collect()
    }
    assert ("hong", "kong") in out
    hk = out[("hong", "kong")]
    assert hk["n_ab"] == 20 and hk["n_a"] == 20 and hk["n_b"] == 20
    # the fixed phrase must out-PMI any filler-word bigram
    assert all(
        hk["pmi"] >= r["pmi"] for r in out.values()
    )
    import math
    # closed-form: 10 docs x 9 tokens -> n_uni = 90, n_bi = 80
    expect = math.log((20 / 80) / ((20 / 90) * (20 / 90)))
    assert hk["pmi"] == pytest.approx(expect, abs=1e-5)
