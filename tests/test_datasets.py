"""Unit tests for the dataset-preparation operators (hash split,
sequence packing) and the Gopher repetition/quality text operators.

Extension surface — the reference (MarcoMernberger/mdataframe) has no
dataset-split, packing, or text-quality operators; its closest analog
is row-slicing pagination (mdataframe.py:1128-1140). Cross-engine
value parity for the corpus-level queries lives in
tests/test_extra_parity.py (txt_repetition, txt_gopher_filter,
ds_train_split, ds_pack_sequences).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from mdataframe_spark.operators.datasets import hash_split, pack_sequences
from mdataframe_spark.operators.text import gopher_rules, repetition_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the cat sat again", "en"),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (3, "x x x x x x x x x x x x", "en"),
        (4, "one two", "en"),
        (5, "1 2 3 4 %% ## !!", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------
def test_hash_split_deterministic_and_matches_md5(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()
    }
    # independently recompute the md5-prefix draw for every key
    for k, lbl in out.items():
        u = int(hashlib.md5(f"{k}:42".encode()).hexdigest()[:8], 16) / 2**32
        expect = "train" if u < 0.9 else ("val" if u < 0.95 else "test")
        assert lbl == expect, (k, u, lbl, expect)


def test_hash_split_stable_under_corpus_growth(spark):
    """A doc's split never changes when the corpus grows — the property
    that keeps held-out sets uncontaminated across dataset versions."""
    small = hash_split(spark.range(0, 100).withColumnRenamed("id", "doc_id"))
    big = hash_split(spark.range(0, 1000).withColumnRenamed("id", "doc_id"))
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(b[k] == v for k, v in s.items())


def test_hash_split_fractions_roughly_hold(spark):
    out = (
        hash_split(spark.range(0, 20000).withColumnRenamed("id", "doc_id"))
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r["split"]: r["count"] for r in out}
    assert abs(counts["train"] / 20000 - 0.9) < 0.02
    assert abs(counts["val"] / 20000 - 0.05) < 0.01
    assert abs(counts["test"] / 20000 - 0.05) < 0.01


def test_hash_split_seed_changes_assignment(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, seed=1).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, seed=2).collect()}
    assert any(a[k] != b[k] for k in a)


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------
def test_pack_sequences_contiguous_stream(spark):
    """Offsets reconstruct the concatenated token stream exactly:
    start(next doc) = start(prev) + len(prev) within each group."""
    rows = [(i, "g", 100 + 7 * i) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tok"])
    out = (
        pack_sequences(df, ["grp"], "n_tok", order_col="doc_id", capacity=256)
        .orderBy("doc_id")
        .collect()
    )
    pos = 0
    for r in out:
        assert r["bin_id"] == pos // 256
        assert r["bin_offset"] == pos % 256
        pos += r["n_tok"]


def test_pack_sequences_groups_independent(spark):
    rows = [(1, "a", 600), (2, "a", 10), (3, "b", 5), (4, "b", 5)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_tok"])
    out = {r["doc_id"]: r for r in pack_sequences(df, ["grp"], "n_tok", capacity=512).collect()}
    # doc 1 spans bins (600 > 512); doc 2 starts in bin 1 at offset 88
    assert (out[1]["bin_id"], out[1]["bin_offset"]) == (0, 0)
    assert (out[2]["bin_id"], out[2]["bin_offset"]) == (1, 600 - 512)
    # group b restarts from zero
    assert (out[3]["bin_id"], out[3]["bin_offset"]) == (0, 0)
    assert (out[4]["bin_id"], out[4]["bin_offset"]) == (0, 5)


# ---------------------------------------------------------------------------
# repetition_features
# ---------------------------------------------------------------------------
def test_repetition_known_values(spark, docs):
    out = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    # doc 3: 12 identical tokens. dup_word_frac = 1 - 1/12.
    r3 = out[3]
    assert r3["n_tokens"] == 12
    assert abs(r3["dup_word_frac"] - (1 - 1 / 12)) < 1e-9
    # dominant 2-gram "x x" occurs 11 times, len 3; 12 non-space chars
    assert abs(r3["top2gram_char_frac"] - (11 * 3) / 12) < 1e-9
    # every 5-gram "x x x x x" (8 occurrences, len 9) is duplicated
    assert abs(r3["dup5gram_char_frac"] - (8 * 9) / 12) < 1e-9
    # doc 2: all tokens distinct -> no repetition anywhere
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["dup5gram_char_frac"] == 0.0
    # doc 4: shorter than 5 tokens -> empty 5-gram set, zero not null
    assert out[4]["dup5gram_char_frac"] == 0.0


def test_repetition_preserves_rows(spark, docs):
    assert repetition_features(docs).count() == docs.count()


# ---------------------------------------------------------------------------
# gopher_rules
# ---------------------------------------------------------------------------
def test_gopher_rules_flags(spark, docs):
    out = {
        r["doc_id"]: r
        for r in gopher_rules(docs, min_tokens=5, min_mean_word_len=2.0).collect()
    }
    # doc 1 is clean english prose-ish: passes everything
    assert out[1]["keep"] is True
    # doc 4: only 2 tokens -> token-count rule fails
    assert out[4]["r_token_count"] is False and out[4]["keep"] is False
    # doc 5: no alphabetic words at all -> alpha rule fails
    assert out[5]["r_alpha_words"] is False
    # doc 3: "x" tokens, mean word len 1 -> mean-word-len rule fails
    assert out[3]["r_mean_word_len"] is False
    # doc 2: no english stopwords -> stopword rule fails
    assert out[2]["r_stopwords"] is False


def test_gopher_rules_symbol_ratio(spark):
    df = spark.createDataFrame(
        [(1, "see ... more ... below ... now ... then"), (2, "plain words here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, min_tokens=1).collect()}
    assert out[1]["r_symbol_ratio"] is False  # 4 ellipses / 8 tokens > 0.1
    assert out[2]["r_symbol_ratio"] is True


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------
def test_pii_scrub_redacts_and_counts(spark):
    from mdataframe_spark.operators.text import pii_scrub

    rows = [
        (1, "contact bob.smith+x@example.co.uk or visit https://ex.com/a?b=1 now"),
        (2, "server at 192.168.0.1 port open, call +1 (555) 123-4567 today"),
        (3, "nothing sensitive here at all"),
        (4, "two mails: a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    r1 = out[1]
    assert r1["n_pii_email"] == 1 and r1["n_pii_url"] == 1
    assert "<EMAIL>" in r1["text_scrubbed"] and "<URL>" in r1["text_scrubbed"]
    assert "bob.smith" not in r1["text_scrubbed"]
    assert "ex.com" not in r1["text_scrubbed"]

    r2 = out[2]
    assert r2["n_pii_ipv4"] == 1 and r2["n_pii_phone"] == 1
    assert "<IPV4>" in r2["text_scrubbed"] and "<PHONE>" in r2["text_scrubbed"]
    assert "192.168.0.1" not in r2["text_scrubbed"]

    r3 = out[3]
    assert r3["n_pii_total"] == 0
    assert r3["text_scrubbed"] == r3["text"]

    assert out[4]["n_pii_email"] == 2
    assert out[4]["n_pii_total"] == 2


def test_pii_scrub_email_not_eaten_as_phone(spark):
    """Digit-heavy emails must redact as EMAIL, not be half-consumed by
    the phone pattern (the documented kind ordering)."""
    from mdataframe_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail 12345678901@example.com please")], ["doc_id", "text"]
    )
    r = pii_scrub(df).collect()[0]
    assert r["n_pii_email"] == 1
    assert r["n_pii_phone"] == 0
    assert "<EMAIL>" in r["text_scrubbed"]


def test_pii_scrub_unknown_kind_rejected(spark):
    from mdataframe_spark.operators.text import pii_scrub

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pii_scrub(df, kinds=("email", "ssn"))


def test_domain_mixture_rates_and_sample(spark):
    """Rates hit the budget allocation exactly (capped at 1 for
    under-allocated domains); sampling is the deterministic hash
    filter restricted to those rates."""
    from mdataframe_spark.operators.datasets import (
        domain_mixture_rates,
        domain_mixture_sample,
    )

    rows = (
        [(f"a{i}", "A", 100) for i in range(50)]
        + [(f"b{i}", "B", 100) for i in range(10)]
        + [(f"c{i}", "C", 100) for i in range(40)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    # total 10_000 chars, budget 50% = 5_000
    # weights: A 0.5 -> 2500/5000 = 0.5; B 0.4 -> 2000/1000 capped 1.0;
    # C absent -> dropped
    rates = domain_mixture_rates(
        df, "lang", {"A": 0.5, "B": 0.4}, budget_fraction=0.5
    )
    assert rates == {"A": 0.5, "B": 1.0}
    got = domain_mixture_sample(
        df, "lang", {"A": 0.5, "B": 0.4}, budget_fraction=0.5
    )
    langs = {r["lang"] for r in got.collect()}
    assert "C" not in langs and "B" in langs
    # all of B kept (rate 1.0)
    assert got.filter("lang = 'B'").count() == 10


def test_leakage_safe_split_groups_stay_together(spark):
    """Every member of a near-dup component lands in the same split;
    documents outside any pair split independently by their own id."""
    from pyspark.sql import functions as F

    from mdataframe_spark.operators.datasets import hash_split, leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    # two components: {0,1,2} (chained) and {10, 11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"]
    )
    out = leakage_safe_split(docs, pairs, fractions={"train": 0.5, "test": 0.5})
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    assert by_id[0] == by_id[1] == by_id[2]
    assert by_id[10] == by_id[11]
    # singletons: identical to plain hash_split on their own id
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", {"train": 0.5, "test": 0.5}).collect()
    }
    for i in range(40):
        if i not in (0, 1, 2, 10, 11):
            assert by_id[i] == plain[i]


def test_leakage_safe_split_string_ids(spark):
    """String doc ids keep the no-leakage guarantee end-to-end (the
    component closure is id-type-generic; no silent bigint cast)."""
    from mdataframe_spark.operators.datasets import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"d{i:03d}", f"doc {i}") for i in range(40)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [("d000", "d001"), ("d001", "d002"), ("d010", "d011")],
        ["id_a", "id_b"],
    )
    out = leakage_safe_split(docs, pairs, fractions={"train": 0.5, "test": 0.5})
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    assert by_id["d000"] == by_id["d001"] == by_id["d002"]
    assert by_id["d010"] == by_id["d011"]


def test_leakage_safe_split_type_mismatch_raises(spark):
    import pytest

    from mdataframe_spark.operators.datasets import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"d{i}", f"doc {i}") for i in range(5)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    with pytest.raises(TypeError, match="leakage_safe_split"):
        leakage_safe_split(docs, pairs)


def test_importance_sample_matches_independent_md5_draw(spark):
    """Keep decision = u(key) < round(min(weight, 1), 6), recomputed
    independently per row with hashlib."""
    from mdataframe_spark.operators.datasets import importance_sample

    rows = [(i, (i % 7) / 5.0) for i in range(400)]  # weights 0..1.2
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = {r["doc_id"]: r["kept"] for r in importance_sample(df, "w").collect()}
    for k, w in rows:
        u = int(hashlib.md5(f"{k}:43".encode()).hexdigest()[:8], 16) / 2**32
        assert out[k] == (u < round(min(w, 1.0), 6)), (k, w, u)


def test_importance_sample_null_weight_is_false_not_null(spark):
    """A null weight keeps with probability 0 AND the kept column is
    two-valued — filter(kept) and groupBy(kept) must agree on every
    row (a bare u < null would be null: three-valued drift)."""
    from mdataframe_spark.operators.datasets import importance_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 0.9), (4, None)], ["doc_id", "w"]
    )
    out = importance_sample(df, "w")
    rows = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert rows[2] is False and rows[4] is False  # False, never None
    n_true = out.filter("kept").count()
    n_false = out.filter("NOT kept").count()
    assert n_true + n_false == 4  # no third truth value
    by_group = {r["kept"]: r["c"] for r in out.groupBy("kept").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    assert by_group.get(True, 0) == n_true and by_group[False] == n_false


def test_importance_sample_stable_under_corpus_growth(spark):
    from mdataframe_spark.operators.datasets import importance_sample

    small = spark.createDataFrame([(i, 0.5) for i in range(100)], ["doc_id", "w"])
    big = spark.createDataFrame([(i, 0.5) for i in range(1000)], ["doc_id", "w"])
    s = {r["doc_id"]: r["kept"] for r in importance_sample(small, "w").collect()}
    b = {r["doc_id"]: r["kept"] for r in importance_sample(big, "w").collect()}
    assert all(b[k] == v for k, v in s.items())


def test_balance_shards_matches_independent_serpentine(spark):
    """The distributed bucketed-rank path reproduces a driver-side
    serpentine assignment computed independently, and the max-min
    shard load is bounded by the largest single weight."""
    from mdataframe_spark.operators.datasets import balance_shards

    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 500)) for i in range(400)]
    # inject weight ties to exercise the tie-break + shared-bucket path
    rows += [(1000 + i, 250) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "w"]).repartition(9)
    n = 5
    out = {
        r["doc_id"]: r["shard"]
        for r in balance_shards(df, n, weight_col="w").collect()
    }

    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    exp = {}
    for g, (i, _) in enumerate(order):
        rnd, pos = divmod(g, n)
        exp[i] = pos if rnd % 2 == 0 else n - 1 - pos
    assert out == exp

    loads = {s: 0 for s in range(n)}
    for i, w in rows:
        loads[out[i]] += w
    assert max(loads.values()) - min(loads.values()) <= max(w for _, w in rows)


def test_balance_shards_deterministic_across_partitionings(spark):
    from mdataframe_spark.operators.datasets import balance_shards

    rows = [(i, (i * 37) % 91 + 1) for i in range(300)]
    df1 = spark.createDataFrame(rows, ["doc_id", "w"]).coalesce(1)
    df2 = spark.createDataFrame(rows, ["doc_id", "w"]).repartition(13)
    a = {r["doc_id"]: r["shard"] for r in balance_shards(df1, 4, "w").collect()}
    b = {r["doc_id"]: r["shard"] for r in balance_shards(df2, 4, "w").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------
def _dsir_py_weight(text, raw_texts, target_texts, n_buckets, alpha, seed):
    """Independent pure-Python recomputation of the DSIR log weight —
    same published formula, none of the Spark code."""
    import math
    import re

    def grams(t):
        toks = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower()).strip()).split(" ")
        toks = [x for x in toks if x != ""]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(f"{g}:{seed}".encode()).hexdigest()[:8], 16) % n_buckets

    rc, tc = {}, {}
    r_total = t_total = 0
    for t in raw_texts:
        for g in grams(t):
            rc[bucket(g)] = rc.get(bucket(g), 0) + 1
            r_total += 1
    for t in target_texts:
        for g in grams(t):
            tc[bucket(g)] = tc.get(bucket(g), 0) + 1
            t_total += 1
    w = 0.0
    for g in grams(text):
        b = bucket(g)
        lr = round(
            (math.log(tc.get(b, 0) + alpha) - math.log(t_total + alpha * n_buckets))
            - (math.log(rc.get(b, 0) + alpha) - math.log(r_total + alpha * n_buckets)),
            9,
        )
        w += lr
    return round(w, 6)


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    # two disjoint vocabularies: docs 0-19 "wiki-like" (the target),
    # docs 20-39 "spam-like"
    rows = []
    for i in range(20):
        rows.append((i, f"history of science volume {i} covers physics and chemistry", "en"))
    for i in range(20, 40):
        rows.append((i, f"click here winner {i} free prize casino jackpot now", "xx"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_dsir_weights_separate_target_like_docs(spark, dsir_corpus):
    from mdataframe_spark.operators.datasets import (
        dsir_bucket_logratios,
        dsir_weights,
    )

    target = dsir_corpus.filter(F.col("lang") == "en")
    ratios = dsir_bucket_logratios(
        dsir_corpus, target, n_buckets=64, alpha=1.0, seed=11
    )
    assert ratios.count() == 64
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(dsir_corpus, ratios, n_buckets=64, seed=11).collect()
    }
    wiki = [w[i] for i in range(20)]
    spam = [w[i] for i in range(20, 40)]
    # every target-vocabulary doc outweighs every spam doc
    assert min(wiki) > max(spam)

    # pin one weight of each class to the independent recomputation
    rows = {r["doc_id"]: r["text"] for r in dsir_corpus.collect()}
    raw_texts = [rows[i] for i in sorted(rows)]
    target_texts = [rows[i] for i in range(20)]
    for probe in (3, 25):
        expect = _dsir_py_weight(rows[probe], raw_texts, target_texts, 64, 1.0, 11)
        assert abs(w[probe] - expect) < 2e-6, (probe, w[probe], expect)


def test_dsir_gumbel_topk_deterministic(spark, dsir_corpus):
    import math

    from mdataframe_spark.operators.datasets import dsir_select

    target = dsir_corpus.filter(F.col("lang") == "en")
    sel = dsir_select(dsir_corpus, target, k=10, n_buckets=64, seed=11)
    got = sel.collect()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids)) == 10
    # selection is deterministic across re-execution
    again = [r["doc_id"] for r in dsir_select(
        dsir_corpus, target, k=10, n_buckets=64, seed=11).collect()]
    assert ids == again
    # gumbel key replays from the md5 draw (gumbel seed = seed + 1)
    r0 = got[0]
    u = (int(hashlib.md5(f"{r0['doc_id']}:12".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
    expect = round(r0["dsir_logweight"] + round(-math.log(-math.log(u)), 9), 6)
    assert abs(r0["gumbel_key"] - expect) < 2e-6
    # weights dominated by the target vocabulary: most picks are wiki docs
    assert sum(1 for i in ids if i < 20) >= 8


# ---------------------------------------------------------------------------
# chunk_documents / ccnet_perplexity_buckets
# ---------------------------------------------------------------------------
def test_chunk_documents_exact(spark):
    from mdataframe_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(1, 11)]  # 10 tokens
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c"), (3, "   ")], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=2)
    rows = sorted(
        [(r["doc_id"], r["chunk_id"], r["start_token"], r["chunk_text"]) for r in out.collect()]
    )
    # doc 1: starts 1,3,5,7 (9 dropped: window [7..10] already reached
    # the end, 9+overlap-1 >= 10); doc 2 one window; doc 3 empty -> none
    assert rows == [
        (1, 0, 1, "t1 t2 t3 t4"),
        (1, 1, 3, "t3 t4 t5 t6"),
        (1, 2, 5, "t5 t6 t7 t8"),
        (1, 3, 7, "t7 t8 t9 t10"),
        (2, 0, 1, "a b c"),
    ]
    ns = {(r["doc_id"], r["chunk_id"]): r["n_chunk_tokens"] for r in out.collect()}
    assert ns[(2, 0)] == 3 and ns[(1, 3)] == 4

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_ccnet_buckets_partition_and_rates(spark):
    from mdataframe_spark.operators.text import ccnet_perplexity_buckets

    # 30 docs: 10 made of very common tokens, 10 mixed, 10 near-unique
    rows = []
    for i in range(10):
        rows.append((i, "the the the of of and and to in is"))
    for i in range(10, 20):
        rows.append((i, f"the of common mixed word{i} token{i} and to"))
    for i in range(20, 30):
        rows.append((i, f"zzq{i} xkcd{i} qwfp{i} vbnm{i} uniq{i} rare{i}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ccnet_perplexity_buckets(df, vocab_cap=512, alpha=0.5).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert len(out) == 30
    # score ordering respects bucket boundaries
    assert min(r["mean_logp"] for r in by_bucket["head"]) >= max(
        r["mean_logp"] for r in by_bucket["middle"]
    )
    assert min(r["mean_logp"] for r in by_bucket["middle"]) >= max(
        r["mean_logp"] for r in by_bucket["tail"]
    )
    # the common-token docs score best; keep policy: head always kept
    assert all(r["kept"] for r in by_bucket["head"])
    head_ids = {r["doc_id"] for r in by_bucket["head"]}
    assert head_ids <= set(range(10)) or len(head_ids & set(range(10))) >= 8


def test_negative_samples_deterministic_and_self_free(spark):
    from mdataframe_spark.operators.datasets import negative_samples

    df = spark.range(10).select(F.col("id").alias("vec_id"))
    out = negative_samples(df, k=4, seed=7).collect()
    # k rows per anchor, no self-negatives, ids in range
    assert len(out) == 40
    for r in out:
        assert r["neg_id"] != r["vec_id"]
        assert 0 <= r["neg_id"] < 10
    # deterministic across re-execution and partitionings
    again = negative_samples(df.repartition(7), k=4, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # md5 replay of one draw
    r0 = sorted(out)[0]
    h = int(hashlib.md5(f"{r0['vec_id']}:{r0['neg_rank']}:7".encode()).hexdigest()[:8], 16) % 10
    expect = (h + 1) % 10 if h == r0["vec_id"] else h
    assert r0["neg_id"] == expect

    # sparse id space fails loudly
    sparse = spark.createDataFrame([(0,), (5,)], "vec_id int")
    with pytest.raises(ValueError, match="dense"):
        negative_samples(sparse, k=2)


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights (round 7)
# ---------------------------------------------------------------------------
def test_temperature_weights_hand_computed(spark):
    import math

    from mdataframe_spark.operators.datasets import temperature_weights

    # shares: a=0.8, b=0.2
    rows = [("a", 80), ("b", 20)]
    df = spark.createDataFrame(rows, "src string, n_chars bigint")
    w = temperature_weights(df, "src", temperature=2.0, token_col="n_chars")
    pa, pb = math.sqrt(0.8), math.sqrt(0.2)
    assert w["a"] == round(pa / (pa + pb), 9)
    assert w["b"] == round(pb / (pa + pb), 9)
    assert abs(sum(w.values()) - 1.0) < 1e-8
    # minority upweighted vs natural share, majority downweighted
    assert w["b"] > 0.2 and w["a"] < 0.8


def test_temperature_weights_limits(spark):
    import pytest as _pytest

    from mdataframe_spark.operators.datasets import temperature_weights

    rows = [("a", 90), ("b", 10)]
    df = spark.createDataFrame(rows, "src string, n_chars bigint")
    # T=1 reproduces natural proportions
    w1 = temperature_weights(df, "src", temperature=1.0, token_col="n_chars")
    assert w1["a"] == 0.9 and w1["b"] == 0.1
    # large T tends to uniform
    w100 = temperature_weights(
        df, "src", temperature=100.0, token_col="n_chars"
    )
    assert abs(w100["a"] - 0.5) < 0.01
    with _pytest.raises(ValueError):
        temperature_weights(df, "src", temperature=0.0, token_col="n_chars")
