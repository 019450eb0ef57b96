"""BPE tokenizer: trainer vs a naive recount-from-scratch reference,
the canonical Sennrich fixture, greedy-encode/training-segmentation
equivalence, Arrow-batched Spark encode parity, and determinism
across partitionings."""

from collections import Counter

import pytest

from mdataframe_spark.operators.tokenizer import (
    END_OF_WORD,
    _merge_word,
    bpe_encode,
    encode_word,
    train_bpe,
    word_counts,
)


def naive_train(word_count_items, num_merges):
    """Independent O(V·merges) reference: recount every pair from
    scratch each iteration (Sennrich 2016 fig. 1, unoptimized)."""
    vocab = {
        tuple(w) + (END_OF_WORD,): c for w, c in sorted(word_count_items)
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for word, c in vocab.items():
            for p in zip(word, word[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(w, best): c for w, c in vocab.items()}
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def sennrich_df(spark):
    # one doc per word occurrence keeps the distributed count honest
    rows, i = [], 0
    for w, c in SENNRICH:
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return _df(spark, rows)


def test_train_matches_naive_reference(sennrich_df):
    got = train_bpe(sennrich_df, num_merges=10)
    exp = naive_train(SENNRICH, 10)
    assert got == exp
    # the canonical first merges of the Sennrich example
    assert got[:2] == [("e", "s"), ("es", "t")]


def test_train_deterministic_across_partitionings(sennrich_df):
    one = train_bpe(sennrich_df.coalesce(1), num_merges=8)
    many = train_bpe(sennrich_df.repartition(7), num_merges=8)
    assert one == many


def test_greedy_encode_equals_training_segmentation(sennrich_df):
    """For every training word, the rank-greedy encoder reproduces the
    segmentation obtained by replaying the merges in rank order (the
    standard BPE encode/train equivalence)."""
    merges = train_bpe(sennrich_df, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in SENNRICH:
        replay = tuple(w) + (END_OF_WORD,)
        for m in merges:
            replay = _merge_word(replay, m)
        assert tuple(encode_word(w, ranks)) == replay, w


def test_encode_word_roundtrip_and_unknowns():
    merges = [("a", "b"), ("ab", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("abc", ranks) == ["abc", END_OF_WORD]
    assert encode_word("abx", ranks) == ["ab", "x", END_OF_WORD]
    assert encode_word("zzz", ranks) == ["z", "z", "z", END_OF_WORD]
    # concatenation minus the marker reproduces the word
    for w in ("abc", "abx", "zzz", "abcabc"):
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(END_OF_WORD, "") == w


def test_spark_encode_matches_python(spark, sennrich_df):
    merges = train_bpe(sennrich_df, num_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = _df(
        spark,
        [
            (1, "Low, lower!  NEWEST"),
            (2, "widest unknownword"),
            (3, ""),
            (4, None),
        ],
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}

    def py_encode(text):
        import re

        toks = []
        for w in re.split(r"\s+", re.sub(r"[^\w\s]", "", (text or "").lower()).strip()):
            if w:
                toks.extend(encode_word(w, ranks))
        return toks

    for i, text in [(1, "Low, lower!  NEWEST"), (2, "widest unknownword"), (3, ""), (4, None)]:
        exp = py_encode(text)
        assert list(out[i]["tokens"]) == exp, i
        assert out[i]["n_bpe_tokens"] == len(exp)
    # passthrough of input columns
    assert out[2]["text"] == "widest unknownword"


def test_word_counts_cap_deterministic(spark):
    df = _df(spark, [(1, "b b a a c"), (2, "c d")])
    # counts: a=2, b=2, c=2, d=1; cap=2 keeps (a,2),(b,2) by tie-break
    rows = sorted(
        (r["word"], r["count"])
        for r in word_counts(df, word_cap=2).collect()
    )
    assert rows == [("a", 2), ("b", 2)]
