"""Distributed BPE tokenizer training and encoding.

Extends the reference's capability surface (it has no tokenizer; its
token-adjacent surface is the whitespace/regex counters in
operators/text.py) with the canonical LLM-pipeline tokenizer: byte-pair
encoding (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units", §3.2 learn_bpe).

Scale design, in the shape every production BPE trainer uses
(subword-nmt, fastBPE, sentencepiece):

1. **The word-count table is the sufficient statistic.** Pair
   frequencies are a deterministic function of (word, count) — two
   documents contribute identically to training once their words are
   counted. So the corpus-sized work is ONE distributed
   groupBy(word) + a distributed top-K (TakeOrderedAndProject), and
   only the capped count table (``word_cap`` rows, a few MB) reaches
   the driver. At 100 TB the scan and shuffle are corpus-bounded; the
   merge loop is vocabulary-bounded and runs where every published
   trainer runs it.
2. **Merge selection is the classic incremental algorithm**: maintain
   pair→count and pair→words indices, pick argmax (count desc, pair
   lexicographic for determinism), rewrite only the words containing
   the winning pair.
3. **Encoding is distributed and Arrow-batched**: the merge ranks are
   a broadcast dict; ``mapInPandas`` encodes whole batches with a
   per-batch word cache (Zipf makes the cache hit rate ~99%), so the
   per-unique-word cost is paid once per batch, not per occurrence.

Determinism: counts are exact integers; ties in both the vocabulary
truncation and the merge argmax break lexicographically; the encoder is
a pure function of (merges, word). Bit-identical across partitionings.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = r"\s+"
_PUNCT = r"[^\w\s]"

END_OF_WORD = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", word_cap: int | None = None
) -> DataFrame:
    """Corpus word-frequency table: normalize (lower, strip
    punctuation), split, explode, one groupBy(word). With ``word_cap``
    the result is the deterministic top-K (count desc, word asc) via
    orderBy+limit, which Spark executes as TakeOrderedAndProject
    (per-partition heaps, K rows to the driver merge) — never a global
    sort of the distinct-word table."""
    toks = df.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, "")),
                _WS,
            )
        ).alias("word")
    ).filter(F.col("word") != "")
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    if word_cap is not None:
        counts = counts.orderBy(
            F.col("count").desc(), F.col("word").asc()
        ).limit(word_cap)
    return counts


def _pair_stats(vocab: dict) -> Tuple[dict, dict]:
    """pair -> total count and pair -> set of words containing it,
    from a {symbol-tuple: count} vocabulary."""
    pairs: dict = {}
    where: dict = {}
    for word, c in vocab.items():
        for a, b in zip(word, word[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + c
            where.setdefault((a, b), set()).add(word)
    return pairs, where


def _merge_word(word: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    a, b = pair
    out: List[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    word_cap: int = 1 << 20,
    end_of_word: str = END_OF_WORD,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    The distributed phase is :func:`word_counts` (the sufficient
    statistic, capped to the ``word_cap`` most frequent words — the
    convention of every published trainer; the dropped Zipf tail
    perturbs pair counts by at most its own mass). The merge loop runs
    driver-side over that table with incremental pair-index updates:
    each merge touches only the words that contain the winning pair.

    Returns the merge list in rank order; feed to :func:`bpe_encode`.
    """
    rows = word_counts(df, text_col=text_col, word_cap=word_cap).collect()
    # deterministic iteration order regardless of collect order
    items = sorted(((r["word"], int(r["count"])) for r in rows))
    vocab = {tuple(w) + (end_of_word,): c for w, c in items}

    pairs, where = _pair_stats(vocab)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        # argmax with lexicographic tie-break -> deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 1:
            break
        merges.append(best)
        for word in sorted(where.get(best, ())):
            c = vocab.pop(word)
            new_word = _merge_word(word, best)
            # retract old pair contributions, add new ones
            for p in zip(word, word[1:]):
                pairs[p] -= c
                if pairs[p] <= 0:
                    pairs.pop(p, None)
                ws = where.get(p)
                if ws is not None:
                    ws.discard(word)
                    if not ws:
                        where.pop(p, None)
            vocab[new_word] = vocab.get(new_word, 0) + c
            for p in zip(new_word, new_word[1:]):
                pairs[p] = pairs.get(p, 0) + c
                where.setdefault(p, set()).add(new_word)
    return merges


def encode_word(
    word: str, ranks: dict, end_of_word: str = END_OF_WORD
) -> List[str]:
    """Pure-function BPE encode of one word under a {pair: rank} dict:
    repeatedly merge the lowest-ranked adjacent pair (the standard
    greedy decoder, identical to subword-nmt/GPT-2's ``bpe()``)."""
    symbols = list(word) + [end_of_word]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "tokens",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Encode every document into BPE subword tokens.

    Distributed and Arrow-batched: the merge ranks ride to executors as
    a broadcast variable (one copy per executor, not per task);
    ``mapInPandas`` encodes each Arrow batch with a per-batch
    word→tokens cache so the greedy merge loop runs once per DISTINCT
    word per batch. Adds ``out_col`` (array<string>) and
    ``n_bpe_tokens``; all input columns pass through.
    """
    spark = df.sparkSession
    ranks_b = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out_col, T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )
    import re

    punct = re.compile(_PUNCT)
    ws = re.compile(_WS)

    def encode_batches(batches: Iterable) -> Iterable:
        ranks = ranks_b.value
        cache: dict = {}

        def enc(text) -> List[str]:
            if text is None:
                return []
            out: List[str] = []
            for w in ws.split(punct.sub("", text.lower()).strip()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks, end_of_word)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            pdf = pdf.copy()
            pdf[out_col] = toks
            pdf["n_bpe_tokens"] = toks.map(len)
            yield pdf

    return df.mapInPandas(encode_batches, schema)
