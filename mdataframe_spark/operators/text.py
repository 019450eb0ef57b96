"""Text-analysis operators for large-scale document pipelines.

These extend the reference's capability surface (it has no text
operators) with the standard LLM-training-data text metrics, each as
pure `pyspark.sql.functions` column expressions — no Python UDFs, so
they stay inside whole-stage codegen and scale linearly with the scan.

Operators: token counting, quality features (length / punctuation /
stopword ratios), a heuristic language scorer, and document
fingerprinting (normalized-text hash).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import persist_tracked as _persist_tracked

# small, fixed stopword lists per language: enough signal for an n-gram /
# stopword-hit heuristic, cheap enough to inline as literals
STOPWORDS: Dict[str, Sequence[str]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "du"),
}

_WS = r"\s+"
_PUNCT = r"[^\w\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(text), _WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Number of stopword occurrences of ``lang`` in ``text``.

    A single word-boundary ``regexp_count`` — one codegen'd expression,
    no explode/shuffle.  (The natural higher-order ``F.filter(tokens,
    isin)`` form is interpreted per element — CodegenFallback — and was
    measured ~4-5x slower; see language_scores for the explode variant.)
    Word-boundary semantics: ``'a,'`` counts as a hit for ``'a'``.
    """
    pattern = r"\b(?:" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach standard quality-scoring features:

    n_chars, n_tokens, avg_token_len, punct_ratio (punctuation chars /
    chars), stopword_ratio (english stopword hits / tokens), and a
    composite quality_score in [0,1]. All codegen'd expressions.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    punct_chars = n_chars - F.length(F.regexp_replace(t, _PUNCT, ""))
    stop_ratio = stopword_hits(t, "en") / n_tokens
    avg_tok = (F.length(F.regexp_replace(t, _WS, ""))) / n_tokens
    score = (
        F.when(n_tokens < 5, 0.0)
        .otherwise(
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
            + (1.0 - F.least(punct_chars / n_chars * 5.0, F.lit(1.0))) * 0.3
            + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        )
    )
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("bigint"),
            "n_tokens": n_tokens.cast("bigint"),
            "avg_token_len": avg_tok,
            "punct_ratio": punct_chars / n_chars,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def language_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: stopword-hit rate per candidate language,
    predicted language = argmax (ties broken by language code order).

    Implementation: explode tokens once and count hits per language as
    conditional aggregates — fully codegen'd with map-side combine.
    (The natural higher-order `filter(toks, isin)` form is interpreted
    per element in Spark and was 4-5x slower.) The token shuffle
    carries only (id, token); the result joins back on the id.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.count(F.when(F.col("__tok").isin(list(words)), 1)).alias(f"__hits_{lang}")
        for lang, words in STOPWORDS.items()
    ]
    counted = toks.groupBy(id_col).agg(*aggs)
    scores = {
        f"score_{lang}": F.col(f"__hits_{lang}") / F.col("__n") for lang in STOPWORDS
    }
    counted = counted.withColumns(scores).drop(
        "__n", *[f"__hits_{lang}" for lang in STOPWORDS]
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.lit(None).cast("string")
    # first language (sorted) achieving the max wins — deterministic
    for lang in sorted(STOPWORDS):
        pred = F.when(
            pred.isNull() & (F.col(f"score_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    counted = counted.withColumn("predicted_lang", pred)
    return df.join(counted, id_col)


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs, whitespace-attached words. A portable
# approximation of BPE pre-tokenization — counts the units a BPE
# tokenizer would split on, without a vocabulary.
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(text: Column) -> Column:
    """Count BPE-pre-tokenizer units via regexp extraction (north-star
    'token counting: whitespace + a BPE-ish regex')."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), 0))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    cleaned = F.regexp_replace(F.lower(text), _PUNCT, "")
    return F.trim(F.regexp_replace(cleaned, _WS, " "))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text.

    Near-identical documents (case/punctuation/whitespace variants)
    collide — the cheap first pass before MinHash/SimHash near-dup.
    """
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003): hash every character k-gram of the normalized text with a
    rolling window of ``window`` grams, keep each window's minimum hash
    (rightmost on ties — the standard winnowing guarantee), emit the
    distinct selected hashes per document.

    Unlike the whole-document fingerprint (md5 of the full text), the
    winnowed set detects PARTIAL overlap: any shared substring of
    length >= k + window - 1 contributes at least one common selected
    hash. Everything is integer arithmetic on md5 prefixes — zero
    floating point, so cross-engine comparison is exact by
    construction. Scale shape: shingle explode + two window passes over
    per-document partitions + one distinct — shuffle keys are
    (doc, position), never all-pairs.
    """
    from pyspark.sql import Window as W

    norm = normalize_text(F.col(text_col))
    grams = (
        df.select(F.col(id_col), norm.alias("__norm"))
        .filter(F.length("__norm") >= k)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(__norm) - {k} + 1), "
                    f"i -> substring(__norm, i, {k}))"
                )
            ).alias("pos", "gram"),
        )
    )
    # 32-bit hash packed with the reversed 31-bit position: the window
    # MIN then selects (smallest hash, rightmost position) in one pass.
    # Width audit: max key = (2^32-1)*2^31 + (2^31-1) = 2^63-1 — exactly
    # the signed-bigint ceiling — and positions can never reach 2^31
    # (a string column itself caps at 2^31-1 chars), so the position
    # field cannot go negative and borrow into the hash bits at ANY
    # document length (a 20-bit field silently corrupted keys for
    # documents past ~1M grams).
    key = (
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint")
        * F.lit(1 << 31)
        + (F.lit((1 << 31) - 1) - F.col("pos"))
    )
    w_count = W.partitionBy(id_col)
    w_roll = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    selected = (
        grams.withColumn("__key", key)
        .withColumn("__n", F.count(F.lit(1)).over(w_count))
        .withColumn("__sel", F.min("__key").over(w_roll))
        # only full windows (the winnowing guarantee needs them);
        # posexplode positions are 0-based
        .filter(F.col("pos") <= F.col("__n") - window)
        # integer shift, NOT division: the packed key exceeds a
        # double's 53-bit mantissa, so "/" would corrupt the hash
        .select(id_col, F.shiftright("__sel", 31).alias("fp"))
        .distinct()
    )
    return selected


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style)
# ---------------------------------------------------------------------------
def _word_ngrams(ws: Column, n: int) -> Column:
    """Word n-grams of an array column as space-joined strings.

    Guarded for short documents: fewer than ``n`` tokens yields an
    empty array (``sequence(0, -k)`` would otherwise count DOWN).

    PERF: pass a COLUMN holding the token array, not an inline
    ``split(...)`` expression — the transform lambda's ``element_at``
    calls each re-evaluate an inline argument in the interpreted
    higher-order path (measured 10x on ngram_contamination).
    """
    if n == 1:
        return ws
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(ws) >= n, gram).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021, §A1.1) per doc:

    - ``dup_word_frac``: 1 - distinct(words)/words — pure array
      expression, no shuffle.
    - ``top{top_n}gram_char_frac``: char coverage of the dominant
      ``top_n``-gram — ``max(count * charlen(gram))`` over the doc's
      grams, normalized by the doc's non-space char count. The
      ``cnt*len`` maximand makes the statistic a scalar max (no
      argmax tie-break to replicate cross-engine).
    - ``dup{dup_n}gram_char_frac``: char coverage of all repeated
      ``dup_n``-grams — ``sum(count * charlen)`` over grams with
      count >= 2, same normalizer. (Overlapping occurrences are each
      counted, a documented simplification of Gopher's
      non-overlapping char coverage.)

    Plan shape: one explode per n, shuffled on ``(doc, gram)`` with
    map-side partial aggregation, reduced to one row per doc and
    joined back — linear in corpus size, no driver state.
    """
    ws = tokens(F.trim(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        F.length(F.regexp_replace(F.col(text_col), _WS, "")).alias("__chars"),
    )

    def gram_cover(n: int, agg_dup: bool) -> DataFrame:
        g = base.select(
            id_col, F.explode(_word_ngrams(F.col("__ws"), n)).alias("__g")
        )
        counted = g.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
        cover = F.col("__c") * F.length("__g")
        if agg_dup:
            expr = F.sum(F.when(F.col("__c") >= 2, cover).otherwise(0))
        else:
            expr = F.max(cover)
        return counted.groupBy(id_col).agg(expr.alias(f"__cover_{n}"))

    top = gram_cover(top_n, agg_dup=False)
    dup = gram_cover(dup_n, agg_dup=True)
    out = (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.size("__ws").cast("bigint").alias("n_tokens"),
            (1.0 - F.size(F.array_distinct("__ws")) / F.size("__ws")).alias(
                "dup_word_frac"
            ),
            (F.coalesce(F.col(f"__cover_{top_n}"), F.lit(0)) / F.col("__chars")).alias(
                f"top{top_n}gram_char_frac"
            ),
            (F.coalesce(F.col(f"__cover_{dup_n}"), F.lit(0)) / F.col("__chars")).alias(
                f"dup{dup_n}gram_char_frac"
            ),
        )
    )
    return df.join(out, id_col)


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------
def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_stopwords: int = 2,
    min_alpha_word_frac: float = 0.8,
) -> DataFrame:
    """Gopher quality-filter rule battery (Rae et al. 2021, §A1.1) as
    boolean columns + a conjunctive ``keep``. All single-pass codegen'd
    expressions over the scan — the 100 TB plan is a filter pushed into
    the read, no shuffle at all.

    Rules: token-count bounds, mean-word-length bounds, symbol-to-word
    ratio (``#``/ellipsis), >=``min_stopwords`` *distinct* english
    stopwords present, and a minimum fraction of words containing an
    alphabetic character.
    """
    t = F.col(text_col)
    ws = tokens(F.trim(t))
    n_tok = F.size(ws)
    mean_len = F.length(F.regexp_replace(t, _WS, "")) / n_tok
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")) / n_tok
    distinct_stops = F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.lower(t))),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    # fraction of words containing an alphabetic char, as one codegen'd
    # regexp_count (a higher-order filter(ws, rlike) is interpreted —
    # CodegenFallback). Doubling the inter-word spaces gives every
    # token its own delimiters, so the non-overlapping regexp scan
    # can't swallow a neighbor's boundary; lookahead-free for RE2
    # oracle parity.
    spaced = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(t), _WS, "  "), F.lit(" ")
    )
    non_alpha_words = F.regexp_count(spaced, F.lit(r"\s[^A-Za-z\s]+\s"))
    alpha_frac = (n_tok - non_alpha_words) / n_tok
    rules = {
        "r_token_count": (n_tok >= min_tokens) & (n_tok <= max_tokens),
        "r_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "r_symbol_ratio": symbols <= max_symbol_word_ratio,
        "r_stopwords": distinct_stops >= min_stopwords,
        "r_alpha_words": alpha_frac >= min_alpha_word_frac,
    }
    out = df.withColumns({k: v for k, v in rules.items()})
    keep = None
    for k in rules:
        keep = F.col(k) if keep is None else (keep & F.col(k))
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------
def ngram_contamination(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Benchmark-decontamination scan: flag training documents that
    share any word ``n``-gram with an evaluation set (the GPT-3
    appendix-C / PaLM procedure, done corpus-side).

    Returns one row per training doc with ``n_grams`` (its distinct
    n-gram count), ``n_hit_grams`` (distinct n-grams also present in
    the eval set), ``n_eval_docs`` (distinct eval documents hit) and
    ``contaminated``.

    100 TB plan: eval suites are tiny relative to the corpus, so the
    distinct eval-gram table is broadcast — the probe is a map-side
    hash join on the exploded training-gram stream, and the only
    shuffle is the per-doc count aggregation (keyed by doc id, with
    map-side combine). Nothing quadratic, no driver state.
    """
    from pyspark.sql.functions import broadcast

    from ..cache import persist_tracked

    def grams(frame, key, text):
        # token array FIRST projected to a concrete column: inlining
        # split() into the n-gram lambda makes every element_at
        # re-split the text in the interpreted higher-order path —
        # measured 10x slower on the corpus
        ws = frame.select(
            F.col(key), tokens(F.trim(F.col(text))).alias("__ws")
        )
        return ws.select(
            key, F.explode(_word_ngrams(F.col("__ws"), n)).alias("__g")
        ).distinct()

    # both the hit join and the totals aggregation read the distinct
    # train-gram stream — pin it so the explode runs once
    t_grams = persist_tracked(grams(df, id_col, text_col))
    e_grams = grams(eval_df, eval_id_col, eval_text_col)
    hits = (
        t_grams.join(broadcast(e_grams), "__g")
        .groupBy(id_col)
        .agg(
            F.count_distinct("__g").alias("n_hit_grams"),
            F.count_distinct(eval_id_col).alias("n_eval_docs"),
        )
    )
    totals = t_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint").alias("n_hit_grams"),
            F.coalesce("n_eval_docs", F.lit(0)).cast("bigint").alias("n_eval_docs"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
# Lookahead-free patterns (work identically under Java regex and RE2):
# emails, URLs, IPv4 addresses, and international-ish phone numbers.
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d\-\s()]{7,}\d",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
    kinds: Sequence[str] = ("email", "url", "ipv4", "phone"),
) -> DataFrame:
    """Redact PII spans in ``text_col``, replacing each match with a
    ``<KIND>`` tag, and attach per-kind match counts
    (``n_pii_<kind>``) plus a total.

    One chained ``regexp_replace``/``regexp_count`` per kind — all
    codegen'd, zero shuffles; at 100 TB this is a pure map over the
    scan. Order matters and is fixed: email before phone (an email's
    digits must not be half-eaten as a phone number), url before ipv4
    (a URL containing an address redacts as one URL).
    """
    known = [k for k in ("email", "url", "ipv4", "phone") if k in kinds]
    unknown = set(kinds) - set(known)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    scrubbed = F.col(text_col)
    counts = {}
    for kind in known:
        pat = PII_PATTERNS[kind]
        counts[f"n_pii_{kind}"] = F.regexp_count(scrubbed, F.lit(pat)).cast(
            "bigint"
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.withColumns(
        {**counts, "n_pii_total": total, out_col: scrubbed}
    )


# ---------------------------------------------------------------------------
# corpus-unigram language-model scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------
def unigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the deterministic stand-in for CCNet's
    wiki-LM perplexity filter (Wenzek et al. 2020): documents whose
    tokens are unusually improbable for the corpus (gibberish, boiler-
    plate soup, wrong-language fragments) score low.

    Two passes, both shuffle-bounded by the VOCABULARY, not the corpus:

    1. token counts — explode + one groupBy(token); the vocabulary is
       truncated to the ``vocab_cap`` most frequent tokens (ties broken
       by token string for determinism), everything else is OOV.
    2. scoring — tokens re-joined to the vocab table (broadcast when it
       fits; vocab_cap·~40B ≈ 2.6 MB at the default cap) and summed per
       document: one groupBy(doc).

    Probabilities are Lidstone-smoothed: p(tok) = (c + alpha) /
    (total + alpha·(V+1)), with the +1 vocabulary slot standing for the
    OOV class; OOV tokens score log p_oov = log(alpha / (total +
    alpha·(V+1))). Deterministic: counts are exact integers, each
    document's log-probs are summed per document after rounding the
    per-token logp to 9dp, so cross-engine totals agree.

    Returns (id, n_tokens, n_oov, mean_logp, oov_ratio).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, "")),
                _WS,
            )
        ).alias("__tok"),
    ).filter(F.col("__tok") != "")
    toks = _persist_tracked(toks)

    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    # top-K via orderBy+limit: Spark compiles this to TakeOrderedAnd-
    # Project (per-partition heaps + one driver merge of K rows), so
    # the vocabulary selection never global-sorts the full distinct-
    # token table. Full ordering (count desc, token asc) keeps the
    # truncation deterministic.
    vocab = counts.orderBy(F.col("__c").desc(), F.col("__tok").asc()).limit(
        vocab_cap
    )
    vocab = _persist_tracked(vocab)
    stats = vocab.agg(
        F.sum("__c").alias("in_vocab"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    total_row = toks.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    total = int(total_row["n"])
    v_size = int(stats["v"] or 0)
    denom = total + alpha * (v_size + 1)
    import math

    logp_oov = round(math.log(alpha / denom), 9) if total else 0.0

    scored = toks.join(F.broadcast(vocab), "__tok", "left").select(
        id_col,
        F.coalesce(
            F.round(F.log((F.col("__c") + F.lit(alpha)) / F.lit(denom)), 9),
            F.lit(logp_oov),
        ).alias("__logp"),
        F.col("__c").isNull().cast("int").alias("__oov"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__oov").cast("bigint").alias("n_oov"),
        (F.sum("__logp") / F.count(F.lit(1))).alias("mean_logp"),
        (F.sum("__oov") / F.count(F.lit(1))).alias("oov_ratio"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    out_col: str = "clean_text",
) -> DataFrame:
    """C4-style line- and page-level cleaning (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning…", §2.2): keep only
    lines that end in a terminal punctuation mark and have at least
    ``min_words_per_line`` words, drop lines mentioning javascript,
    then flag whole pages for removal when the kept text has fewer
    than ``min_sentences`` sentences, contains a curly brace (code),
    or the phrase "lorem ipsum".

    Everything is a single codegen'd projection over the scan — the
    line filter runs INSIDE the row via split + array higher-order
    functions (no explode, no shuffle, no re-grouping to reassemble
    documents), so at 100 TB this is a pure map with full predicate/
    column pushdown upstream of it.

    Adds: ``out_col`` (kept lines re-joined), ``n_lines_kept``,
    ``n_lines_dropped``, ``n_sentences`` (terminal-punct count in the
    kept text), ``keep_doc``. Filtering is left to the caller so the
    drop reasons stay inspectable.
    """
    lines = F.split(F.col(text_col), "\n")

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        n_words = F.size(F.filter(F.split(t, _WS), lambda w: w != ""))
        ends_ok = t.rlike(r'[.!?"]$')
        no_js = ~F.lower(t).contains("javascript")
        return ends_ok & (n_words >= min_words_per_line) & no_js

    kept = F.filter(lines, line_ok)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    keep_doc = (
        (n_sent >= min_sentences)
        & ~clean.contains("{")
        & ~clean.contains("}")
        & ~F.lower(clean).contains("lorem ipsum")
    )
    return df.withColumns(
        {
            out_col: clean,
            "n_lines_kept": F.size(kept).cast("bigint"),
            "n_lines_dropped": (F.size(lines) - F.size(kept)).cast("bigint"),
            "n_sentences": n_sent.cast("bigint"),
            "keep_doc": keep_doc,
        }
    )


def kn_bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean bigram log-probability under an interpolated
    Kneser-Ney model trained on the corpus itself (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.24 at bigram order) — the next step up
    from :func:`unigram_lm_scores` toward CCNet's KenLM perplexity
    filter: word-order-scrambled or template-stitched documents score
    low even when their unigram mix looks normal.

        p_KN(w2|w1) = (max(c(w1,w2) - D, 0) + D·N1+(w1,•)·p_cont(w2))
                      / c(w1·)
        p_cont(w2)  = N1+(•,w2) / |distinct bigrams|

    OOV handling mirrors the unigram operator: tokens outside the
    ``vocab_cap`` most frequent (ties broken by token string) collapse
    to a single ``<unk>`` class BEFORE bigrams are formed, so the model
    tables are bounded by the capped vocabulary, never the raw corpus.

    Execution shape — every shuffle bounded by model size, not corpus:

    1. bigrams form INSIDE the scan via array ops (split → slice →
       arrays_zip → explode): zero shuffle, no per-doc window;
    2. one groupBy(token) for the vocabulary (distributed top-K via
       TakeOrderedAndProject), broadcast back for the <unk> mapping;
    3. one groupBy(w1, w2) yields c(w1,w2); the context totals c(w1·),
       continuation counts N1+(w1,•) / N1+(•,w2) and |bigrams| are
       re-aggregations of that (already vocab-bounded) count table;
    4. scoring re-joins each document's bigrams to the model on
       (w1,w2) — an equi-join whose build side is the model table —
       then one groupBy(doc).

    Deterministic: all counts are exact integers; each bigram's logp is
    a single fixed-shape double expression rounded to 9dp before the
    per-document sum, so cross-engine totals agree bit-for-bit.

    Documents with fewer than two in-corpus tokens have no bigrams and
    are absent from the output (same convention as the SQL equivalent).
    Returns (id, n_bigrams, mean_logp).
    """
    arr_all = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, "")), _WS
    )
    arr = F.filter(arr_all, lambda t: t != "")
    # no persist: the token stream feeds ONLY the vocabulary count —
    # one consumer, so caching it would cost a corpus-sized
    # materialization for zero reuse
    toks = df.select(F.col(id_col), F.explode(arr).alias("__tok"))

    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = (
        counts.orderBy(F.col("__c").desc(), F.col("__tok").asc())
        .limit(vocab_cap)
        .select("__tok")
    )

    # bigrams formed scan-side; both positions mapped through the vocab
    # (broadcast) to the <unk> class
    m = F.greatest(F.size(arr) - F.lit(1), F.lit(0))  # 0 for <2-token docs
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, m).alias("a"),
                F.slice(arr, 2, m).alias("b"),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.a").alias("__r1"), F.col("__p.b").alias("__r2"))
    v1 = vocab.withColumnRenamed("__tok", "__r1").withColumn("__k1", F.lit(1))
    v2 = vocab.withColumnRenamed("__tok", "__r2").withColumn("__k2", F.lit(1))
    mapped = (
        pairs.join(F.broadcast(v1), "__r1", "left")
        .join(F.broadcast(v2), "__r2", "left")
        .select(
            id_col,
            F.when(F.col("__k1").isNotNull(), F.col("__r1"))
            .otherwise(F.lit("<unk>"))
            .alias("__w1"),
            F.when(F.col("__k2").isNotNull(), F.col("__r2"))
            .otherwise(F.lit("<unk>"))
            .alias("__w2"),
        )
    )
    mapped = _persist_tracked(mapped)

    big = mapped.groupBy("__w1", "__w2").agg(F.count(F.lit(1)).alias("__c12"))
    big = _persist_tracked(big)
    ctx = big.groupBy("__w1").agg(
        F.sum("__c12").alias("__c1"),
        F.count(F.lit(1)).alias("__n1f"),  # N1+(w1,•)
    )
    cont = big.groupBy("__w2").agg(F.count(F.lit(1)).alias("__n1b"))  # N1+(•,w2)
    n_big = big.count()  # |distinct bigrams| — one scalar to the driver

    model = (
        big.join(ctx, "__w1")
        .join(cont, "__w2")
        .select(
            "__w1",
            "__w2",
            F.round(
                F.log(
                    (
                        F.greatest(F.col("__c12") - F.lit(discount), F.lit(0.0))
                        + F.lit(discount)
                        * F.col("__n1f")
                        * (F.col("__n1b") / F.lit(float(n_big)))
                    )
                    / F.col("__c1")
                ),
                9,
            ).alias("__logp"),
        )
    )
    scored = mapped.join(model, ["__w1", "__w2"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (F.sum("__logp") / F.count(F.lit(1))).alias("mean_logp"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------
def bm25_scores(
    df: DataFrame,
    query_terms,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed bag of
    query terms (Robertson & Zaragoza 2009, §3.3):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl))
        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)

    Execution shape, all bounded by |query| not the corpus:

    1. one codegen'd scan pass computes per-doc length and each query
       term's tf via word-boundary ``regexp_count`` (no explode — the
       query bag is a handful of literals);
    2. one aggregation produces N, avgdl and the per-term document
       frequencies (map-side combined scalars — |query|+2 doubles to
       the driver, broadcast back as literals);
    3. the scoring pass is pure column arithmetic.

    Per-term tf/idf contributions are rounded to 9dp so cross-engine
    sums agree. Returns (id, dl, score) for every document;
    compose with a top-k window or threshold filter downstream.
    """
    import math

    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    tf_cols = {
        t: F.regexp_count(norm, F.lit(r"\b" + t + r"\b")).alias(f"__tf_{i}")
        for i, t in enumerate(terms)
    }
    base = df.select(
        F.col(id_col),
        F.size(F.split(norm, _WS)).cast("double").alias("__dl"),
        *tf_cols.values(),
    )
    base = _persist_tracked(base)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n = int(stats["n"])
    avgdl = float(stats["avgdl"]) if n else 1.0
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        df_t = int(stats[f"__df_{i}"])
        idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
        tf = F.col(f"__tf_{i}").cast("double")
        contrib = (
            F.lit(idf)
            * tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl)))
        )
        score = score + F.round(contrib, 9)
    return base.select(
        F.col(id_col),
        F.col("__dl").cast("bigint").alias("dl"),
        score.alias("score"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Sliding token-window chunking with overlap — the
    context-window-sized split every training/RAG pipeline applies
    before tokenization. Windows start every ``chunk_tokens -
    overlap`` tokens; a window is kept iff it is the first OR it adds
    at least one token beyond the previous window's end (a trailing
    window fully contained in its predecessor — start + overlap - 1 >=
    n — is dropped, so no chunk is a strict suffix-duplicate of
    another).

    Pure projection + one explode: zero shuffles, the cost is linear
    in the scan and the explode factor is ~n_tokens/step — at 100 TB
    this is a map-only stage that pipelines into whatever shuffle
    follows. Tokens are plain whitespace splits (content-preserving,
    no lowercasing); ``chunk_text`` is whitespace-normalized by the
    rejoin. Docs that are empty after trim emit no chunks.

    Returns (id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    ws = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokens(F.col(text_col)).alias("__ws")
    )
    n = F.size(F.col("__ws"))
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step)),
        lambda s: (s == 1) | (s + F.lit(overlap - 1) < n),
    )
    chunks = ws.select(
        id_col, "__ws", F.explode(starts).alias("__s")
    )
    piece = F.slice(F.col("__ws"), F.col("__s"), chunk_tokens)
    return chunks.select(
        F.col(id_col),
        ((F.col("__s") - 1) / F.lit(step)).cast("int").alias("chunk_id"),
        F.col("__s").cast("bigint").alias("start_token"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def ccnet_perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
    alpha: float = 0.5,
    cutoffs=(1.0 / 3.0, 2.0 / 3.0),
    sample_rate: float = 1.0,
    seed: int = 17,
    keep_rates={"head": 1.0, "middle": 0.5, "tail": 0.1},
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4):
    score every document under the corpus LM (unigram_lm_scores — the
    deterministic wiki-LM stand-in), cut the score distribution into
    head / middle / tail at the given quantiles, and keep each bucket
    at its configured rate via the engine-portable md5 draw.

    The two cutoff VALUES are exact percentiles of a deterministic
    hash-sample of the scored docs — CCNet's own protocol fits cutoffs
    on a sample, and ``sample_rate`` is the 100 TB knob: the percentile
    aggregation buffers only the sampled scores, everything else stays
    a zero-shuffle column map. Scores are rounded to 6 dp BEFORE the
    percentile so both engines interpolate over identical inputs
    (DuckDB quantile_cont and Spark percentile share the linear-
    interpolation convention).

    Higher mean_logp = more probable = CCNet's LOWER perplexity, so
    head is the top bucket: score >= upper cutoff.

    Returns (id, mean_logp, bucket, kept).
    """
    from .datasets import split_hash_u

    scored = unigram_lm_scores(
        df, id_col=id_col, text_col=text_col, vocab_cap=vocab_cap, alpha=alpha
    ).select(id_col, F.round("mean_logp", 6).alias("mean_logp"))
    scored = _persist_tracked(scored)

    sample = scored
    if sample_rate < 1.0:
        sample = scored.filter(split_hash_u(id_col, seed) < sample_rate)
    q_lo, q_hi = cutoffs
    cuts = sample.agg(
        F.round(F.expr(f"percentile(mean_logp, {q_lo!r})"), 6).alias("lo"),
        F.round(F.expr(f"percentile(mean_logp, {q_hi!r})"), 6).alias("hi"),
    ).collect()[0]
    lo, hi = float(cuts["lo"]), float(cuts["hi"])

    bucket = (
        F.when(F.col("mean_logp") >= hi, F.lit("head"))
        .when(F.col("mean_logp") >= lo, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = scored.withColumn("bucket", bucket)
    rate = F.create_map(
        *[x for b, r in keep_rates.items() for x in (F.lit(b), F.lit(float(r)))]
    )
    u = split_hash_u(id_col, seed + 1)
    return out.withColumn("kept", u < rate[F.col("bucket")])


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "char_entropy",
) -> DataFrame:
    """Per-document Shannon entropy (bits/char) of the character
    distribution — the classic compression-proxy quality signal:
    boilerplate and repeated-template docs sit low, encrypted/garbled
    blobs sit high, natural prose in between. Pipelines threshold both
    tails (e.g. Gopher-style keep 2.0 <= H <= 6.0).

    Implementation is ONE Arrow-batched pandas UDF over the text
    column — zero shuffles, a pure map stage that pipelines into the
    scan. Entropy needs a within-row char histogram, which has no
    whole-stage-codegen form (the alternative is explode-per-char +
    two corpus-wide groupBys: a shuffle of ~alphabet rows per doc that
    this avoids entirely). Python-side cost is one C-speed Counter per
    doc.

    Cross-engine determinism: H = log2(n) - (sum_c round(c*log2 c, 9))/n
    summed in char-sorted order, output rounded to 6 dp — the exact
    formula a SQL oracle replays with group-by-char + log2. Null/empty
    text yields null.
    """
    import math
    from collections import Counter

    @F.pandas_udf("double")
    def _ent(texts):
        import pandas as pd

        out = []
        for t in texts:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            counts = Counter(t)
            n = len(t)
            s = 0.0
            for ch in sorted(counts):
                s += round(counts[ch] * math.log2(counts[ch]), 9)
            out.append(round(math.log2(n) - s / n, 6))
        return pd.Series(out, dtype=float)

    # Marked non-deterministic (it is pure — this is the guide-§4.4
    # anti-duplication lever): a downstream filter(keep_quality) that
    # references this column otherwise gets SPLIT and pushed below any
    # spread/exchange, dragging a SECOND ArrowEvalPython evaluation
    # below the shuffle (and serializing it into the scan task when
    # the scan is one split). Non-deterministic pins ONE evaluation at
    # the declared position; the value per row is unchanged. Trade-off
    # (accepted, measured): other filter conjuncts can no longer be
    # evaluated below the Python boundary, so the worker sees all rows
    # (~+10% rows at sf0.1) instead of regex-prefiltered ones.
    _ent_once = _ent.asNondeterministic()

    return df.withColumn(out_col, _ent_once(F.col(text_col)))


def zipf_fit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 4096,
) -> DataFrame:
    """Zipf-law fit of each group's token-frequency distribution: OLS
    slope/intercept/R² of log2(count) against log2(rank) over the
    ``top_k`` most frequent tokens — the corpus-health signal (natural
    language sits near slope -1; template spam and word soup flatten,
    boilerplate floods steepen the head).

    Scale shape: one (group, token) count whose shuffle is bounded by
    groups × vocabulary; ranking is a per-group window over the
    already-model-sized count table, truncated to ``top_k``; the fit
    itself reduces each group to five scalar sums. Nothing downstream
    of the first groupBy ever sees the corpus.

    Determinism: the regression is computed from explicit sums
    (Sx, Sy, Sxy, Sxx over log2 doubles) each rounded to 6 dp before
    the closed-form slope/intercept/R² — the same arithmetic any SQL
    engine replays exactly (built-in regr_slope implementations differ
    in accumulation algorithm across engines; the explicit form does
    not). Rank ties break by token string.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.explode(F.split(norm, _WS)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("grp").orderBy(F.col("c").desc(), F.col("tok").asc())
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "grp",
            F.log2(F.col("rank").cast("double")).alias("x"),
            F.log2(F.col("c").cast("double")).alias("y"),
        )
    )
    sums = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum(F.col("x") * F.col("y")), 6).alias("sxy"),
        F.round(F.sum(F.col("x") * F.col("x")), 6).alias("sxx"),
        F.round(F.sum(F.col("y") * F.col("y")), 6).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # degenerate fits are NULL, not an ANSI divide-by-zero: slope needs
    # x-variance (>= 2 ranks), R² additionally y-variance (a group
    # whose top-k counts are all equal has none)
    x_var = n * sxx - sx * sx
    y_var = n * syy - sy * sy
    slope = F.when(x_var != 0, (n * sxy - sx * sy) / x_var)
    intercept = (sy - slope * sx) / n
    r_num = n * sxy - sx * sy
    r2 = F.when(
        x_var * y_var != 0, (r_num * r_num) / (x_var * y_var)
    )
    return sums.select(
        F.col("grp").alias(group_col),
        n.cast("bigint").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
        F.round(r2, 6).alias("zipf_r2"),
    )


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    entropy_band=(2.0, 6.0),
    allowed_langs=("en", "de", "es", "fr"),
    **gopher_kwargs,
) -> DataFrame:
    """ONE-SCAN fused quality gate: Gopher rule battery + char-entropy
    band + regexp stopword-rate language ID, combined into a single
    ``keep_quality`` decision with every per-rule flag retained for
    audit. The production shape for 100 TB filtering — three signal
    families that would naively be three passes (and one of them a
    token explode + groupBy + join) fuse into ONE projection over the
    scan: the Gopher rules and per-language stopword rates are pure
    codegen'd regexp expressions, entropy is the Arrow-batched UDF, and
    nothing shuffles (plan: FileScan -> ArrowEvalPython -> Project,
    asserted in tests).

    Language ID here is the zero-shuffle variant: per-language
    word-boundary stopword regexp_count per token (the
    :func:`language_scores` explode form is for when the full
    score table matters); prediction = argmax rate, ties broken by
    language code order, rates rounded to 9 dp for cross-engine parity.

    Null/edge semantics: every rule flag is coalesced to False before
    the conjunction, so empty/degenerate docs are dropped, never
    three-valued.
    """
    lo, hi = entropy_band
    g = gopher_rules(df, text_col=text_col, **gopher_kwargs)
    g = char_entropy(g, id_col=id_col, text_col=text_col)
    # Argmax over an ARRAY of integer hit counts, not a chained CASE
    # over per-lang rate columns: when the optimizer pushes
    # `filter(keep_quality)` below the entropy UDF (correct at scale —
    # failing rows skip the Python boundary), a CASE-chain argmax
    # re-expands every language's regexp_count rate inside every
    # conditional branch, where short-circuit evaluation defeats
    # codegen subexpression elimination — measured 3x the whole-stage
    # cost at sf0.1. Two exact simplifications: (a) the array form
    # evaluates each count once per reference (and lower(text) is a
    # shared, always-evaluated subexpression across the elements, so
    # codegen hoists it); (b) argmax over round(hits/n_tokens, 9) IS
    # argmax over integer hits — one positive per-row denominator
    # cancels, and 9-dp rounding cannot merge distinct integer counts
    # for any text shorter than ~2e9 tokens — so the division and its
    # four token_count evaluations drop out. Ties still break by
    # language code order (array_position returns the FIRST index
    # holding the max, languages sorted); best>0 on rates is exactly
    # best_hits>0.
    langs = sorted(STOPWORDS)
    hits_arr = F.array(
        *[stopword_hits(F.col(text_col), lang) for lang in langs]
    )
    best = F.array_max(hits_arr)
    idx = F.array_position(hits_arr, best)
    pred = F.when(
        idx > 0,
        F.element_at(F.array(*[F.lit(x) for x in langs]), idx.cast("int")),
    )
    r_entropy = (F.col("char_entropy") >= F.lit(float(lo))) & (
        F.col("char_entropy") <= F.lit(float(hi))
    )
    r_lang = pred.isin(*[str(x) for x in allowed_langs]) & (best > 0)
    out = g.withColumns(
        {
            "predicted_lang": F.when(best > 0, pred),
            "r_entropy": F.coalesce(r_entropy, F.lit(False)),
            "r_lang": F.coalesce(r_lang, F.lit(False)),
        }
    )
    return out.withColumn(
        "keep_quality",
        F.coalesce(F.col("keep"), F.lit(False))
        & F.col("r_entropy")
        & F.col("r_lang"),
    )


def source_token_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Lidstone-smoothed KL(group ‖ corpus) of each group's unigram
    distribution over the corpus top-``top_k`` vocabulary — the
    data-mixing health signal: a source whose token distribution
    diverges from the blend is over/under-represented or off-domain
    (the distribution-matching quantity behind DSIR/DoReMi-style
    reweighting, reported per source instead of per doc).

    Scale shape: one (group, token) count bounds everything downstream
    by groups x vocabulary; the vocabulary itself is a distributed
    top-K (TakeOrderedAndProject, no global sort); the KL grid is the
    (groups x top_k) cross join of two MODEL-sized frames — the corpus
    never flows past the first groupBy. Two scalar probes (corpus
    token total, realized vocab size).

    Determinism: p and q are exact ratios of integer counts; the only
    double accumulation is the final per-group KL sum, rounded to 6 dp
    (the zipf_fit convention — ln() ulp differences across libm
    implementations sit ~9 orders below the rounding grid).
    """
    a = float(alpha)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.explode(F.split(norm, _WS)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = _persist_tracked(
        toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        counts.groupBy("tok")
        .agg(F.sum("c").alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("tok").asc())
        .limit(top_k)
    )
    vocab = _persist_tracked(vocab)
    big_n, v_size = vocab.agg(F.sum("cc"), F.count(F.lit(1))).first()
    grid = vocab.crossJoin(counts.select("grp").distinct())
    joined = grid.join(counts, ["grp", "tok"], "left").select(
        "grp",
        "cc",
        F.coalesce(F.col("c"), F.lit(0)).alias("cg"),
    )
    totals = joined.groupBy("grp").agg(F.sum("cg").alias("ng"))
    scored = joined.join(F.broadcast(totals), "grp")
    p = (F.col("cg") + a) / (F.col("ng") + a * v_size)
    q = (F.col("cc") + a) / (float(big_n) + a * v_size)
    return (
        scored.groupBy("grp")
        .agg(
            F.first("ng").alias("__ng"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("__ng").cast("bigint").alias("n_vocab_tokens"),
            "kl_vs_corpus",
        )
    )


def normalization_collisions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Groups of documents whose texts become IDENTICAL after
    normalization (lowercase, punctuation stripped, whitespace
    collapsed) — the dedup-pipeline audit for how much exact dedup
    misses to trivial formatting variants, and the standard first
    canonicalization step before fingerprinting (e.g. RefinedWeb's
    exact-dedup preprocessing).

    Returns one row per post-normalization fingerprint shared by >= 2
    docs: member count, distinct RAW fingerprints among them
    (newly_merged = the group only exists BECAUSE of normalization),
    and the minimum doc id as the canonical representative.

    Scale shape: two md5s per doc map-side, ONE fingerprint groupBy —
    the same cost envelope as exact_dedup; no joins, no explode.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""),
            _WS,
            " ",
        )
    )
    fps = df.select(
        F.col(id_col).alias("__id"),
        F.md5(F.col(text_col)).alias("__raw_fp"),
        F.md5(norm).alias("norm_fp"),
    )
    return (
        fps.groupBy("norm_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__raw_fp").alias("n_raw_variants"),
            F.min("__id").alias("rep_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .withColumn("newly_merged", F.col("n_raw_variants") >= 2)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information collocations: adjacent word pairs
    whose co-occurrence beats the independence prediction —
    PMI = ln( p(a,b) / (p(a)·p(b)) ) with p from corpus counts
    (Church & Hanks 1990; the classic phrase/collocation extractor).

    Plan shape: bigrams form SCAN-SIDE from each document's token
    array (slice+zip — the kn_bigram_lm_scores construction, zero
    shuffle), then ONE bigram groupBy and ONE unigram groupBy bound
    everything downstream by vocabulary; unigram totals broadcast back
    twice; corpus totals are two scalar probes. PMI derives from exact
    integer counts — any engine replays it; ln() ulp noise sits far
    below the 6 dp output rounding.

    Returns (word_a, word_b, n_ab, n_a, n_b, pmi) for pairs with
    ``n_ab >= min_count``.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(F.split(norm, _WS).alias("t")).filter(
        (F.size("t") > 0) & (F.col("t")[0] != "")
    )
    toks = _persist_tracked(toks)
    uni = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n")
    )
    uni = _persist_tracked(uni)
    n_uni = uni.agg(F.sum("n")).first()[0]
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("a"),
                    F.slice("t", 2, F.size("t") - 1).alias("b"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("word_a"), F.col("p.b").alias("word_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    n_bi_row = (
        toks.filter(F.size("t") >= 2)
        .agg(F.sum(F.size("t") - 1))
        .first()
    )
    n_bi = int(n_bi_row[0])
    ua = uni.select(F.col("w").alias("word_a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("w").alias("word_b"), F.col("n").alias("n_b"))
    p_ab = F.col("n_ab") / F.lit(float(n_bi))
    p_a = F.col("n_a") / F.lit(float(n_uni))
    p_b = F.col("n_b") / F.lit(float(n_uni))
    return (
        bi.join(F.broadcast(ua), "word_a")
        .join(F.broadcast(ub), "word_b")
        .select(
            "word_a",
            "word_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k terms (round 7)
# ---------------------------------------------------------------------------
def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic salient-term
    extraction (document keywords, weak topic labels) complementing
    the query-side BM25 ranker.

    idf = ln(N/df) with df the DOCUMENT frequency (distinct docs
    containing the term); terms below ``min_df`` are dropped (hapax
    noise, and the df table is what bounds the broadcast). Plan shape:
    one (doc, term) count collapses the corpus; df is one
    vocab-bounded groupBy of the DISTINCT (doc, term) projection; idf
    broadcasts back; the top-k window is per-doc (doc-bounded).
    Determinism: idf rounded 9 dp BEFORE the product, tfidf rounded
    6 dp; ties break on the term.
    """
    n_docs = df.select(id_col).distinct().count()
    toks = df.select(
        F.col(id_col).alias("__d"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__t"),
    ).filter(F.col("__t") != "")
    tf = toks.groupBy("__d", "__t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    idf = dfreq.withColumn(
        "idf", F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 9)
    )
    scored = tf.join(F.broadcast(idf), "__t").withColumn(
        "tfidf", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy("__d").orderBy(
        F.col("tfidf").desc(), F.col("__t").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__d").alias(id_col),
            F.col("__t").alias("term"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "tfidf",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def keyword_llr(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 3,
) -> DataFrame:
    """Distinctive keywords per group by Dunning's log-likelihood
    ratio (G², Dunning 1993): for each (group, token), the 2×2
    contingency of token-in-group vs token-elsewhere, scored
    G² = 2·Σ k_ij·ln(k_ij·N / (row_i·col_j)) over the non-zero cells —
    the corpus-vs-subcorpus "what words make this source different"
    view that TF-IDF (per-document) does not answer. Only
    OVERREPRESENTED tokens qualify as keywords (k11·N > row·col);
    returns top-``k`` per group (ties → token asc):
    (group, token, n_in_group, n_elsewhere, llr, rank).

    Plan shape: ONE (group, token) groupBy collapses the corpus
    (whitespace tokens, the tfidf_topk convention); token totals are a
    vocab-bounded aggregation broadcast back; group totals and N are
    groups-bounded; the ranking window partitions by group over the
    vocab-bounded score table. G² terms are double ln over exact
    integer ratios, rounded 6 dp at the end (the PMI convention).
    """
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__t"),
    ).filter(F.col("__t") != "")
    gt = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("k11")
    )
    tok_tot = gt.groupBy("__t").agg(F.sum("k11").alias("__ct"))
    grp_tot = gt.groupBy("__g").agg(F.sum("k11").alias("__rg"))
    n_tot = gt.agg(F.sum("k11").alias("__N"))
    cells = (
        gt.join(F.broadcast(tok_tot), "__t")
        .join(F.broadcast(grp_tot), "__g")
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("k11") >= int(min_count))
    )
    k11 = F.col("k11").cast("double")
    k12 = (F.col("__ct") - F.col("k11")).cast("double")
    k21 = (F.col("__rg") - F.col("k11")).cast("double")
    k22 = (
        F.col("__N") - F.col("__rg") - F.col("__ct") + F.col("k11")
    ).cast("double")
    n = F.col("__N").cast("double")

    def _term(kc, row, colsum):
        # k·ln(k·N / (row·col)); zero cells contribute zero
        return F.when(
            kc > 0, kc * F.log(kc * n / (row * colsum))
        ).otherwise(F.lit(0.0))

    # table orientation: rows = token/not-token, cols = group/rest —
    # row1 = ct (token total), row2 = N - ct; col1 = rg, col2 = N - rg
    c1 = F.col("__rg").cast("double")
    c2 = (F.col("__N") - F.col("__rg")).cast("double")
    rr1 = F.col("__ct").cast("double")
    rr2 = (F.col("__N") - F.col("__ct")).cast("double")
    llr = 2.0 * (
        _term(k11, rr1, c1)
        + _term(k12, rr1, c2)
        + _term(k21, rr2, c1)
        + _term(k22, rr2, c2)
    )
    scored = cells.filter(
        k11 * n > rr1 * c1  # overrepresented in the group only
    ).select(
        F.col("__g").alias(group_col),
        F.col("__t").alias("token"),
        F.col("k11").alias("n_in_group"),
        (F.col("__ct") - F.col("k11")).cast("bigint").alias("n_elsewhere"),
        F.round(llr, 6).alias("llr"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("llr").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .orderBy(group_col, "rank")
    )


def vocab_richness(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-richness audit per group: Chao1 total-vocabulary
    estimate and Good-Turing unseen mass — "how much of this source's
    vocabulary have we actually seen?", the coverage counterpart of
    the KL mixing signal (a source whose Chao1 dwarfs its observed
    vocabulary is under-sampled; a high Good-Turing mass says the next
    document still brings new tokens). Per group: observed vocabulary
    V, token count N, singletons f1, doubletons f2, the bias-corrected
    Chao1 V + f1·(f1−1)/(2·(f2+1)) (defined even at f2 = 0), and
    unseen-mass p0 = f1/N. Ordered by group.

    Scale shape: ONE (group, token) count collapses the corpus; the
    frequency-of-frequencies collapse is groups×distinct-counts
    bounded; every statistic is exact integer arithmetic with ONE
    division per column at the end (tokenization =
    source_token_divergence's shared normalize/split fragment).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.explode(F.split(norm, _WS)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    acc = counts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("vocab").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (f2 + 1.0)
    )
    return acc.select(
        F.col("grp").alias(group_col),
        "vocab",
        "n_tokens",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(
            F.when(F.col("n_tokens") > 0, f1 / F.col("n_tokens")), 6
        ).alias("gt_unseen_mass"),
        F.round(
            F.when(F.col("vocab") > 0, f1 / F.col("vocab")), 6
        ).alias("singleton_ratio"),
    ).orderBy(group_col)


def source_token_jsd(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Jensen-Shannon divergence of each group's unigram distribution
    against the corpus blend over the shared top-``top_k`` vocabulary
    — the SYMMETRIC, bounded (≤ ln 2) companion of
    :func:`source_token_divergence`: KL explodes when a source
    assigns near-zero mass to a common token, JSD saturates, so it
    ranks heterogeneous sources on one comparable scale (and √JSD is
    a metric). Same Lidstone smoothing, same grid, same plan shape:
    everything past the first (group, token) groupBy is bounded by
    groups × vocabulary.

    Determinism: the source_token_divergence convention — p and q are
    exact ratios of integer counts; the only double accumulation is
    the final per-group sum, rounded 6 dp (ln() ulp noise sits ~9
    orders below the grid).
    """
    a = float(alpha)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.explode(F.split(norm, _WS)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = _persist_tracked(
        toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        counts.groupBy("tok")
        .agg(F.sum("c").alias("cc"))
        .orderBy(F.col("cc").desc(), F.col("tok").asc())
        .limit(top_k)
    )
    vocab = _persist_tracked(vocab)
    big_n, v_size = vocab.agg(F.sum("cc"), F.count(F.lit(1))).first()
    grid = vocab.crossJoin(counts.select("grp").distinct())
    joined = grid.join(counts, ["grp", "tok"], "left").select(
        "grp",
        "cc",
        F.coalesce(F.col("c"), F.lit(0)).alias("cg"),
    )
    totals = joined.groupBy("grp").agg(F.sum("cg").alias("ng"))
    scored = joined.join(F.broadcast(totals), "grp")
    p = (F.col("cg") + a) / (F.col("ng") + a * v_size)
    q = (F.col("cc") + a) / (float(big_n) + a * v_size)
    m = (p + q) / 2.0
    jsd = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return (
        scored.groupBy("grp")
        .agg(
            F.first("ng").alias("__ng"),
            F.round(F.sum(jsd), 6).alias("jsd_vs_corpus"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("__ng").cast("bigint").alias("n_vocab_tokens"),
            "jsd_vs_corpus",
        )
    )


def token_burstiness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 256,
) -> DataFrame:
    """Church-Gale burstiness for the top-``top_k`` corpus tokens:
    burstiness = collection frequency / document frequency — the mean
    occurrences per CONTAINING document. A function word scores ~its
    per-doc rate everywhere; a topical/bursty token concentrates (one
    doc mentions it many times, most docs never) — the signal behind
    adaptive LM caches and topical-keyword extraction, and a
    boilerplate detector (high df + high burstiness = repeated
    template strings). Returns (token, collection_freq, doc_freq,
    burstiness, doc_share) ordered by collection_freq desc, token asc,
    limited to ``top_k``.

    ONE (doc, token) count collapse; the token table aggregates it;
    the truncation is a distributed top-K (TakeOrderedAndProject);
    one broadcast doc-count probe. Exact integer ratios, 6 dp.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(norm, _WS)).alias("tok"),
    ).filter(F.col("tok") != "")
    per_doc = toks.groupBy("__doc", "tok").agg(
        F.count(F.lit(1)).alias("__c")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__nd"))
    agg = per_doc.groupBy("tok").agg(
        F.sum("__c").cast("bigint").alias("collection_freq"),
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
    )
    return (
        agg.crossJoin(F.broadcast(n_docs))
        .select(
            F.col("tok").alias("token"),
            "collection_freq",
            "doc_freq",
            F.round(
                F.col("collection_freq").cast("double")
                / F.col("doc_freq"),
                6,
            ).alias("burstiness"),
            F.round(
                F.col("doc_freq").cast("double") / F.col("__nd"), 6
            ).alias("doc_share"),
        )
        .orderBy(F.col("collection_freq").desc(), F.col("token").asc())
        .limit(int(top_k))
    )


def good_turing_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 10,
) -> DataFrame:
    """Good-Turing frequency smoothing over the corpus unigram
    spectrum: for each low count r, the adjusted count
    r* = (r+1)·S(r+1)/S(r) (Good 1953) — the estimate behind
    Katz/Kneser-Ney discounting and the "how much probability mass do
    unseen tokens deserve?" question :func:`vocab_richness` answers
    only at r = 0. Returns one row per count r = 1..``max_r`` with
    S(r) > 0: (r, s_r, s_r_next, r_star, raw_mass, smoothed_mass),
    ordered by r; r* NULL when S(r+1) = 0 (the classic estimator is
    undefined there — smooth the spectrum upstream if the tail
    matters).

    ONE (token) count collapse, one frequency-of-frequencies collapse
    (bounded by distinct counts), one self-lag join on r+1 over the
    spectrum-bounded table. Exact integer ratios, 6 dp.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    toks = df.select(
        F.explode(F.split(norm, _WS)).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__c"))
    spectrum = counts.groupBy(F.col("__c").alias("r")).agg(
        F.count(F.lit(1)).cast("bigint").alias("s_r")
    )
    spectrum = _persist_tracked(spectrum)
    tot = counts.agg(F.sum("__c").cast("bigint").alias("__n"))
    nxt = spectrum.select(
        (F.col("r") - 1).alias("r"), F.col("s_r").alias("s_r_next")
    )
    j = (
        spectrum.filter(F.col("r") <= int(max_r))
        .join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
    )
    rd = F.col("r").cast("double")
    r_star = F.when(
        F.col("s_r_next").isNotNull() & (F.col("s_r") > 0),
        (rd + 1.0)
        * F.col("s_r_next").cast("double")
        / F.col("s_r").cast("double"),
    )
    nd = F.col("__n").cast("double")
    return j.select(
        F.col("r").cast("bigint").alias("r"),
        "s_r",
        F.coalesce(F.col("s_r_next"), F.lit(0)).cast("bigint").alias(
            "s_r_next"
        ),
        F.round(r_star, 6).alias("r_star"),
        F.round(rd * F.col("s_r").cast("double") / nd, 6).alias(
            "raw_mass"
        ),
        F.round(
            r_star * F.col("s_r").cast("double") / nd, 6
        ).alias("smoothed_mass"),
    ).orderBy("r")


def casing_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group character-class composition of a text corpus: the
    uppercase / lowercase / digit / whitespace / other shares of the
    total character mass, plus the mean document length — the cheap
    corpus-mix audit that separates SHOUTING boilerplate, code-heavy
    sources, and clean prose before any tokenizer runs. Returns one
    row per group, ordered: (group, n_docs, n_chars, upper_ratio,
    lower_ratio, digit_ratio, space_ratio, other_ratio,
    avg_doc_chars). ASCII classes only (the lang-ID heuristic
    convention — class masks stay byte-deterministic across engines).

    Plan shape: class counts come from length(x) − length(translate(x,
    CLASS, '')) — pure codegen string ops with identical Spark/DuckDB
    semantics (no regex), partial-agged in ONE groupBy scan.
    """
    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lower = upper.lower()
    digits = "0123456789"
    t = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(t)

    def cls_count(chars):
        return ln - F.length(F.translate(t, chars, ""))

    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ln).cast("bigint").alias("n_chars"),
        F.sum(cls_count(upper)).cast("bigint").alias("__u"),
        F.sum(cls_count(lower)).cast("bigint").alias("__l"),
        F.sum(cls_count(digits)).cast("bigint").alias("__d"),
        F.sum(cls_count(" \t\n\r")).cast("bigint").alias("__s"),
    )
    n = F.col("n_chars").cast("double")

    def ratio(c):
        return F.round(F.when(F.col("n_chars") > 0, c / n), 6)

    other = (
        F.col("n_chars")
        - F.col("__u")
        - F.col("__l")
        - F.col("__d")
        - F.col("__s")
    ).cast("double")
    return per.select(
        "group",
        "n_docs",
        "n_chars",
        ratio(F.col("__u").cast("double")).alias("upper_ratio"),
        ratio(F.col("__l").cast("double")).alias("lower_ratio"),
        ratio(F.col("__d").cast("double")).alias("digit_ratio"),
        ratio(F.col("__s").cast("double")).alias("space_ratio"),
        ratio(other).alias("other_ratio"),
        F.round(n / F.col("n_docs"), 6).alias("avg_doc_chars"),
    ).orderBy("group")


def bigram_entropy_rate(
    df: DataFrame,
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
) -> DataFrame:
    """Corpus bigram conditional entropy rate — "how predictable is
    the next word": H(w₂|w₁) = −Σ p(w₁,w₂)·ln p(w₂|w₁) in nats, with
    the right-margin unigram entropy H(w₂) and their difference
    I(w₁;w₂) = H(w₂) − H(w₂|w₁) (the mutual information between
    adjacent words — template-stitched or word-salad corpora show a
    LOW gain where natural prose shows a high one; the one-number
    companion of the per-doc KN perplexity filter). Returns ONE row:
    (n_bigrams, n_distinct_bigrams, n_next_tokens, h_unigram,
    h_conditional, info_gain) — n_next_tokens is the distinct
    right-margin vocabulary H(w₂) is measured over.

    Execution shape — the kn_bigram discipline end-to-end: bigrams
    form INSIDE the scan (split → slice → arrays_zip → explode, zero
    shuffle); tokens outside the ``vocab_cap`` most frequent collapse
    to ``<unk>`` BEFORE bigrams (broadcast vocab), so the count table
    is bounded by the capped vocabulary², never the raw corpus; the
    margins are re-aggregations of that (persisted) table and the
    entropies are ln sums over it (the txt_source_kl ulp argument),
    rounded 6 dp.
    """
    arr_all = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, "")), _WS
    )
    arr = F.filter(arr_all, lambda t: t != "")
    toks = df.select(F.explode(arr).alias("__tok"))
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = (
        counts.orderBy(F.col("__c").desc(), F.col("__tok").asc())
        .limit(vocab_cap)
        .select("__tok")
    )
    m = F.greatest(F.size(arr) - F.lit(1), F.lit(0))
    pairs = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(arr, 1, m).alias("a"),
                F.slice(arr, 2, m).alias("b"),
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("__r1"), F.col("__p.b").alias("__r2"))
    v1 = vocab.withColumnRenamed("__tok", "__r1").withColumn("__k1", F.lit(1))
    v2 = vocab.withColumnRenamed("__tok", "__r2").withColumn("__k2", F.lit(1))
    mapped = (
        pairs.join(F.broadcast(v1), "__r1", "left")
        .join(F.broadcast(v2), "__r2", "left")
        .select(
            F.when(F.col("__k1").isNotNull(), F.col("__r1"))
            .otherwise(F.lit("<unk>"))
            .alias("__w1"),
            F.when(F.col("__k2").isNotNull(), F.col("__r2"))
            .otherwise(F.lit("<unk>"))
            .alias("__w2"),
        )
    )
    big = _persist_tracked(
        mapped.groupBy("__w1", "__w2").agg(
            F.count(F.lit(1)).alias("__c12")
        )
    )
    ctx = big.groupBy("__w1").agg(F.sum("__c12").alias("__c1"))
    right = big.groupBy("__w2").agg(F.sum("__c12").alias("__c2"))
    tot = big.agg(
        F.sum("__c12").alias("__n"),
        F.count(F.lit(1)).alias("__nd"),
    )
    n = F.col("__n").cast("double")
    hcond_tab = (
        big.join(F.broadcast(ctx), "__w1")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("__c12").cast("double") / n)
                * F.log(
                    F.col("__c12").cast("double")
                    / F.col("__c1").cast("double")
                )
            ).alias("__hc")
        )
    )
    hx_tab = right.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            -(F.col("__c2").cast("double") / n)
            * F.log(F.col("__c2").cast("double") / n)
        ).alias("__hx"),
        F.count(F.lit(1)).alias("__nctx"),
    )
    acc = tot.crossJoin(F.broadcast(hcond_tab)).crossJoin(
        F.broadcast(hx_tab)
    )
    hc = F.greatest(F.col("__hc"), F.lit(0.0))
    hx = F.greatest(F.col("__hx"), F.lit(0.0))
    return acc.select(
        F.col("__n").cast("bigint").alias("n_bigrams"),
        F.col("__nd").cast("bigint").alias("n_distinct_bigrams"),
        F.col("__nctx").cast("bigint").alias("n_next_tokens"),
        F.round(hx, 6).alias("h_unigram"),
        F.round(hc, 6).alias("h_conditional"),
        F.round(hx - hc, 6).alias("info_gain"),
    )


def _bucketed_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """(bucket, tok) stream shared by the two Heaps collapses: docs
    take a deterministic md5 corpus order, tokens explode from the
    punctuation-stripped lowercase text, and the bucket is the exact
    integer h·B div 2³² (the _bucket discipline — double division
    would round near boundaries)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _PUNCT, ""))
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return (
        df.select(
            (h * n_buckets).alias("__hb"),
            F.explode(F.split(norm, _WS)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(F.expr("__hb div 4294967296").alias("bucket"), "tok")
    )


def bucket_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Per-checkpoint-bucket token counts — one of the two
    :func:`heaps_law_fit` sufficient statistics: a SUM monoid keyed by
    bucket (≤ ``n_buckets`` state rows), which is what makes
    :func:`~..streaming.segments.bucket_tokens_stream` a legal
    streaming twin (running state after any micro-batch prefix equals
    this batch collapse over the same rows). Returns
    (bucket, n_tokens). ONE partial-agged groupBy."""
    return _bucketed_tokens(df, text_col, id_col, n_buckets).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))


def token_first_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Per-token first-occurrence checkpoint bucket — the other
    :func:`heaps_law_fit` sufficient statistic: a MIN monoid keyed by
    token (one state row per distinct token — the live "is the
    vocabulary still growing" probe), which is what makes
    :func:`~..streaming.segments.vocab_growth_stream` a legal
    streaming twin. Returns (token, first_bucket). ONE partial-agged
    groupBy over the token stream."""
    return (
        _bucketed_tokens(df, text_col, id_col, n_buckets)
        .groupBy(F.col("tok").alias("token"))
        .agg(F.min("bucket").cast("bigint").alias("first_bucket"))
    )


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Heaps'-law vocabulary growth fit V(N) ≈ K·N^β over the corpus:
    how fast does the vocabulary grow as tokens accumulate — the
    curation dial that says whether more data keeps buying new
    language (β near the English-corpus 0.4-0.6 band) or the source
    has saturated/looped (β → 0: near-duplicate or templated text).
    Returns ONE row: (n_buckets_used, n_tokens, vocab_size, heaps_k,
    heaps_beta, r2); fit fields NULL with < 2 usable checkpoints.

    Decomposition (all corpus passes partial-agged, nothing
    corpus-sized downstream): documents take a DETERMINISTIC
    pseudo-random corpus order via the engine-portable md5 draw (the
    datasets.py split convention — Heaps' curve is defined over an
    arbitrary fixed order, and the hash order is the statistically
    clean one: no crawl-time topical drift in the checkpoints), exact
    integer bucket = h·B div 2³², ONE groupBy(bucket) sums tokens and
    ONE groupBy(token) takes min(bucket) for first occurrences. Both
    collapses are bounded at ≤ B integer rows each, so they collect
    to the driver (bounded by construction, the
    histogram_quantile_gate convention) and the cumulative spine plus
    the log-log OLS run in deterministic driver float64 in ascending
    bucket order. Rationale: ln/exp on the driver resolve to the SAME
    C libm the DuckDB oracle uses on whichever box runs the check,
    whereas in-plan ``F.log`` is JVM ``Math.log`` (fdlibm-pinned),
    which can differ from the box libm in the last bit — an error
    ``round(·, 6)`` amplifies into a hash break. The closed form is
    evaluated term-for-term in the oracle's order (sequential sums
    ascending by bucket, then cov/vx, exp((sy−β·sx)/n), cov²/(vx·vy));
    the 6-dp rounding stays in-plan so the Spark-round/DuckDB-round
    pairing every other query relies on is preserved. Both collapses
    are shared, by name, with the streaming twins
    (:func:`~..streaming.segments.vocab_growth_stream` /
    :func:`~..streaming.segments.bucket_tokens_stream`): the token
    first-bucket is a MIN monoid keyed by token and the per-bucket
    token count a SUM monoid, so live streamed state replays this
    fit exactly in foreachBatch. Executes the two collapse jobs
    eagerly at call time.
    """
    import math

    from pyspark.sql import types as T

    per_bucket = bucket_token_counts(df, text_col, id_col, n_buckets)
    first = (
        token_first_buckets(df, text_col, id_col, n_buckets)
        .groupBy(F.col("first_bucket").alias("__b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__nv"))
    )
    nt = {int(r[0]): int(r[1]) for r in per_bucket.collect()}
    nv = {int(r[0]): int(r[1]) for r in first.collect()}

    pts: list = []
    cn = cv = 0
    for b in range(n_buckets):
        cn += nt.get(b, 0)
        cv += nv.get(b, 0)
        if cn > 0 and cv > 0:
            pts.append((cn, cv))
    nb = len(pts)
    sx = sy = sxy = sxx = syy = 0.0
    for pcn, pcv in pts:
        x = math.log(float(pcn))
        y = math.log(float(pcv))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
        syy += y * y
    nbf = float(nb)
    vx = nbf * sxx - sx * sx
    vy = nbf * syy - sy * sy
    cov = nbf * sxy - sx * sy
    beta = cov / vx if nb >= 2 and vx > 0 else None
    k = math.exp((sy - beta * sx) / nbf) if beta is not None else None
    r2 = cov * cov / (vx * vy) if vx > 0 and vy > 0 else None

    schema = T.StructType(
        [
            T.StructField("n_buckets_used", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("vocab_size", T.LongType()),
            T.StructField("heaps_k", T.DoubleType()),
            T.StructField("heaps_beta", T.DoubleType()),
            T.StructField("r2", T.DoubleType()),
        ]
    )
    row = (
        nb,
        pts[-1][0] if pts else None,
        pts[-1][1] if pts else None,
        k,
        beta,
        r2,
    )
    return df.sparkSession.createDataFrame([row], schema).select(
        "n_buckets_used",
        "n_tokens",
        "vocab_size",
        F.round(F.col("heaps_k"), 6).alias("heaps_k"),
        F.round(F.col("heaps_beta"), 6).alias("heaps_beta"),
        F.round(F.col("r2"), 6).alias("r2"),
    )
