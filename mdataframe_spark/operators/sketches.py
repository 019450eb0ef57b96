"""Frequency-sketch operators: heavy hitters without a full groupBy.

At 100 TB a `groupBy(key).count()` over a high-cardinality key (every
word, every URL host, every n-gram) shuffles the full distinct-key
table. When the question is only "which keys exceed a frequency
threshold", a two-phase candidates-then-verify plan answers it with
shuffle traffic bounded by (k · #batches), independent of key
cardinality — the Misra-Gries heavy-hitter decomposition (Misra &
Gries 1982; mergeability per Agarwal et al., "Mergeable Summaries",
PODS 2012):

1. **candidates** — each Arrow batch emits the keys whose WITHIN-BATCH
   frequency exceeds n_i/k. Since the batch is memory-resident,
   exact vectorized counts replace the streaming k-counter loop while
   keeping the identical guarantee, and fewer than k keys can clear
   the threshold, so each batch emits < k rows. An averaging argument
   makes the union across batches a SUPERSET of the true heavy
   hitters: if f(x) > n/k globally then f_i(x) > n_i/k in at least
   one batch i (otherwise f(x) = Σf_i ≤ Σn_i/k = n/k). Only these
   tiny candidate summaries ever shuffle.
2. **verify** — one aggregation restricted to the candidate set (a
   broadcast semi-join prunes the scan, so the groupBy state holds
   |candidates| keys, not the full vocabulary) computes EXACT counts,
   and the n/k threshold filters to the true heavy hitters.

The verification step is what makes the operator deterministic: the
intermediate candidate set depends on batch layout, but the output —
exact counts of keys with count > n/k — does not, and equals the
plain `GROUP BY ... HAVING count > n/k` a small-data engine would run
(the DuckDB oracle does exactly that).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 200,
    out_count: str = "count",
) -> DataFrame:
    """Exact counts of every key with frequency > n/k over the whole
    frame, via candidate generation + exact verification (module
    docstring). Returns (key_col, ``out_count``); keys at or below
    the threshold are absent. Nulls are ignored. ``k`` bounds both
    the per-batch summary size and the report threshold.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    keys = df.select(F.col(key_col).cast("string").alias("__key")).filter(
        F.col("__key").isNotNull()
    )

    schema = T.StructType([T.StructField("__key", T.StringType())])

    def summarize(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            vals = pdf["__key"]
            if not len(vals):
                continue
            vc = vals.value_counts()
            yield pd.DataFrame({"__key": vc.index[vc > len(vals) / k]})

    cand = keys.mapInPandas(summarize, schema).distinct()

    n_total = keys.count()
    if n_total == 0:
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(key_col, T.StringType()),
                    T.StructField(out_count, T.LongType()),
                ]
            ),
        )
    thresh = n_total / k

    # exact verification: the aggregation state is bounded by the
    # candidate count (the broadcast semi-join prunes before grouping)
    verified = (
        keys.join(F.broadcast(cand), "__key", "left_semi")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias(out_count))
        .filter(F.col(out_count) > F.lit(thresh))
    )
    return verified.select(F.col("__key").alias(key_col), out_count)


# md5-prefix width for Bloom positions: 15 hex chars = 60 bits parses
# losslessly into BIGINT on Spark (conv), Python (int(h,16)) and DuckDB
# (CAST('0x…')), and modulo-m keeps the three implementations
# bit-identical.
_BLOOM_HEX_CHARS = 15


def bloom_bit_positions(gram: Column, m: int, n_hashes: int) -> list:
    """The k Bloom positions of a gram as JVM-side column expressions:
    position_i = int(md5(gram ':' i)[:15 hex], 16) mod m — the same
    formula the Python probe and the SQL oracle replay."""
    out = []
    for i in range(n_hashes):
        h = F.md5(F.concat_ws(":", gram, F.lit(str(i))))
        out.append(
            (
                F.conv(F.substring(h, 1, _BLOOM_HEX_CHARS), 16, 10).cast(
                    "bigint"
                )
                % F.lit(m)
            )
        )
    return out


def bloom_contamination(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    m: int = 1 << 20,
    n_hashes: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Bloom-filter benchmark decontamination: flag training documents
    sharing any word ``n``-gram with the eval set, probing an m-bit
    Bloom filter instead of joining the eval-gram table.

    Why at 100 TB: text.ngram_contamination broadcasts the DISTINCT
    eval-gram STRINGS — fine for one benchmark, but a combined
    decontamination suite reaches 10^8+ grams (GBs of strings). The
    Bloom index compresses membership to m bits (128 KiB per 2^20 at
    any gram count), the classic space/precision trade: zero false
    NEGATIVES by construction (every true hit probes set bits), false
    positives at ~(1-e^{-kn/m})^k, i.e. over-flagging only — the safe
    direction for decontamination.

    Build: eval grams explode to k=``n_hashes`` md5 positions JVM-side
    (:func:`bloom_bit_positions`), ONE distinct on integer positions,
    collected as a packed numpy bitset and broadcast. Probe: the
    distinct (doc, gram) stream computes its k positions with the SAME
    JVM expressions the build used and an Arrow-batched pandas UDF
    tests the k bits with one vectorized numpy gather per batch — no
    Python hashing, no join, no shuffle except the final per-doc
    count. Every hash is md5 over ``gram:i``, so the probe,
    the JVM build, and a SQL engine agree bit-for-bit — the oracle
    replays the whole filter relationally (the dd_embedding_neardup
    pattern: approximate ALGORITHM, deterministic RESULT).

    Returns per training doc: n_grams, n_hit_grams_bloom,
    bloom_contaminated.
    """
    import numpy as np

    from ..cache import persist_tracked
    from .text import _word_ngrams, tokens

    def grams(frame, key, text):
        ws = frame.select(
            F.col(key), tokens(F.trim(F.col(text))).alias("__ws")
        )
        return ws.select(
            key, F.explode(_word_ngrams(F.col("__ws"), n)).alias("__g")
        ).distinct()

    e_grams = grams(eval_df, eval_id_col, eval_text_col).select("__g").distinct()
    pos_rows = (
        e_grams.select(
            F.explode(F.array(*bloom_bit_positions(F.col("__g"), m, n_hashes))).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    bits = np.zeros(m, dtype=bool)
    bits[[r["pos"] for r in pos_rows]] = True
    bc = df.sparkSession.sparkContext.broadcast(np.packbits(bits))

    # probe positions are computed JVM-SIDE with the same
    # bloom_bit_positions expressions the build used (identical md5
    # formula, so build/probe/oracle stay bit-for-bit) — the Python
    # side is ONE vectorized numpy bit test per Arrow batch. The
    # earlier row-at-a-time hashlib.md5 loop inside the UDF was the
    # query's hottest stage (30s aggregate CPU at sf0.1; guide §4.2:
    # hash in the JVM, hand Python only the narrow integer columns).
    @F.pandas_udf("boolean")
    def probe(ps: pd.Series) -> pd.Series:
        packed = bc.value
        arr = np.array(ps.tolist(), dtype=np.int64)
        if arr.size == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        hits = (packed[arr >> 3] >> (7 - (arr & 7))) & 1
        return pd.Series(hits.all(axis=1))

    t_grams = persist_tracked(grams(df, id_col, text_col))
    flagged = t_grams.withColumn(
        "__hit",
        probe(F.array(*bloom_bit_positions(F.col("__g"), m, n_hashes))),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("__hit").cast("bigint")).alias("n_hit_grams_bloom"),
        F.max("__hit").alias("bloom_contaminated"),
    )


def count_min_positions(key: Column, depth: int, width: int) -> list:
    """The d Count-Min (row, bucket) positions of a key: exactly the
    bloom_bit_positions hash family (ONE implementation — the Spark
    build, the Python probe, and the SQL oracle must stay
    bit-identical, so the formula lives in one place)."""
    return bloom_bit_positions(key, width, depth)


def count_min_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """The Count-Min counter table: (__row, __b, __c) cells, one
    partial-agged groupBy over the md5-position explode. NULL keys are
    dropped (concat_ws would otherwise hash a NULL key as md5("i")
    Spark-side while the SQL replay's `key || ':' || i` yields NULL
    buckets — divergent sketches); a NULL count is not a frequency
    query. Cells are ADDITIVE — two sketches over disjoint data merge
    by summing cells, which is what the streaming twin
    (streaming/sketches.py count_min_stream) exploits."""
    k = F.col(key_col).cast("string")
    pos = count_min_positions(k, depth, width)
    exploded = df.filter(F.col(key_col).isNotNull()).select(
        F.posexplode(F.array(*pos)).alias("__row", "__b")
    )
    return exploded.groupBy("__row", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )


def count_min_estimates(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch frequency estimates: build a depth×width
    counter table over ``df[key_col]`` and estimate the count of every
    key in ``probes`` (a frame with the same-named key column) as the
    MIN over its depth cells. Returns (key, cm_estimate).

    Why at 100 TB: an exact per-key count table is key-cardinality-
    sized (billions of rows for ids); the sketch is depth×width cells
    REGARDLESS of cardinality, mergeable across partitions/streams
    (counter addition), with the classic one-sided guarantee —
    estimates NEVER undercount, and overcount ≤ e·N/width with
    probability 1−(1/2)^depth.

    Plan shape: each input row explodes to depth (row, bucket) pairs
    map-side (md5 arithmetic, zero Python) and ONE partial-agged
    groupBy builds the cell table; probes join the broadcast cells on
    (row, bucket) and one model-bounded groupBy takes the min. Every
    hash is md5 over ``key ':' i`` — approximate ALGORITHM,
    deterministic RESULT (the bloom_contamination convention), so an
    oracle replays the sketch relationally.
    """
    cells = count_min_cells(df, key_col, depth=depth, width=width)
    pk = F.col(key_col).cast("string")
    ppos = count_min_positions(pk, depth, width)
    probe_cells = probes.filter(F.col(key_col).isNotNull()).select(
        key_col, F.posexplode(F.array(*ppos)).alias("__row", "__b")
    )
    joined = probe_cells.join(F.broadcast(cells), ["__row", "__b"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("__c"), F.lit(0))).cast("bigint").alias(
            "cm_estimate"
        )
    )


def histogram_cells(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Fixed-range equi-width histogram cells (__bin, __c) — the
    mergeable quantile sketch: the bin range is DATA-INDEPENDENT
    (caller-supplied [lo, hi)), so cells are a pure SUM monoid —
    two sketches over disjoint data merge by adding cells, a streaming
    aggregation's running cells equal the batch build
    (streaming/sketches.py histogram_stream), and a backfill merges
    with the live sketch. Out-of-range values clamp into the edge
    bins (they count, with edge-bin accuracy); NULLs drop (not a
    measurement). ONE partial-agged groupBy; state ≤ n_bins cells
    regardless of corpus size.
    """
    if not hi > lo:
        raise ValueError("histogram_cells: need hi > lo")
    width = (hi - lo) / n_bins
    x = F.col(col).cast("double")
    # NaN is not a measurement either — and it bins DIVERGENTLY
    # (Spark's floor(NaN) casts to bin 0; DuckDB's least() treats NaN
    # as largest and clamps to the top bin), so it must drop with NULL
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width))
    b = F.greatest(F.lit(0).cast("bigint"), F.least(F.lit(n_bins - 1).cast("bigint"), raw)).cast(
        "int"
    )
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .groupBy(b.alias("__bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )


def histogram_quantile_gate(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    probs: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from the histogram sketch, CERTIFIED against
    the exact percentiles (the count_min_estimates convention: the
    exact side exists only to certify the sketch): for each p, the
    estimate interpolates inside the first bin whose cumulative count
    crosses p·n, and the guarantee |est − exact| ≤ 2·bin_width holds
    for in-range data (the estimate lies in the crossing bin; the
    exact order statistic lies in the same or a rank-adjacent bin).
    Returns (p, hist_estimate, exact_value, abs_err, within_bound).

    Why at 100 TB: exact percentiles need a global sort or a
    per-value rank table; the sketch is ≤ n_bins additive cells
    REGARDLESS of cardinality, mergeable across partitions, streams
    and backfills — accuracy is the range/n_bins knob, certified here
    instead of assumed.

    EXECUTES EAGERLY at call time (r13 advice, documented contract):
    the ≤ n_bins cell collect is a Spark job that runs when the frame
    is CONSTRUCTED, not when it is acted on — plan-capture tooling
    pays that job, and a source that is nondeterministically
    recomputed between construction and action feeds the exact arm a
    second snapshot (pass a persisted/checkpointed df if the source
    is nondeterministic; the declared queries read deterministic
    parquet).

    Plan shape (round-13): the cell build is ONE partial-agged corpus
    pass whose ≤ n_bins cells collect to the driver; crossing picks,
    order-statistic ranks and interpolation are driver arithmetic over
    those cells. The exact arm is a SECOND corpus pass that keeps only
    the ≤ 2·|probs| bins holding a needed order statistic and ranks
    each bin's distinct values with a bin-PARTITIONED cumsum — never
    Spark's percentile() aggregate, whose final merge holds every
    distinct value of the corpus in ONE task.
    """
    width = (hi - lo) / n_bins
    spark = df.sparkSession
    # ONE corpus pass builds the ≤ n_bins cell table; it is MODEL-SIZED
    # by construction, so every DECISION below (crossing bin per p,
    # order-statistic ranks, their bins and rank offsets, the estimate
    # interpolation) is driver arithmetic over ≤ n_bins integers — the
    # guide-§8 shape: decide on the small proxy, send only the per-bin
    # value lookups back to the cluster. (The earlier in-plan version
    # spent ~7 broadcast-build jobs shepherding ≤ 220-row frames.)
    cell_rows = sorted(
        (int(r["__bin"]), int(r["__c"]))
        for r in histogram_cells(df, col, lo, hi, n_bins).collect()
    )
    n = sum(c for _, c in cell_rows)
    cum_rows = []  # (bin, c, cum_before)
    acc = 0
    for b, c in cell_rows:
        cum_rows.append((b, c, acc))
        acc += c

    def _bin_at(rank: int):
        """Smallest bin whose cumulative count reaches integer rank."""
        for b, c, before in cum_rows:
            if before + c >= rank:
                return b, c, before
        return None

    # estimates: interpolate inside the first bin whose cum crosses
    # p·n — float64 arithmetic identical op-for-op to the previous
    # in-plan expression (lo + width · (bin + (p·n − cum_before)/c))
    est_rows = []  # (p, raw_estimate)
    tgt_rows = []  # (p, pos, which, rank, bin, rank_offset_before_bin)
    for p in (float(x) for x in probs):
        if n == 0:
            break
        pn = p * n
        hit = next(
            ((b, c, before) for b, c, before in cum_rows if before + c >= pn),
            None,
        )
        if hit is None:
            continue
        eb, ec, ebefore = hit
        est_rows.append((p, lo + width * (eb + (pn - ebefore) / ec)))
        # exact arm: percentile()'s order statistics at pos = p·(n−1)
        pos = p * (n - 1)
        k = int(math.floor(pos))
        for w_i, r in enumerate((k + 1, min(k + 2, n))):
            tb, tc, tbefore = _bin_at(r)
            tgt_rows.append((p, pos, w_i, r, tb, tbefore))
    out_schema = (
        "p double, hist_estimate double, exact_value double, "
        "abs_err double, within_bound boolean"
    )
    if not tgt_rows:
        # empty input: the percentile aggregate produced no rows either
        return spark.createDataFrame([], out_schema)
    # the exact arm must drop exactly what the sketch drops: NULL and
    # NaN (histogram_cells excludes both, and so does the DuckDB oracle
    # via NOT isnan) — otherwise a NaN-bearing column makes the two
    # arms disagree on the population and voids the 2·bin_width bound.
    #
    # Exact percentiles WITHOUT percentile()'s corpus-sized buffer
    # (round-13): Spark's exact percentile aggregate ships EVERY
    # distinct (value, count) into ONE final-merge task — a
    # single-task corpus-sized sort at scale (measured 2.9s of a 4s
    # query at sf0.1). Instead, the cell cumsum above located the
    # ≤ 2·|probs| order-statistic ranks' bins; ONE second scan keeps
    # only rows of those bins, and each needed value comes from a
    # PER-BIN distinct-value cumsum — the largest single-reducer
    # structure is one bin's distinct values (~1/n_bins of the old
    # buffer; n_bins is the knob). The interpolation reproduces
    # percentile()'s formula term for term:
    # v_lo + (pos − floor(pos)) · (v_hi − v_lo) at pos = p·(n−1).
    xd = F.col(col).cast("double")
    tgt = spark.createDataFrame(
        tgt_rows,
        "p double, __pos double, __w int, __r long, __bin int, __base long",
    )
    need = sorted({r[4] for r in tgt_rows})
    # same clamped-bin expression as histogram_cells: monotone in the
    # value, so per-bin cumulative counts ARE global rank ranges
    raw_bin = F.floor((xd - F.lit(float(lo))) / F.lit(width))
    bin_of = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.lit(n_bins - 1).cast("bigint"), raw_bin),
    ).cast("int")
    vals = (
        df.filter(xd.isNotNull() & ~F.isnan(xd))
        .select(xd.alias("__x"), bin_of.alias("__bin"))
        .filter(F.col("__bin").isin(need))
        .groupBy("__bin", "__x")
        .agg(F.count(F.lit(1)).alias("__vc"))
    )
    wv = Window.partitionBy("__bin").orderBy("__x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vals = vals.withColumn("__lcum", F.sum("__vc").over(wv))
    got = (
        vals.join(F.broadcast(tgt), "__bin")
        .filter(F.col("__base") + F.col("__lcum") >= F.col("__r"))
        .groupBy("p", "__pos", "__w")
        .agg(F.min("__x").alias("__v"))
    )
    exact = (
        got.groupBy("p")
        .agg(
            F.min(F.when(F.col("__w") == 0, F.col("__v"))).alias("__vlo"),
            F.min(F.when(F.col("__w") == 1, F.col("__v"))).alias("__vhi"),
            F.first("__pos").alias("__fpos"),
        )
        .select(
            "p",
            (
                F.col("__vlo")
                + (F.col("__fpos") - F.floor("__fpos"))
                * (F.col("__vhi") - F.col("__vlo"))
            ).alias("__exact"),
        )
    )
    est = spark.createDataFrame(est_rows, "p double, __est double")
    bound = 2.0 * width
    return (
        est.join(exact, "p")
        .select(
            "p",
            F.round(F.col("__est"), 6).alias("hist_estimate"),
            F.round(F.col("__exact"), 6).alias("exact_value"),
            F.round(F.abs(F.col("__est") - F.col("__exact")), 6).alias(
                "abs_err"
            ),
            (
                F.abs(F.col("__est") - F.col("__exact")) <= F.lit(bound)
            ).alias("within_bound"),
        )
        .orderBy("p")
    )


def count_min_join_size(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Join-cardinality estimate from Count-Min INNER PRODUCTS,
    certified against the exact |A ⋈_key B| (Cormode & Muthukrishnan
    2005): per depth row d, est_d = Σ_w cmA[d,w]·cmB[d,w]; the
    estimate is min_d est_d. Guarantees, certified in the output:
    the estimate NEVER undercounts (hash collisions only add
    cross-terms), and overcounts by ≤ e·N_A·N_B/width with
    probability 1−(1/2)^depth. Returns ONE row: (n_a, n_b,
    exact_join_size, cm_estimate, overcount, within_bound).

    Why at 100 TB: the exact join size needs the join (or two
    key-cardinality-sized count tables joined); the sketch is
    2·depth×width additive cells built in one pass per side,
    MERGEABLE across partitions/streams — the shuffle-planning probe
    ("will this join explode?") before committing to the join itself.
    The exact side here is the CERTIFICATION side only (the
    sk_countmin_gate convention). Accuracy is the width knob: the
    expected overcount is (N_A·N_B − J)/width per row, so size width
    to the N_A·N_B product scale you need resolved.

    Plan shape: two count_min_cells builds (one partial-agged groupBy
    each); the inner product is a cells-sized equi-join + depth-row
    groupBy; the exact side is two per-key count tables joined on the
    key with a decimal(38,0) product sum.
    """
    from ..cache import persist_tracked

    # pinned: each ≤ depth×width cell table feeds the inner product
    # AND the n_a/n_b row sums below — one corpus pass per side
    cells_a = persist_tracked(
        count_min_cells(df_a, key_col, depth=depth, width=width)
    )
    cells_b = persist_tracked(
        count_min_cells(df_b, key_col, depth=depth, width=width)
    )
    dec = "decimal(38,0)"
    per_row = (
        cells_a.join(
            cells_b.select(
                "__row", "__b", F.col("__c").alias("__cb")
            ),
            ["__row", "__b"],
        )
        .groupBy("__row")
        .agg(
            F.sum(F.col("__c").cast(dec) * F.col("__cb")).alias("__est")
        )
    )
    spark = df_a.sparkSession
    spine = spark.range(depth).select(F.col("id").cast("int").alias("__row"))
    est = (
        spine.join(per_row, "__row", "left")
        .agg(
            F.min(
                F.coalesce(F.col("__est"), F.lit(0).cast(dec))
            ).alias("__cm")
        )
    )
    ka = df_a.filter(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("__k")
    ).agg(F.count(F.lit(1)).alias("__na"))
    kb = df_b.filter(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("__k")
    ).agg(F.count(F.lit(1)).alias("__nb"))
    exact = ka.join(kb, "__k").agg(
        F.coalesce(
            F.sum(F.col("__na").cast(dec) * F.col("__nb")),
            F.lit(0).cast(dec),
        ).alias("__exact")
    )
    # n_a/n_b from the sketch itself: every non-null key contributes
    # exactly one cell per depth row, so the row-0 cell sum IS the
    # non-null row count — no third corpus pass per side
    tot = (
        cells_a.filter(F.col("__row") == 0)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n_a"))
        .crossJoin(
            cells_b.filter(F.col("__row") == 0).agg(
                F.coalesce(F.sum("__c"), F.lit(0)).alias("n_b")
            )
        )
    )
    acc = tot.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(exact))
    over = F.col("__cm") - F.col("__exact")
    # The certified constant IS the documented one: the classic CM
    # guarantee e·N_A·N_B/width (Markov on the per-row expected
    # overcount (N_A·N_B − J)/width, min over depth rows → failure
    # probability ≤ e^-depth). An earlier 3.0 slack constant let a
    # sketch violating the documented bound still report
    # within_bound=true.
    bound = F.ceil(
        F.lit(math.e)
        * F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / F.lit(float(width))
    )
    return acc.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("__exact").cast("bigint").alias("exact_join_size"),
        F.col("__cm").cast("bigint").alias("cm_estimate"),
        over.cast("bigint").alias("overcount"),
        (
            (over >= 0) & (over.cast("double") <= bound.cast("double"))
        ).alias("within_bound"),
    )
