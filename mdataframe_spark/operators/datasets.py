"""Dataset-preparation operators for training pipelines.

Deterministic hash-based train/val/test splitting and grouped greedy
sequence packing (the concat-and-chunk layout LLM training uses).
Both are pure DataFrame expressions — no UDFs, no driver state — and
both are SQL-replayable for the DuckDB correctness oracle.

Extension surface (the reference — MarcoMernberger/mdataframe — has no
dataset-split or packing operators; its closest analog is the
row-slicing pagination of mdataframe.py:1128-1140).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix width used for the split hash: 8 hex chars = 32 bits is
# plenty of resolution for split fractions and parses losslessly into
# a BIGINT on both engines (Spark conv(); DuckDB cast('0x…')).
_HASH_HEX_CHARS = 8
_HASH_SPACE = float(1 << (4 * _HASH_HEX_CHARS))


def split_hash_u(key, seed: int = 42):
    """Uniform [0,1) hash of ``key``: md5 of ``key || ':' || seed``,
    first 8 hex chars as an integer over 2^32. Engine-portable (md5 is
    bit-identical everywhere) and independent of row order, partition
    count, and corpus size — a doc keeps its split forever, the
    property that makes held-out sets stable as the corpus grows."""
    h = F.md5(F.concat_ws(":", F.col(key).cast("string"), F.lit(str(seed))))
    return F.conv(F.substring(h, 1, _HASH_HEX_CHARS), 16, 10).cast("bigint") / F.lit(
        _HASH_SPACE
    )


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    fractions: Dict[str, float] = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic split label by hashed key.

    ``fractions`` maps label -> fraction (must sum to <= 1; remainder
    falls into the last label). Assignment is a pure column expression
    over the scan — at 100 TB this is a zero-shuffle map, and the
    filter for one split pushes down to the parquet scan.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    u = split_hash_u(key, seed)
    labels = list(fractions)
    bounds = []
    acc = 0.0
    for lbl in labels[:-1]:
        acc += fractions[lbl]
        bounds.append((lbl, acc))
    expr = F.lit(labels[-1])
    for lbl, b in reversed(bounds):
        expr = F.when(u < b, F.lit(lbl)).otherwise(expr)
    return df.withColumn(out_col, expr)


def pack_sequences(
    df: DataFrame,
    group_cols: Sequence[str],
    length_col: str,
    order_col: str = "doc_id",
    capacity: int = 2048,
) -> DataFrame:
    """Greedy concat-and-chunk sequence packing within each group.

    Documents are concatenated in ``order_col`` order inside each
    group; the token stream is cut into bins of ``capacity``. Each doc
    gets ``bin_id`` (the bin its FIRST token lands in) and
    ``bin_offset`` (its start position inside that bin) — the layout a
    packed-pretokenized training shard uses. A document longer than
    ``capacity`` simply spans bins, as in real packing.

    Scale: one window shuffle keyed by ``group_cols`` — groups are
    shards (source/language/date buckets), so parallelism is the shard
    count and no global ordering is ever materialized. (A single-group
    call degenerates to one partition — use real shard keys at scale.)
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(length_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("__start", start)
        .withColumn("bin_id", (F.col("__start") / capacity).cast("bigint"))
        .withColumn("bin_offset", F.col("__start") % capacity)
        .drop("__start")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    rates: Dict[str, float],
    stratum_col: str,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff its
    md5 key draw falls under its stratum's rate (e.g. downsample
    boilerplate-heavy sources, upweight rare languages).

    Same hash as :func:`hash_split` but a different seed namespace
    (``seed`` is caller-chosen), so sampling composes with splitting
    without correlation. Pure column expression — zero-shuffle filter
    pushed at the scan; rows keep their sample decision as the corpus
    grows, so shards can be resampled incrementally.
    """
    u = split_hash_u(key, seed)
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, float(r)).otherwise(rate)
    return df.filter(u < rate)


def importance_sample(
    df: DataFrame,
    weight_col: str,
    key: str = "doc_id",
    rate_scale: float = 1.0,
    seed: int = 43,
    out_col: str = "kept",
) -> DataFrame:
    """Deterministic quality-weighted (importance) sampling: keep a row
    with probability min(weight * rate_scale, 1), decided by the
    engine-portable md5 draw — the DSIR/CCNet-style "sample
    proportionally to a quality score" stage, e.g. with the quality
    classifier's p_good or the composite quality_score as the weight.

    The weight is rounded to 6 dp before thresholding so the keep
    decision is identical across engines/partitionings even for rows
    whose weight sits at the draw boundary. Pure column expression:
    zero-shuffle, pushed to the scan at 100 TB, and a doc's decision is
    stable as the corpus grows (same property as hash_split).

    Null weights: a null weight keeps the row with probability 0, and
    the output column is two-valued (``kept`` is never null). This
    needs an explicit guard, not a bare expression: Spark's least()
    SKIPS nulls, so ``least(null * s, 1.0)`` is 1.0 — an unguarded
    null weight would be silently ALWAYS kept.
    """
    u = split_hash_u(key, seed)
    p = F.round(
        F.least(F.col(weight_col) * F.lit(float(rate_scale)), F.lit(1.0)), 6
    )
    return df.withColumn(
        out_col,
        F.when(F.col(weight_col).isNull(), F.lit(False)).otherwise(u < p),
    )


def domain_mixture_rates(
    df: DataFrame,
    domain_col: str,
    target_weights: Dict[str, float],
    budget_fraction: float = 0.5,
    token_col: str = "n_chars",
) -> Dict[str, float]:
    """Per-domain sampling rates that steer the corpus toward a target
    mixture at a token budget (the data-mixing step of an LLM
    pretraining pipeline, cf. DoReMi / The Pile's per-source weights).

    budget = budget_fraction · total_tokens; domain d's allocation is
    ``target_weights[d] · budget`` tokens, so

        rate_d = min(1, w_d · budget / tokens_d)

    One aggregation job (#domains scalars to the driver). Domains
    short of their allocation keep everything (rate capped at 1 — no
    upsampling; renormalize weights or raise the budget if exact
    mixture matters more than data volume). Domains absent from
    ``target_weights`` get rate 0.
    """
    stats = {
        r["d"]: float(r["t"])
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    total = sum(stats.values())
    budget = budget_fraction * total
    return {
        d: min(1.0, target_weights[d] * budget / stats[d])
        for d in stats
        if d in target_weights and stats[d] > 0
    }


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: Dict[str, float],
    budget_fraction: float = 0.5,
    token_col: str = "n_chars",
    key: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministically sample the corpus to the mixture computed by
    :func:`domain_mixture_rates` — the same zero-shuffle md5-threshold
    filter as :func:`stratified_sample`, so membership is stable under
    corpus growth and resharding."""
    rates = domain_mixture_rates(
        df, domain_col, target_weights, budget_fraction, token_col
    )
    return stratified_sample(df, key, rates, domain_col, 0.0, seed)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    key: str = "doc_id",
    fractions: Dict[str, float] = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that keeps NEAR-DUPLICATE GROUPS together.

    Splitting by per-document hash leaks: a near-copy of a training
    document lands in the eval set with probability (1 - its split
    fraction). Here the split hash is drawn from each document's
    near-dup GROUP representative instead: ``pairs`` (id_a, id_b — any
    candidate-pair output from the dedup family) is closed into
    connected components, every member adopts the component label
    (min id), singletons keep their own id, and :func:`hash_split`
    assigns the label. All members of a group land on the same side —
    by construction, never by sampling luck.

    Plan shape: the component closure is the O(log diameter)
    min-label/pointer-jump loop (dedup.connected_components); the
    split itself stays the zero-shuffle hash map, applied to the
    joined-in representative. One broadcast-size join when the pair
    graph is sparse (the normal case: most docs are singletons and
    never enter the join).
    """
    from .dedup import connected_components

    # the no-leakage guarantee rests on the rep join matching: a non-
    # castable type mismatch between the pair ids and df's key (e.g.
    # string vs bigint) would let every doc silently fall back to its
    # own id (null-matched join) and put near-dup pairs on both sides —
    # the exact failure this function exists to prevent. Fail loudly
    # instead. Integral-width differences (int vs bigint) are fine:
    # Spark's equi-join widens them losslessly with no null-miss.
    from .dedup import _is_integral

    kt = df.schema[key].dataType
    pt = pairs.schema["id_a"].dataType
    if kt != pt and not (_is_integral(kt) and _is_integral(pt)):
        raise TypeError(
            f"leakage_safe_split: pairs id type {pt.simpleString()} does not "
            f"match df[{key!r}] type {kt.simpleString()} — the group-"
            "representative join would silently miss and leak near-dups "
            "across splits"
        )
    cc = connected_components(pairs)
    labeled = df.join(
        cc.select(F.col("v").alias(key), F.col("component").alias("__rep")),
        key,
        "left",
    ).withColumn("__rep", F.coalesce(F.col("__rep"), F.col(key)))
    out = hash_split(labeled, key="__rep", fractions=fractions, seed=seed, out_col=out_col)
    return out.drop("__rep")


def balance_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str = "n_chars",
    tiebreak_cols: Sequence[str] = ("doc_id",),
    out_col: str = "shard",
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign every row to one of ``n_shards`` output shards with
    near-equal total weight (token budget) per shard — the layout step
    before writing training shards, where unbalanced shards stall the
    data-loader on the heaviest file.

    Assignment is SERPENTINE round-robin over the weight-descending
    order (rank r -> position r%n in even rounds, reversed in odd
    rounds): a deterministic one-pass relative of LPT scheduling whose
    per-round boustrophedon cancels the systematic bias plain
    round-robin gives shard 0. Max-minus-min shard load is bounded by
    the largest single weight (tested), and the assignment is a pure
    function of the weight order — stable across partitionings.

    Scale shape: the global weight rank uses the same range-partitioned
    decomposition as functions/stats.bh_adjust_scale_safe — bucket cuts
    from approxQuantile, ONE count aggregation whose O(B) offsets come
    back to the driver, then a bucket-PARTITIONED window (all buckets
    rank in parallel; no single-reducer global window). Bucketing is
    monotone in weight, with weight ties sharing a bucket, so
    offset + local rank is the exact global rank.

    ``weight_col`` must be non-null numeric. Adds ``out_col`` (int).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(spark.sparkContext.defaultParallelism * 4, 16)

    w = F.col(weight_col).cast("double")
    base = df.withColumn("__w", w)
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = sorted(set(base.approxQuantile("__w", probs, 0.001)))

    # bucket 0 holds the LARGEST weights (descending order), and rows
    # tied with a cut land in one bucket -> bucketing is monotone in
    # the sort key, the exactness precondition
    bkt = F.lit(0)
    for i, c in enumerate(reversed(cuts)):
        bkt = F.when(F.col("__w") < F.lit(float(c)), F.lit(i + 1)).otherwise(bkt)
    with_b = base.withColumn("__bkt", bkt)

    counts = {
        int(r["__bkt"]): int(r["n"])
        for r in with_b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[x for b, o in offsets.items() for x in (F.lit(b), F.lit(o))]
    )

    order = [F.col("__w").desc()] + [F.col(c).asc() for c in tiebreak_cols]
    w_rank = Window.partitionBy("__bkt").orderBy(*order)
    g = off_map[F.col("__bkt")] + F.row_number().over(w_rank) - F.lit(1)
    rnd = (g / F.lit(n_shards)).cast("bigint")
    pos = g % F.lit(n_shards)
    shard = F.when(rnd % 2 == 0, pos).otherwise(F.lit(n_shards - 1) - pos)
    return with_b.withColumn(out_col, shard.cast("int")).drop("__w", "__bkt")
