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

from typing import Iterable

from pyspark.sql import DataFrame
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
