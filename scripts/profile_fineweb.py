"""Per-stage wall-clock profile of pipe_fineweb_recipe at sf0.1.

Dev tool: breaks the 11s bench figure into its constituent jobs so the
optimization aims at the real bottleneck. Mirrors the query's lineage
but materializes each stage separately with labeled jobs.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mdataframe_spark.cache import persist_tracked, release_caches
from mdataframe_spark.operators import dedup
from mdataframe_spark.operators.datasets import domain_mixture_sample, pack_sequences
from mdataframe_spark.operators.text import quality_gate, token_count
from mdataframe_spark.queries import _MIX_BUDGET_FRACTION, _MIX_SEED, _MIX_WEIGHTS, _t
from mdataframe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile_fineweb")
    for rnd in (1, 2):
        print(f"--- round {rnd} ({'cold' if rnd == 1 else 'warm'}) ---")
        run_stages(spark)
        release_caches()

    # bench-shape: the query AS BENCHED (one noop action, fresh caches)
    from mdataframe_spark.queries import QUERIES

    for label in ("bench-shape pass 2", "bench-shape pass 3"):
        t0 = time.perf_counter()
        noop(QUERIES["pipe_fineweb_recipe"](spark, SF_DIR))
        release_caches()
        print(f"  {label:<44s} {time.perf_counter() - t0:7.3f}s")


def run_stages(spark):
    t_all = time.perf_counter()
    marks = []

    def mark(label, t0):
        dt = time.perf_counter() - t0
        marks.append((label, dt))
        print(f"  {label:<44s} {dt:7.3f}s")

    docs = _t(spark, SF_DIR, "documents")
    t0 = time.perf_counter()
    n = docs.count()
    mark(f"scan count ({n} docs)", t0)

    gated = quality_gate(docs, entropy_band=(4.1, 6.0), min_tokens=10, min_stopwords=1)
    kept = persist_tracked(gated.filter(F.col("keep_quality")).select(*docs.columns))
    t0 = time.perf_counter()
    nk = kept.count()
    mark(f"gate + persist kept ({nk} rows)", t0)

    keep_ids = (
        kept.groupBy(F.md5(F.col("text")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = persist_tracked(kept.join(keep_ids, "doc_id", "left_semi"))
    t0 = time.perf_counter()
    n1 = s1.count()
    mark(f"exact dedup + persist s1 ({n1} rows)", t0)

    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(s1, num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    near_dups = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    nd = near_dups.count()
    mark(f"minhash+lsh pairs -> near_dups ({nd})", t0)

    s2 = persist_tracked(s1.join(near_dups, "doc_id", "left_anti"))
    t0 = time.perf_counter()
    n2 = s2.count()
    mark(f"anti join + persist s2 ({n2} rows)", t0)

    t0 = time.perf_counter()
    sampled = domain_mixture_sample(
        s2, "lang", _MIX_WEIGHTS, _MIX_BUDGET_FRACTION,
        token_col="n_chars", seed=_MIX_SEED,
    )
    mark("mixture rate probe (collect)", t0)

    withtok = sampled.withColumn("n_tokens", token_count(F.col("text")).cast("bigint"))
    out = pack_sequences(withtok, ["lang", "source"], "n_tokens",
                         order_col="doc_id", capacity=512)
    out = out.select("doc_id", "lang", "source", "n_tokens", "bin_id", "bin_offset")
    t0 = time.perf_counter()
    noop(out)
    mark("sample + token_count + pack + noop", t0)

    print(f"  {'TOTAL (incl. counts)':<44s} {time.perf_counter() - t_all:7.3f}s")


if __name__ == "__main__":
    main()
