"""Per-stage wall-clock profile of the heavy bench queries at sf0.1.

Dev tool (not part of the driver contract): pinpoints which Spark job
inside stat_edger_exact_test / stat_deseq2 / dd_minhash_lsh /
ml_dbscan_classes the bench seconds actually go to, so perf work aims
at the real bottleneck instead of the plan we imagine.

Usage: python scripts/profile_heavy.py [edger|minhash|dbscan|topk|deseq2|all]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from mdataframe_spark.cache import release_caches
from mdataframe_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = []

    def mark(self, label):
        t = time.perf_counter()
        self.marks.append((label, t - self.t0))
        print(f"  {label:<42s} {t - self.t0:7.3f}s")
        self.t0 = t


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_edger(spark):
    from mdataframe_spark.functions import edger
    from mdataframe_spark.functions.differential import (
        GRID_LENGTH, GRID_RANGE, MIN_ROW_SUM, EdgeR_Unpaired,
        _distributed_prior_df, _TrendMixer,
    )
    from mdataframe_spark.functions.norm import tmm_norm_factors
    from mdataframe_spark.queries import _six_counts
    from mdataframe_spark.cache import persist_tracked

    print("== stat_edger_exact_test stages ==")
    t = Timer()
    counts_plan = _six_counts(spark, SF_DIR)
    tr = EdgeR_Unpaired(
        "grpA", "grpB",
        {"grpA": ["A_F", "N_F", "N_O"], "grpB": ["R_F", "A_O", "R_O"]},
        "flags",
    )
    cols = tr.columns_a + tr.columns_b
    idx = tr.index_column
    counts = persist_tracked(counts_plan.select(idx, *cols))
    counts.count()
    t.mark("pivot + persist counts")

    aggs = [F.sum(c).alias(f"lib_{c}") for c in cols] + [
        F.expr(f"percentile(`{c}`, 0.75)").alias(f"q75_{c}") for c in cols
    ]
    row = counts.agg(*aggs).collect()[0]
    lib = {c: float(row[f"lib_{c}"]) for c in cols}
    f75 = {c: float(row[f"q75_{c}"]) / lib[c] for c in cols}
    t.mark("lib sizes + q75 agg")
    factors = tmm_norm_factors(counts, cols, idx, lib=lib, f75=f75)
    t.mark("tmm_norm_factors")

    import pandas as pd
    from pyspark.sql import types as T
    from typing import Iterator

    eff_lib = np.array([lib[c] * factors[c] for c in cols])
    n_a = len(tr.columns_a)
    group = np.array(["a"] * n_a + ["b"] * (len(cols) - n_a))
    spline_pts = np.linspace(GRID_RANGE[0], GRID_RANGE[1], GRID_LENGTH)
    spline_disp = 0.1 * 2.0 ** spline_pts

    schema_a = T.StructType(
        list(counts.schema.fields)
        + [T.StructField(f"l0_{i}", T.DoubleType()) for i in range(GRID_LENGTH)]
        + [T.StructField("alc05", T.DoubleType()), T.StructField("sel", T.BooleanType())]
    )

    def phase_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            y = pdf[cols].to_numpy(dtype=float)
            out = pdf.copy()
            for i, d in enumerate(spline_disp):
                out[f"l0_{i}"] = edger.adjusted_profile_lik(
                    d, y, group, np.log(eff_lib)[None, :]
                )
            out["alc05"] = edger.ave_log_cpm(y, eff_lib)
            out["sel"] = y.sum(axis=1) >= MIN_ROW_SUM
            yield out

    curves = persist_tracked(counts.mapInPandas(phase_a, schema_a))
    sel_curves = curves.filter(F.col("sel"))
    agg_row = sel_curves.agg(
        *[F.sum(f"l0_{i}").alias(f"s{i}") for i in range(GRID_LENGTH)],
        F.count(F.lit(1)).alias("n_genes"),
    ).collect()[0]
    n_genes = agg_row["n_genes"]
    t.mark(f"phase A (APL grid) + EB agg [{n_genes} genes]")

    n_bins = int(min(max(n_genes, 1), 64))
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = sel_curves.approxQuantile("alc05", probs, 0.001)
    t.mark("approxQuantile bins")
    bin_expr = F.lit(0)
    for ci, cut in enumerate(cuts):
        bin_expr = F.when(F.col("alc05") > cut, ci + 1).otherwise(bin_expr)
    bin_rows = (
        sel_curves.withColumn("__bin", bin_expr)
        .groupBy("__bin")
        .agg(
            *[F.avg(f"l0_{i}").alias(f"c{i}") for i in range(GRID_LENGTH)],
            F.avg("alc05").alias("center"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    t.mark("trend bin groupBy")
    bin_centers = np.array([r["center"] for r in bin_rows])
    bin_counts = np.array([r["n"] for r in bin_rows], dtype=float)
    bin_curves = np.array([[r[f"c{i}"] for i in range(GRID_LENGTH)] for r in bin_rows])
    span = 1.0 if n_genes <= 50 else 0.25 + 0.75 * (50.0 / n_genes) ** 0.5
    trend = _TrendMixer(bin_centers, bin_counts, bin_curves, span)
    prior_df = _distributed_prior_df(
        sel_curves, cols, n_a, eff_lib, spline_pts, trend, n_genes=n_genes
    )
    t.mark("prior df pass")

    out = tr(counts_plan)
    sel = out.select(idx, tr.p_column)
    noop(sel)
    t.mark("full pipeline re-run (phase B + BH)")
    release_caches()


def profile_minhash(spark):
    from mdataframe_spark.operators import dedup
    from mdataframe_spark.cache import persist_tracked

    print("== dd_minhash_lsh stages ==")
    t = Timer()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = dedup.minhash_signatures(d, num_hashes=16)
    sigs = persist_tracked(sigs)
    n = sigs.count()
    t.mark(f"signatures (shingle+md5+groupBy) [{n} docs]")
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    noop(pairs)
    t.mark("band explode + cap + self-join + distinct")
    release_caches()
    # uncached end-to-end for reference
    t2 = Timer()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = dedup.minhash_signatures(d, num_hashes=16)
    noop(dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4))
    t2.mark("end-to-end (as benched)")
    release_caches()


def profile_dbscan(spark):
    from mdataframe_spark.queries import ml_dbscan_classes

    print("== ml_dbscan_classes ==")
    t = Timer()
    noop(ml_dbscan_classes(spark, SF_DIR))
    t.mark("end-to-end")
    release_caches()


def profile_topk(spark):
    from mdataframe_spark.queries import sim_cosine_topk

    print("== sim_cosine_topk ==")
    t = Timer()
    noop(sim_cosine_topk(spark, SF_DIR))
    t.mark("end-to-end")
    release_caches()


def profile_deseq2(spark):
    from mdataframe_spark.queries import stat_deseq2

    print("== stat_deseq2 ==")
    t = Timer()
    noop(stat_deseq2(spark, SF_DIR))
    t.mark("end-to-end")
    release_caches()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    runs = {
        "edger": profile_edger,
        "minhash": profile_minhash,
        "dbscan": profile_dbscan,
        "topk": profile_topk,
        "deseq2": profile_deseq2,
    }
    for name, fn in runs.items():
        if which in (name, "all"):
            # warm pass at sf0.001 to absorb codegen/JIT like bench does
            fn(spark)
            print("  -- second pass (warm) --")
            fn(spark)


if __name__ == "__main__":
    main()
