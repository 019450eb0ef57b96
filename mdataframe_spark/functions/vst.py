"""Variance-stabilizing transformation (reference: transformations.py:155-218).

Native DESeq2-style VST (Anders & Huber 2010; DESeq2's parametric
fitType): median-of-ratios size factors → BLIND gene-wise dispersion
estimation (design ~1 — vst()'s default, recovered by calibrating
against the reference golden: the two-group design misses it by 0.86,
blind by 0.006) on ≤``nsub`` sampled genes → parametric trend
disp(q) = a0 + a1/q via gamma IRLS → closed-form transform

    vst(q) = log2( (1 + a1 + 2·a0·q + 2·√(a0·q·(1 + a1 + a0·q))) / (4·a0) )

with q = count/size-factor. The dispersion fit touches only the
sampled subset (phase A mapInPandas + a handful of aggregation
scalars); the transform itself is pure column arithmetic — zero UDF on
the hot path, Catalyst-codegen'd at any scale.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..transformer import Transformer
from . import edger

GRID_LENGTH = 25
GRID_RANGE = (-12.0, 8.0)


class VST(Transformer):
    """DESeq2-style variance-stabilizing transform, suffix ``" (VST)"``."""

    def __init__(
        self,
        samples_to_group: Optional[Dict[str, str]] = None,
        nsub: int = 1000,
        suffix=None,
        index_column: str = "__row_id",
    ):
        super().__init__("VST", samples_to_group, nsub)
        self.samples_to_group = samples_to_group
        self.nsub = nsub
        self.index_column = index_column
        self.suffix = " (VST)" if suffix is None or suffix is True else suffix
        self.trend_: Optional[tuple] = None  # (a0, a1) after fit

    def _transform(self, df: DataFrame) -> DataFrame:
        idx = self.index_column
        cols = [c for c in df.columns if c != idx]
        n = len(cols)

        # the input is typically a shuffle product (a pivot); the fit
        # below reads it four times (size factors, candidate stats,
        # stratified reps, phase A) and the returned transform a fifth —
        # pin it once, released via cache.release_caches
        from ..cache import persist_tracked

        df = persist_tracked(df)

        # --- size factors (median-of-ratios, distributed) ---
        from .deseq2 import size_factors_distributed

        sf = size_factors_distributed(df, cols)

        base_mean = sum(
            (F.col(c) / float(s) for c, s in zip(cols, sf)), F.lit(0.0)
        ) / n

        # --- sample ≤ nsub genes spanning the mean range (DESeq2 vst
        # filters baseMean > 5 and subsets evenly over the ordering).
        # Scale path: STRATIFIED sampling — log-width buckets over the
        # baseMean range, one deterministic representative per bucket
        # (min (__bm, id) struct). No global row_number window (that
        # serializes every candidate through one reducer); two bounded
        # aggregations + a broadcast semi-join instead. ---
        # one fused aggregation job: candidate count + log-range bounds
        # (previously two separate scalar probes = two full pivot scans)
        log_bm = F.log(F.greatest(F.col("__bm"), F.lit(1e-12)))
        candidates = df.withColumn("__bm", base_mean).filter(F.col("__bm") > 5)
        stats = candidates.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(log_bm).alias("lo"),
            F.max(log_bm).alias("hi"),
        ).collect()[0]
        n_cand = stats["n"]
        if n_cand == 0:
            candidates = df.withColumn("__bm", base_mean)
            stats = candidates.agg(
                F.count(F.lit(1)).alias("n"),
                F.min(log_bm).alias("lo"),
                F.max(log_bm).alias("hi"),
            ).collect()[0]
            n_cand = stats["n"]
        nsub = min(self.nsub, n_cand)
        if n_cand <= nsub:
            sampled = candidates
        else:
            lo, hi = float(stats["lo"]), float(stats["hi"])
            if hi <= lo:
                bkt = F.lit(1)
            else:
                bkt = F.least(
                    F.width_bucket(
                        F.log(F.greatest(F.col("__bm"), F.lit(1e-12))),
                        F.lit(lo), F.lit(hi), F.lit(nsub),
                    ),
                    F.lit(nsub),
                )
            reps = (
                candidates.withColumn("__bkt", bkt)
                .groupBy("__bkt")
                .agg(F.min(F.struct(F.col("__bm"), F.col(idx))).alias("__s"))
                .select(F.col(f"__s.{idx}").alias(idx))
            )
            sampled = candidates.join(F.broadcast(reps), idx)

        # --- phase A: blind (one-group) APL dispersion per sampled gene ---
        group = np.array(["all"] * n)
        spline_pts = np.linspace(GRID_RANGE[0], GRID_RANGE[1], GRID_LENGTH)
        spline_disp = 0.1 * 2.0 ** spline_pts
        schema_a = T.StructType(
            [
                T.StructField("gene_disp", T.DoubleType()),
                T.StructField("bm", T.DoubleType()),
            ]
        )

        def phase_a(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                y = pdf[cols].to_numpy(dtype=float)
                if len(y) == 0:
                    continue
                l0 = np.empty((len(y), GRID_LENGTH))
                for i, d in enumerate(spline_disp):
                    l0[:, i] = edger.adjusted_profile_lik(
                        d, y, group, np.log(sf)[None, :]
                    )
                pts = edger.maximize_interpolant(spline_pts, l0)
                yield pd.DataFrame(
                    {
                        "gene_disp": np.maximum(0.1 * 2.0 ** pts, 1e-8),
                        "bm": pdf["__bm"].to_numpy(dtype=float),
                    }
                )

        # the sample is ≤ nsub rows by construction — collect the
        # (dispersion, mean) pairs once (Arrow) and run the gamma IRLS
        # in numpy (12 sequential Spark jobs on ≤1000 rows cost ~2s of
        # pure scheduling latency; one collect costs one job). Sorting
        # the pairs makes the IRLS sums independent of partition order,
        # so the fitted (a0, a1) are bit-reproducible on the same data.
        pairs = (
            sampled.select(*cols, "__bm")
            .mapInPandas(phase_a, schema_a)
            .toPandas()
            .sort_values(["bm", "gene_disp"], kind="mergesort")
        )
        gd = pairs["gene_disp"].to_numpy(dtype=float)
        bm = pairs["bm"].to_numpy(dtype=float)
        use = (gd > 1e-7) & (bm > 0)
        gd, bm = gd[use], bm[use]
        a0, a1 = 0.1, 1.0
        for _ in range(12):
            mu_fit = a0 + a1 / bm
            w = 1.0 / mu_fit ** 2
            x = 1.0 / bm
            sw, swx = w.sum(), (w * x).sum()
            swxx, swy, swxy = (w * x * x).sum(), (w * gd).sum(), (w * x * gd).sum()
            det = sw * swxx - swx ** 2
            if not det:
                break
            new_a0 = (swxx * swy - swx * swxy) / det
            new_a1 = (sw * swxy - swx * swy) / det
            if abs(new_a0 - a0) < 1e-12 and abs(new_a1 - a1) < 1e-12:
                a0, a1 = new_a0, new_a1
                break
            a0, a1 = max(new_a0, 1e-8), max(new_a1, 0.0)
        self.trend_ = (a0, a1)

        # --- closed-form transform: pure column expressions ---
        out_cols = {}
        for c, s in zip(cols, sf):
            q = F.col(c) / float(s)
            out_cols[c] = F.log2(
                (
                    F.lit(1.0 + a1)
                    + 2.0 * a0 * q
                    + 2.0 * F.sqrt(a0 * q * (F.lit(1.0 + a1) + a0 * q))
                )
                / F.lit(4.0 * a0)
            )
        out = df.withColumns(out_cols)
        return self._apply_suffix(out, cols)
