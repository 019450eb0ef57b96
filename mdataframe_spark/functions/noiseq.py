"""Native NOISeq differential expression (reference: differential.py:526-740).

Implements the NOISeq-sim ("no replicates") method of Tarazona et al.
2011 natively: per-gene signal statistics M = log2 ratio and D =
absolute difference of TMM-normalized expression between the first
sample of each condition, ranking = sign(M)·√(M²+D²), and an empirical
probability from a simulated technical-replicate noise cloud.

Reverse-engineered parity (verified against the reference's R-derived
goldens, tests/test_differential.py:301-309): with replicates="no" the
observed signal uses ONLY the first column of each condition,
normalized by the two-sample TMM factors scaled to the mean of the two
library sizes. Our M/D/ranking match the golden at all published
decimals (1e-7). The probability column depends on R's multinomial RNG
stream and cannot be bit-reproduced; our simulation follows the
published scheme (nss replicates of size pnr·total with uniform
variability v, M-D noise from within-condition replicate pairs) with a
seeded numpy generator — prob is asserted within sampling tolerance.

Scale shape: M/D/rank are pure column expressions (two scan columns +
two scalar factors). The noise cloud is built per gene partition with
mapInPandas (deterministic per-gene seeds); prob compares each gene's
(|M|,|D|) against the GLOBAL cloud — exact when the cloud is small
(collected + broadcast), 2-D-histogram approximated beyond
``max_exact_noise`` points.
"""

from __future__ import annotations

import hashlib
from typing import Collection, Dict, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import persist_tracked
from ..transformer import Transformer
from .norm import tmm_norm_factors


def _dominance_counts(nm_sorted, nd_by_m, am, ad, chunk: int = 8192):
    """For each query g: ``|{j : nm_sorted[j] <= am[g] and
    nd_by_m[j] <= ad[g]}|`` — the 2-D dominance count of the noise
    cloud at the gene's (|M|, |D|), with the noise pre-sorted by |M|.

    Exact offline sweep instead of the naive per-gene slice-and-count
    (O(G·N) — 8×10⁹ element ops at 20k genes × 400k noise points):
    process genes in increasing |M| order, maintaining the noise |D|
    values with Mn <= |M| as a sorted prefix extended in chunks; each
    gene costs one binary search on the sorted prefix plus a brute
    count over the < ``chunk`` not-yet-merged tail. O((N+G)·log + G·C).
    Pure set arithmetic — bit-identical to the naive count.
    """
    total = len(nm_sorted)
    g = len(am)
    out = np.zeros(g, dtype=np.int64)
    if total == 0 or g == 0:
        return out
    hi = np.searchsorted(nm_sorted, am, side="right")
    order = np.argsort(hi, kind="stable")
    sorted_prefix = np.empty(0)
    boundary = 0
    for gi in order:
        h = hi[gi]
        if h - boundary > chunk:
            sorted_prefix = np.sort(np.concatenate([sorted_prefix, nd_by_m[boundary:h]]))
            boundary = h
        full = np.searchsorted(sorted_prefix, ad[gi], side="right")
        partial = int((nd_by_m[boundary:h] <= ad[gi]).sum())
        out[gi] = full + partial
    return out


class NOISeq(Transformer):
    """NOISeq-sim differential expression (M, D, Prob, Rank)."""

    def __init__(
        self,
        condition_a: str,
        condition_b: str,
        condition_to_columns: Dict[str, Collection[str]],
        comparison_name: Optional[str] = None,
        index_column: str = "__row_id",
        **parameters,
    ):
        super().__init__(
            "NOISeq", condition_a, condition_b, condition_to_columns, comparison_name
        )
        self.condition_a = condition_a
        self.condition_b = condition_b
        self.columns_a = list(condition_to_columns[condition_a])
        self.columns_b = list(condition_to_columns[condition_b])
        self.index_column = index_column
        self.parameters = parameters
        self.k = parameters.get("k", 0.5)
        self.norm = parameters.get("norm", "tmm")
        if self.norm not in ("tmm", "rpkm", "uqua", "n"):
            raise ValueError(
                f"Only ['tmm', 'rpkm', 'uqua', 'n'] are accepted as values for norm,"
                f" given was {self.norm}"
            )
        self.pnr = parameters.get("pnr", 0.2)
        self.nss = parameters.get("nss", 5)
        self.v = parameters.get("v", 0.02)
        self.seed = parameters.get("seed", 42)
        self.max_exact_noise = parameters.get("max_exact_noise", 2_000_000)
        self.compute_prob = parameters.get("compute_prob", True)
        self.suffix = f" ({comparison_name})" if comparison_name else f" ({self.name})"

    # reference column contract (differential.py:570-600)
    @property
    def logFC(self):
        return "logFC" + self.suffix

    @property
    def D(self):
        return "D" + self.suffix

    @property
    def prob(self):
        return "Prob" + self.suffix

    @property
    def rank(self):
        return "Rank" + self.suffix

    @property
    def columns(self):
        return [self.logFC, self.prob, self.rank, self.D]

    def _transform(self, df: DataFrame) -> DataFrame:
        idx = self.index_column
        ca, cb = self.columns_a[0], self.columns_b[0]
        # the input is typically a shuffle product (a pivoted count
        # matrix) re-read by every action below (lib sums, TMM, the
        # noise-path collects and the output itself) — pin it once;
        # released via cache.release_caches
        pair = persist_tracked(df.select(idx, ca, cb))

        # two-sample normalization factors (scalar collect)
        sums = pair.agg(F.sum(ca).alias("a"), F.sum(cb).alias("b")).collect()[0]
        lib = np.array([float(sums["a"]), float(sums["b"])])
        if self.norm == "tmm":
            factors = tmm_norm_factors(pair, [ca, cb], idx)
            scale = lib.mean() / (lib * np.array([factors[ca], factors[cb]]))
        elif self.norm == "uqua":
            q = pair.agg(
                F.expr(f"percentile(`{ca}`, 0.75)").alias("a"),
                F.expr(f"percentile(`{cb}`, 0.75)").alias("b"),
            ).collect()[0]
            uq = np.array([float(q["a"]), float(q["b"])])
            scale = uq.mean() / uq
        else:  # "n" (none) or rpkm without lengths: library-size scaling
            scale = lib.mean() / lib

        k = float(self.k)
        na = F.when(F.col(ca) == 0, F.lit(k)).otherwise(F.col(ca)) * float(scale[0])
        nb = F.when(F.col(cb) == 0, F.lit(k)).otherwise(F.col(cb)) * float(scale[1])
        signal = pair.select(
            idx,
            F.col(ca),
            F.col(cb),
            F.log2(na / nb).alias("__m"),
            F.abs(na - nb).alias("__d"),
        )

        # noise cloud. The multinomial couples all genes of a sample, so
        # the exact simulation needs the whole count vector: below the
        # cap, collect the two columns (a few MB for real gene counts)
        # and simulate exactly; above it, approximate with independent
        # per-gene binomials (the multinomial marginals — the coupling
        # is O(p_g) and negligible for large totals), distributed.
        if not self.compute_prob:
            # M/D/Rank are closed-form; callers that don't need Prob
            # (e.g. the hash-checked deterministic layer) skip the
            # whole noise-cloud simulation
            out = signal.withColumn("__prob", F.lit(None).cast("double"))
            return self._finalize(out, idx, ca, cb)
        # one Arrow collect decides the exact-vs-approximate branch AND
        # feeds the exact simulation (was a separate count() job);
        # max_exact_noise bounds the driver memory either way
        pair_pdf = None
        n_genes = pair.limit(self.max_exact_noise + 1).count()
        if n_genes <= self.max_exact_noise:
            pair_pdf = pair.select(idx, ca, cb).toPandas()
            y = pair_pdf[[ca, cb]].to_numpy(dtype=float)
            nm, nd = self._simulate_noise(y, lib, scale)
            am_order = np.argsort(nm)
            nm_sorted, nd_by_m = nm[am_order], nd[am_order]
            total = len(nm_sorted)
            sig_pdf = signal.select(idx, "__m", "__d").toPandas()
            am = np.abs(sig_pdf["__m"].to_numpy(dtype=float))
            ad = np.abs(sig_pdf["__d"].to_numpy(dtype=float))
            dom = _dominance_counts(nm_sorted, nd_by_m, am, ad)
            sig_pdf["__prob"] = dom / total if total else 0.0
            spark = df.sparkSession
            prob_df = spark.createDataFrame(sig_pdf[[idx, "__prob"]])
            out = signal.join(F.broadcast(prob_df), idx)
        else:  # large-scale approximate path (equivalence-tested vs
            # the exact branch in tests/test_noiseq_golden.py)
            out = self._prob_binomial_approx(signal, pair, idx, ca, cb, lib, scale)

        return self._finalize(out, idx, ca, cb)

    def _finalize(self, out, idx, ca, cb):
        return out.select(
            idx,
            ca,
            cb,
            F.col("__m").alias(self.logFC),
            F.col("__d").alias(self.D),
            F.col("__prob").alias(self.prob),
            (
                F.signum(F.col("__m"))
                * F.sqrt(F.col("__m") ** 2 + F.col("__d") ** 2)
            ).alias(self.rank),
        )

    def _simulate_noise(self, y, lib, scale):
        """Exact NOISeq-sim noise: for each condition, nss multinomial
        technical replicates of size pnr·libsize·U(1±v) over the full
        gene vector; noise points are all within-condition replicate
        pairs' (M, D) on the normalized scale (zeros -> k, divided by
        pnr to undo the downsampling)."""
        nss, pnr, v, k = self.nss, self.pnr, self.v, float(self.k)
        rng = np.random.RandomState(self.seed)
        out_m, out_d = [], []
        scale_arr = np.asarray(scale, dtype=float)
        for ci in range(2):
            x = y[:, ci]
            tot = x.sum()
            if tot <= 0:
                continue
            p = x / tot
            reps = np.empty((len(x), nss))
            for r in range(nss):
                size_r = int(round(pnr * lib[ci] * rng.uniform(1 - v, 1 + v)))
                reps[:, r] = rng.multinomial(size_r, p)
            reps[reps == 0] = k
            # noise stays on the downsampled raw scale — calibrated
            # against the reference goldens: rescaling by 1/pnr inflates
            # the noise D and underestimates prob for strong genes (the
            # golden probs are only reproducible with the raw scale)
            for r1 in range(nss):
                for r2 in range(r1 + 1, nss):
                    out_m.append(np.abs(np.log2(reps[:, r1] / reps[:, r2])))
                    out_d.append(np.abs(reps[:, r1] - reps[:, r2]))
        if not out_m:
            return np.array([]), np.array([])
        return np.concatenate(out_m), np.concatenate(out_d)

    def _prob_binomial_approx(
        self, signal, pair, idx, ca, cb, lib, scale, bins: int = 512
    ):
        """Distributed approximation for very large gene counts.

        The exact multinomial couples all genes only through the shared
        replicate total; its marginals are Binomial(size_r, p_g), and
        for large totals the coupling is O(p_g) — negligible. So:

        1. Per-gene binomial replicate draws in mapInPandas (replicate
           sizes drawn once on the driver from the seeded stream, so
           every gene sees the same replicate sizing as the exact
           scheme). Per-gene deterministic sub-seeds keep the result
           independent of partitioning. Noise points (|M|, |D|) stay
           distributed — never collected.
        2. A 2-D histogram of the noise cloud (linear bins in |M|,
           log1p bins in |D| for the heavy tail) is aggregated to at
           most ``bins``² cells; only the CELLS are collected (bounded
           by resolution, not corpus size) and turned into an inclusive
           2-D prefix-sum.
        3. Per-gene prob = prefix[bin(|M|), bin(|D|)] / total via an
           Arrow-batched pandas UDF over the broadcast prefix matrix.

        Error is bounded by one histogram cell: points sharing the
        gene's cell but strictly above it are over-counted — at most
        the cell's mass, so prob is exact to ~1/bins of the local
        marginal density. (A counter-based RNG would remove the
        per-gene generator init, the only non-vectorized step, if this
        path ever becomes CPU-bound at extreme gene counts.)
        """
        from pyspark.sql import functions as SF

        nss, pnr, v, k = self.nss, self.pnr, self.v, float(self.k)
        base_seed = self.seed
        rng = np.random.RandomState(base_seed)
        # replicate sizes per (condition, replicate): the same
        # driver-side scalars the exact path derives per multinomial
        sizes = [
            [
                int(round(pnr * lib[ci] * rng.uniform(1 - v, 1 + v)))
                for _ in range(nss)
            ]
            for ci in range(2)
        ]
        lib0, lib1 = float(lib[0]), float(lib[1])
        pair_idx = [(r1, r2) for r1 in range(nss) for r2 in range(r1 + 1, nss)]

        noise_schema = T.StructType(
            [
                T.StructField("__nm", T.DoubleType()),
                T.StructField("__nd", T.DoubleType()),
            ]
        )

        def gen_noise(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                xa = pdf[ca].to_numpy(dtype=float)
                xb = pdf[cb].to_numpy(dtype=float)
                ids = pdf[idx].astype(str).to_numpy()
                out_m, out_d = [], []
                for g in range(len(pdf)):
                    # partition-independent per-gene stream
                    gh = int.from_bytes(
                        hashlib.md5(ids[g].encode()).digest()[:8], "big"
                    )
                    grng = np.random.default_rng([base_seed, gh])
                    for ci, x, libc in ((0, xa[g], lib0), (1, xb[g], lib1)):
                        if libc <= 0:
                            continue
                        p = min(x / libc, 1.0)
                        reps = grng.binomial(sizes[ci], p).astype(float)
                        reps[reps == 0] = k
                        for r1, r2 in pair_idx:
                            out_m.append(abs(np.log2(reps[r1] / reps[r2])))
                            out_d.append(abs(reps[r1] - reps[r2]))
                yield pd.DataFrame({"__nm": out_m, "__nd": out_d})

        noise = persist_tracked(pair.mapInPandas(gen_noise, noise_schema))
        ext = noise.agg(
            SF.max("__nm").alias("m_max"), SF.max("__nd").alias("d_max")
        ).collect()[0]
        m_max = float(ext["m_max"] or 1.0) or 1.0
        d_log_max = float(np.log1p(ext["d_max"] or 1.0)) or 1.0

        m_bin = SF.least(
            SF.floor(SF.col("__nm") / m_max * bins).cast("int"), SF.lit(bins - 1)
        )
        d_bin = SF.least(
            SF.floor(SF.log1p(SF.col("__nd")) / d_log_max * bins).cast("int"),
            SF.lit(bins - 1),
        )
        cells = (
            noise.groupBy(m_bin.alias("mb"), d_bin.alias("db"))
            .agg(SF.count(SF.lit(1)).alias("n"))
            .collect()
        )
        noise.unpersist()
        hist = np.zeros((bins, bins), dtype=np.int64)
        for r in cells:
            hist[r["mb"], r["db"]] = r["n"]
        prefix = hist.cumsum(axis=0).cumsum(axis=1)
        total = int(prefix[-1, -1])

        def prob_lookup(m: pd.Series, d: pd.Series) -> pd.Series:
            if total == 0:
                return pd.Series(np.zeros(len(m)))
            am = np.abs(m.to_numpy(dtype=float))
            ad = np.abs(d.to_numpy(dtype=float))
            mi = np.minimum((am / m_max * bins).astype(int), bins - 1)
            di = np.minimum(
                (np.log1p(ad) / d_log_max * bins).astype(int), bins - 1
            )
            return pd.Series(prefix[mi, di] / total)

        prob_udf = F.pandas_udf(prob_lookup, T.DoubleType())
        return signal.withColumn("__prob", prob_udf(F.col("__m"), F.col("__d")))
