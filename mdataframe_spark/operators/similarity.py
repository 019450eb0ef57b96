"""Similarity search over embedding columns (array<float>).

Engine extension (SURVEY.md §7 step 9): brute-force cosine top-k as the
exact baseline, and a random-hyperplane LSH-bucketed variant as the
scale path. Vector math uses built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python round-trip.

Scale shape: brute force is a broadcast nested-loop (queries × corpus)
— correct but O(Q·N); fine when Q is small. The LSH variant buckets
both sides by hyperplane sign bits so candidate generation is an
equi-join on the bucket key; recall is tunable via #planes / #tables.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: Optional[int] = None) -> Column:
    """Σ aᵢ·bᵢ, sequential double adds (left-to-right — the same
    association order as DuckDB's list_dot_product, so oracle results
    are bit-identical).

    With ``dim`` known, unrolls to a flat 2·dim-term expression —
    whole-stage-codegen'd, ~10x faster than the higher-order
    zip_with/aggregate form, which Spark evaluates interpreted per
    element (CodegenFallback)."""
    if dim is not None:
        expr = a[0] * b[0]
        for i in range(1, dim):
            expr = expr + a[i] * b[i]
        return expr
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dim: Optional[int] = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: Optional[int] = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cast_double: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).

    (query_id, neighbor_id, cos_sim, knn_rank). Queries are broadcast;
    the corpus streams — one pass, no shuffle except the per-query
    top-k window (partitioned by query: parallel across queries).
    Deterministic tiebreak: (sim desc, neighbor_id asc).
    """
    vec = (lambda c: F.col(c).cast("array<double>")) if cast_double else F.col
    dim = len(corpus.select(vec_col).first()[0])
    # norms once per vector, not per scored pair: sqrt(a·a)·sqrt(b·b)
    # factored out of the pair loop is the same IEEE expression at a
    # third of the flops
    q = queries.select(
        F.col(id_col).alias("query_id"), vec(vec_col).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv"), dim))
    # spread the streaming side: the per-pair dot products pipeline
    # into the corpus scan's split count, and a small single-row-group
    # parquet would serialize the whole scoring stage on one core
    # (no-op at real scale — see ensure_parallelism)
    from .dedup import ensure_parallelism

    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), vec(vec_col).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv"), dim))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("__qv"), F.col("__cv"), dim)
            / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "knn_rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (SRP-LSH)."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: Optional[int] = None,
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP-LSH bucket.

    Same output schema as cosine_topk. Candidate generation is an
    equi-join on the bucket key — scales to corpora where Q·N is
    infeasible; recall < 1 by construction (bucket boundaries).

    ``probe_hamming`` enables multi-probe LSH (Lv et al., VLDB 2007
    shape): each QUERY additionally probes every bucket within that
    hamming distance of its own (sign flips are the most likely
    misplacements). Only the tiny query side fans out — the corpus
    keeps exactly one bucket per vector, so the equi-join stays the
    same shuffle; recall rises at the cost of probing
    sum_{i<=h} C(n_planes, i) / 2^n_planes of the corpus."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    vec = lambda c: F.col(c).cast("array<double>")  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"), vec(vec_col).alias("__qv")
    ).withColumn("__bucket", hyperplane_bucket(F.col("__qv"), planes))
    if probe_hamming > 0:
        from itertools import combinations

        masks = [0]
        for h in range(1, probe_hamming + 1):
            for bits in combinations(range(n_planes), h):
                masks.append(sum(1 << b for b in bits))
        q = q.withColumn(
            "__bucket",
            F.explode(F.array(*[F.col("__bucket").bitwiseXOR(F.lit(m)) for m in masks])),
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), vec(vec_col).alias("__cv")
    ).withColumn("__bucket", hyperplane_bucket(F.col("__cv"), planes))
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "knn_rank")
    )


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Build an IVF-flat index: k-means centroids (Spark ML, distributed)
    + the corpus partitioned by nearest centroid.

    Returns (assigned_corpus_df, centroids) where the corpus carries a
    ``__centroid`` column. At scale, write the assigned corpus bucketed
    by ``__centroid`` so probes prune partitions at scan time.
    """
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__fv", array_to_vector("__v"))
    model = MLKMeans(
        k=n_centroids, seed=seed, featuresCol="__fv", predictionCol="__centroid"
    ).fit(vecs)
    assigned = model.transform(vecs).drop("__fv")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-flat approximate top-k: score only the ``n_probe`` nearest
    centroid buckets per query.

    Candidate generation is an equi-join on the centroid id, so the
    scored fraction is ~n_probe/n_centroids of the corpus — the
    standard recall/cost dial. Output schema matches cosine_topk.
    """
    assigned, centroids = ivf_index(corpus, n_centroids, id_col, vec_col, seed)
    dim = len(centroids[0])

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    # rank centroids per query (centroid count is small: literal arrays)
    # negated similarity FIRST in the struct: array_sort orders structs
    # by their leading field, so ascending(-sim) = most-similar first
    cent_dists = F.array(
        *[
            F.struct(
                (-cosine(F.col("__qv"), F.array(*[F.lit(x) for x in c]), dim)).alias("d"),
                F.lit(ci).alias("cid"),
            )
            for ci, c in enumerate(centroids)
        ]
    )
    probes = q.withColumn(
        "__centroid",
        F.explode(
            F.transform(
                F.slice(F.array_sort(cent_dists), 1, n_probe), lambda s: s["cid"]
            )
        ),
    )
    scored = (
        assigned.join(F.broadcast(probes), "__centroid")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__qv"), F.col("__v"), dim).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("knn_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def embedding_stats(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding statistics: count, mean vector-sum, mean L2
    norm — the cheap sanity aggregate over an embedding table."""
    vec = F.col(vec_col).cast("array<double>")
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.avg(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x)).alias("avg_vec_sum"),
            F.avg(F.sqrt(dot(vec, vec))).alias("avg_l2_norm"),
        )
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) ANN
# ---------------------------------------------------------------------------
def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
):
    """Train per-subspace PQ codebooks (Jégou, Douze & Schmid, TPAMI
    2011): split the (L2-normalized) vector into ``m`` subvectors and
    k-means each subspace to ``k`` codewords.

    Training is driver-side numpy over a DETERMINISTIC sample (the
    ``sample`` lowest-id vectors — reproducible across runs and
    engines), with deterministic Lloyd (first-k init, lowest-index
    tie-break). The result is an (m, k, dim/m) float array — a few KB,
    shipped to executors inside closures; the expensive parts (encode,
    scan) stay distributed.
    """
    rows = (
        corpus.orderBy(id_col)
        .limit(sample)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()["v"]
    )
    x = np.array([np.asarray(r, dtype=float) for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, k, sub))
    for mi in range(m):
        xs = x[:, mi * sub : (mi + 1) * sub]
        cent = xs[:k].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ki in range(k):
                mask = assign == ki
                if mask.any():
                    cent[ki] = xs[mask].mean(axis=0)
        books[mi] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-codeword indices — an
    Arrow-batched mapInPandas pass (vectorized numpy argmin per batch;
    dim·k flops/vector) emitting (id, codes array<int>, norm). Vectors
    are L2-normalized before coding, so ADC inner products approximate
    cosine directly. At 100 TB the codes are ~m bytes/vector — the
    memory compression that lets a shard's index live in RAM."""
    import pandas as pd
    from pyspark.sql import types as T

    books = np.asarray(codebooks)
    m, k, sub = books.shape

    schema = T.StructType(
        [
            corpus.schema[id_col],
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("nrm", T.DoubleType()),
        ]
    )
    src = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )

    def encode(batches):
        for pdf in batches:
            x = np.array([np.asarray(r, dtype=float) for r in pdf["__v"]])
            if not len(x):
                continue
            nrm = np.linalg.norm(x, axis=1)
            xs = x / np.maximum(nrm, 1e-300)[:, None]
            codes = np.empty((len(x), m), dtype=np.int32)
            for mi in range(m):
                seg = xs[:, mi * sub : (mi + 1) * sub]
                d2 = ((seg[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes.tolist()),
                    "nrm": nrm,
                }
            )

    return src.mapInPandas(encode, schema)


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-ranking.

    The production PQ pipeline: (1) asymmetric-distance shortlist —
    each query's similarity to a code is a lookup-table entry
    LUT[m][code] = q_sub · codeword, so scoring a corpus vector is m
    adds over its codes (no vector fetched); (2) the ``shortlist`` best
    ADC candidates per query join back their TRUE vectors for exact
    cosine re-ranking. Plan shape: codes explode to (id, m, code) and
    equi-join the broadcast LUT — shuffle rows N·m with integer
    payloads; only shortlist·|Q| full vectors are ever re-read.
    """
    books = pq_train_codebooks(corpus, id_col, vec_col, m=m, k=n_codes)
    codes = pq_encode(corpus, books, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).toPandas()
    lut_rows = []
    mm, kk, sub = books.shape
    for _, row in q.iterrows():
        qv = np.asarray(row["__qv"], dtype=float)
        qv = qv / max(np.linalg.norm(qv), 1e-300)
        for mi in range(mm):
            seg = qv[mi * sub : (mi + 1) * sub]
            w = books[mi] @ seg
            for ci in range(kk):
                lut_rows.append((int(row["query_id"]), mi, ci, float(w[ci])))
    spark = corpus.sparkSession
    lut = spark.createDataFrame(lut_rows, "query_id long, m int, code int, w double")

    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("m", "code"),
    )
    adc = (
        exploded.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("w").alias("adc_sim"))
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    short = adc.withColumn("r", F.row_number().over(w_short)).filter(
        F.col("r") <= shortlist
    )
    # exact re-rank: fetch true vectors for the shortlist only
    v = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    dim = mm * sub
    qdf = spark.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["__qv"]]) for _, r in q.iterrows()],
        f"query_id long, __qv array<double>",
    )
    rer = (
        short.join(v, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv"), dim).alias("cos_sim"),
        )
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("knn_rank", F.row_number().over(w_final).cast("bigint"))
        .filter(F.col("knn_rank") <= k)
    )


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.5,
    dim: Optional[int] = None,
) -> DataFrame:
    """Cosine of every vector to its own label's centroid, with an
    ``is_outlier`` flag below ``threshold`` — the embedding-quality
    filter (mislabeled / degenerate vectors sit far from their class
    centroid) and the assignment-confidence signal SemDeDup-style
    pipelines threshold on.

    Scale shape: the centroid aggregation posexplodes to (label, dim)
    scalars — map-side partial agg reduces the shuffle to
    labels × dim rows (kilobytes), never the vectors; the finished
    centroids broadcast back (G·dim doubles), so scoring is a
    broadcast join + the unrolled codegen dot product — zero further
    shuffles. Centroid components round to 9 dp and cosines to 6 dp,
    the cross-engine convention shared with the ANN oracles.
    """
    e = emb.select(
        id_col, label_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    if dim is None:
        dim = len(e.select("__v").first()["__v"])
    pos = e.select(label_col, F.posexplode("__v").alias("__p", "__x"))
    cent = pos.groupBy(label_col, "__p").agg(F.round(F.avg("__x"), 9).alias("__cx"))
    cent_arr = cent.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__p", "__cx"))),
            lambda s: s["__cx"],
        ).alias("__c")
    )
    joined = e.join(F.broadcast(cent_arr), label_col)
    cos = F.round(cosine(F.col("__v"), F.col("__c"), dim), 6)
    return joined.select(
        id_col,
        label_col,
        cos.alias("cos_centroid"),
        (cos < F.lit(float(threshold))).alias("is_outlier"),
    )


def nearest_centroid_predict(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: Optional[int] = None,
) -> DataFrame:
    """Nearest-centroid classification: fit per-label centroids (one
    labels×dim partial-agged pass, the centroid_outliers plan) and
    assign every vector to its highest-cosine centroid — returns
    (id, label, pred, cos_pred). The natural evaluation partner of
    :func:`..operators.evaluation.confusion_metrics`: mislabeled or
    boundary vectors land on a different class's centroid.

    Scale shape: centroids broadcast back (G·dim doubles) and the
    scoring is a broadcast nested-loop over G centroids with the
    unrolled codegen dot — zero shuffles after the centroid agg except
    the final per-id argmax groupBy. Cosines round to 6 dp before the
    argmax and ties break on the LOWER class id, so the assignment is
    total and cross-engine deterministic.
    """
    e = emb.select(
        id_col, label_col, F.col(vec_col).cast("array<double>").alias("__v")
    )
    if dim is None:
        row = e.select("__v").first()
        if row is None:
            raise ValueError(
                "nearest_centroid_predict: empty input frame — pass dim "
                "explicitly if the frame may legitimately be empty"
            )
        dim = len(row["__v"])
    pos = e.select(label_col, F.posexplode("__v").alias("__p", "__x"))
    cent = pos.groupBy(label_col, "__p").agg(F.round(F.avg("__x"), 9).alias("__cx"))
    cent_arr = cent.groupBy(F.col(label_col).alias("__cl")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__p", "__cx"))),
            lambda s: s["__cx"],
        ).alias("__c")
    )
    scored = e.crossJoin(F.broadcast(cent_arr)).select(
        id_col,
        label_col,
        F.col("__cl"),
        F.round(cosine(F.col("__v"), F.col("__c"), dim), 6).alias("__cos"),
    )
    # lexicographic struct MIN of (−cosine, class) = highest cosine,
    # ties to the LOWEST class under the label type's natural order —
    # works for string/any orderable labels, not just numeric ids
    best = scored.groupBy(id_col, label_col).agg(
        F.min(
            F.struct((-F.col("__cos")).alias("__negcos"), F.col("__cl"))
        ).alias("__best")
    )
    return best.select(
        id_col,
        label_col,
        F.col("__best.__cl").alias("pred"),
        (-F.col("__best.__negcos")).alias("cos_pred"),
    )


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: Optional[int] = None,
) -> DataFrame:
    """Per-label embedding drift between two corpus snapshots: the
    cosine between each label's centroid in A and in B — the
    vector-space member of the drift battery (PSI for scalar features,
    KS/MWU for distributions, source-KL for text). Returns (label,
    n_a, n_b, centroid_cosine, drift) with drift = 1 − cosine; labels
    present in only one snapshot carry NULL cosine/drift.

    Scale shape: two labels×dim centroid aggregations (the
    centroid_outliers plan — partial-agged, kilobyte shuffles), one
    labels-bounded join, codegen dot on the centroid arrays. Centroid
    components round to 9 dp and cosines to 6 dp (the ANN-oracle
    convention), so a SQL engine replays the drift exactly.
    """
    def centroids(emb, n_name):
        e = emb.select(
            label_col, F.col(vec_col).cast("array<double>").alias("__v")
        )
        pos = e.select(label_col, F.posexplode("__v").alias("__p", "__x"))
        cent = pos.groupBy(label_col, "__p").agg(
            F.round(F.avg("__x"), 9).alias("__cx"),
            F.count(F.lit(1)).alias("__n"),
        )
        return cent.groupBy(label_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__cx"))),
                lambda s: s["__cx"],
            ).alias(f"__c_{n_name}"),
            # every dim position of a label carries the same vector
            # count — max avoids an FP division entirely
            F.max("__n").cast("bigint").alias(n_name),
        )

    if dim is None:
        row = (
            emb_a.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
            or emb_b.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
        )
        if row is None:
            raise ValueError(
                "embedding_drift: no non-null vectors in either snapshot "
                "— pass dim explicitly"
            )
        dim = len(row[vec_col])
    ca = centroids(emb_a, "n_a")
    cb = centroids(emb_b, "n_b")
    j = ca.join(cb, label_col, "full_outer")
    cos = F.round(cosine(F.col("__c_n_a"), F.col("__c_n_b"), dim), 6)
    both = F.col("__c_n_a").isNotNull() & F.col("__c_n_b").isNotNull()
    # the unrolled dim-term cosine appears ONCE; drift derives from the
    # materialized column (identical expression tree — cos is already
    # 6-dp rounded). Inlining it twice doubled the generated code of
    # the full-outer SMJ consume function past the JVM method limit
    # (ERROR CodeGenerator: smj_consumeFullOuterJoinRow_0 grows beyond
    # 64 KB -> silent interpreted fallback, round-13 inherited item).
    step = j.select(
        label_col,
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.when(both, cos).alias("centroid_cosine"),
    )
    return step.withColumn(
        "drift",
        F.round(
            F.when(
                F.col("centroid_cosine").isNotNull(),
                1.0 - F.col("centroid_cosine"),
            ),
            6,
        ),
    ).orderBy(label_col)


def scalar_quantization_report(
    emb: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension scalar-quantization (SQ) audit: fit the classic
    min/max int-``bits`` quantizer per dimension, reconstruct, and
    report the error spectrum — the "can I ship int8 embeddings"
    check before swapping a float ANN index for a quantized one
    (4× memory, and SQ is what IVF/HNSW indexes deploy most).
    Returns one row per dimension index present in the data:
    (p, x_min, x_max, n, mean_abs_err, max_abs_err) ordered by p;
    an empty input yields an empty frame.

    Determinism: x_min/x_max are exact (no summation); scale, codes
    and reconstructions are identical IEEE expressions in both
    engines (round() ties away from zero on the non-negative code
    scale in both); per-element |err| rounds to 9 dp and accumulates
    as DECIMAL(18,9) — order-independent — with one double division
    at the end. Constant dimensions (min = max) quantize to code 0
    with zero error.

    Scale shape: TWO partial-agged corpus passes (per-dimension
    min/max, then the error agg after broadcasting the dim-bounded
    stats back); everything else is dim-bounded.
    """
    levels = (1 << bits) - 1
    pos = emb.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__p", "__x")
    )
    stats = pos.groupBy("__p").agg(
        F.min("__x").alias("x_min"), F.max("__x").alias("x_max")
    )
    scale = (F.col("x_max") - F.col("x_min")) / F.lit(float(levels))
    code = F.when(
        F.col("x_max") > F.col("x_min"),
        F.round((F.col("__x") - F.col("x_min")) / scale, 0),
    ).otherwise(F.lit(0.0))
    recon = F.when(
        F.col("x_max") > F.col("x_min"),
        F.col("x_min") + code * scale,
    ).otherwise(F.col("x_min"))
    err = (
        pos.join(F.broadcast(stats), "__p")
        .select(
            "__p",
            "x_min",
            "x_max",
            F.round(F.abs(F.col("__x") - recon), 9)
            .cast("decimal(18,9)")
            .alias("__e"),
        )
        .groupBy("__p", "x_min", "x_max")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__e").alias("__se"),
            F.max("__e").alias("__me"),
        )
    )
    return err.select(
        F.col("__p").cast("int").alias("p"),
        "x_min",
        "x_max",
        "n",
        F.round(F.col("__se").cast("double") / F.col("n"), 6).alias(
            "mean_abs_err"
        ),
        F.col("__me").cast("double").alias("max_abs_err"),
    ).orderBy("p")


def matryoshka_energy(
    emb: DataFrame,
    vec_col: str = "embedding",
    dims: Sequence[int] = (8, 16, 32),
    full_dim: Optional[int] = None,
) -> DataFrame:
    """Prefix-energy audit for matryoshka-style truncation: for each
    candidate prefix length d, the fraction of every vector's squared
    L2 norm captured by its first d components — the cheap proxy for
    "how much cosine structure survives truncating the index to d
    dims" (energy 1.0 = truncation is lossless for that vector).
    Returns one row per d: (dim, n_vectors, mean_energy, min_energy,
    frac_above_90) ordered by dim.

    Determinism: per-vector energy is a ratio of two unrolled
    sequential dot folds (the :func:`dot` convention — same
    association order as the oracle's list_dot_product), rounded 9 dp
    and accumulated as DECIMAL(18,9); zero vectors are excluded (no
    energy to apportion). Scale shape: ONE corpus pass per d over the
    same scan (Catalyst collapses the union of projections), outputs
    len(dims) rows.
    """
    if full_dim is None:
        row = emb.select(vec_col).first()
        if row is None:
            raise ValueError(
                "matryoshka_energy: empty input — pass full_dim "
                "explicitly if the frame may legitimately be empty"
            )
        full_dim = len(row[vec_col])
    v = F.col(vec_col).cast("array<double>")
    # materialize the full-norm ONCE per row in its own projection:
    # repeating the unrolled full_dim-term dot inside every prefix's
    # CASE blows janino's 64 KB method limit (codegen falls back to
    # interpreted AND re-evaluates the norm) — two stacked projections
    # keep each expression codegen-able and the norm single-evaluated
    vv = emb.select(v.alias("__v"))
    base = vv.select(
        "__v", dot(F.col("__v"), F.col("__v"), full_dim).alias("__f")
    )
    parts = []
    for d in dims:
        if not 0 < d <= full_dim:
            raise ValueError(
                f"matryoshka_energy: dim {d} outside 1..{full_dim}"
            )
        pref = dot(F.col("__v"), F.col("__v"), d)
        # zero-norm guard as a FILTER BEFORE the division (never a
        # CASE around it): ANSI mode raises on 0/0, and a post-hoc
        # isNotNull filter would be predicate-pushed below the
        # projection, duplicating the whole unrolled expression past
        # janino's 64 KB method limit (observed: codegen fallback)
        parts.append(
            base.filter(F.col("__f") > 0).select(
                F.lit(int(d)).alias("dim"),
                F.round(pref / F.col("__f"), 9)
                .cast("decimal(18,9)")
                .alias("__e"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.sum("__e").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_energy"
            ),
            F.min("__e").cast("double").alias("min_energy"),
            F.round(
                F.sum(F.when(F.col("__e") >= 0.9, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("frac_above_90"),
        )
        .orderBy("dim")
    )
