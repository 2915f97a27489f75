"""Similarity search over embedding columns (array<float>).

 - topk_cosine:        brute-force top-k, query side broadcast. Two
   implementations: `hof` (sequential-fold JVM higher-order functions —
   bit-reproducible vs the DuckDB oracle) and `numpy` (Arrow batches ×
   query matrix via BLAS matmul — the 100 TB throughput path).
 - lsh_bucketed_topk:  random-hyperplane LSH pre-bucketing so each
   candidate only scores against queries sharing a bucket (approximate;
   the IVF/LSH 'scale path' of SURVEY's training-data ops).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: driver-collect budget for the brute-force query side; beyond this,
#: use the bucketed paths (lsh_bucketed_topk / ivf_topk).
MAX_BROADCAST_QUERIES = 500_000


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def topk_cosine(data: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                method: str = "hof") -> DataFrame:
    """-> (q_id, rank, neighbor_id): k nearest by cosine, self excluded,
    ties broken by neighbor id. Query side must be broadcast-small."""
    if method == "numpy":
        return _topk_cosine_numpy(data, queries, k, id_col, vec_col)
    d = data.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).cast("array<double>").alias("dvec"))
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).cast("array<double>").alias("qvec"))
    j = d.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("q_id"))
    cos = _dot_col(F.col("dvec"), F.col("qvec")) / (
        _norm_col(F.col("dvec")) * _norm_col(F.col("qvec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (j.withColumn("cos", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "neighbor_id"))


def _topk_cosine_numpy(data: DataFrame, queries: DataFrame, k: int,
                       id_col: str, vec_col: str) -> DataFrame:
    """Arrow-batch matmul path: per batch of N data rows and Q queries,
    one (N,dim)x(dim,Q) BLAS call, then per-partition partial top-k;
    final exact top-k by a tiny shuffle of N_partitions*k rows."""
    # budget-guard the driver collect (same rule as gridding's
    # MAX_BROADCAST_POINTS / proximity's MAX_BROADCAST_TARGETS): the
    # limit bounds the collect itself, so an oversized query set can
    # never OOM the driver before the check fires.
    q_rows = queries.select(id_col, vec_col).limit(MAX_BROADCAST_QUERIES + 1).collect()
    if len(q_rows) > MAX_BROADCAST_QUERIES:
        raise ValueError(
            f"query set exceeds the broadcast budget "
            f"({MAX_BROADCAST_QUERIES} rows); brute-force top-k is "
            f"inherently all-pairs — use lsh_bucketed_topk or ivf_topk "
            f"for large query sets")
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = data.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            sims = mat @ qm.T  # (N, Q)
            # partial top-k per query within this batch
            kk = min(k + 1, len(ids))  # +1: self may be in batch
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
            out_q, out_n, out_c = [], [], []
            for col in range(len(qi)):
                rows = top[:, col]
                out_q.extend([qi[col]] * len(rows))
                out_n.extend(ids[rows])
                out_c.extend(sims[rows, col])
            yield pd.DataFrame({"q_id": out_q, "neighbor_id": out_n, "cos": out_c})

    partial = data.select(id_col, vec_col).mapInPandas(score, schema=schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (partial.filter(F.col("neighbor_id") != F.col("q_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "neighbor_id"))


def _plane_dots(vec, n_planes: int, dim: int, seed: int = 7):
    """Dot products with `n_planes` deterministic pseudo-random
    hyperplanes, as JVM Column expressions."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    dots = []
    for p in range(n_planes):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[p]])
        dots.append(_dot_col(vec.cast("array<double>"), coeffs))
    return dots


def hyperplane_bucket_col(vec, n_planes: int, dim: int, seed: int = 7):
    """Random-hyperplane LSH bucket id as a JVM expression: sign bits of
    dot products with `n_planes` deterministic pseudo-random planes."""
    bucket = F.lit(0).cast("long")
    for p, dot in enumerate(_plane_dots(vec, n_planes, dim, seed)):
        bucket = bucket.bitwiseOR(
            F.shiftleft(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), p))
    return bucket


def probe_buckets_col(vec, n_planes: int, dim: int, n_probes: int,
                      seed: int = 7):
    """Multi-probe LSH (Lv et al., VLDB 2007), single-bit perturbation
    tier: the query's own bucket plus the buckets reached by flipping
    the sign bits with the SMALLEST |margin| (the planes the vector
    sits closest to — the likeliest side-errors). Probes are capped at
    n_planes + 1 buckets (the Hamming-1 ball); the multi-bit
    perturbation sequence is the next refinement tier. -> array<long>
    of min(n_probes, n_planes + 1) bucket ids, all JVM expressions."""
    n_probes = min(n_probes, n_planes + 1)
    dots = _plane_dots(vec, n_planes, dim, seed)
    bucket = F.lit(0).cast("long")
    for p, dot in enumerate(dots):
        bucket = bucket.bitwiseOR(
            F.shiftleft(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), p))
    margins = F.array_sort(F.array(*[
        F.struct(F.abs(d).alias("m"), F.lit(p).alias("p"))
        for p, d in enumerate(dots)]))
    flips = F.slice(margins, 1, n_probes - 1)
    powers = F.array(*[F.lit(1 << p).cast("long") for p in range(n_planes)])
    probed = F.transform(
        flips, lambda s: bucket.bitwiseXOR(
            F.element_at(powers, s["p"] + 1)))
    return F.concat(F.array(bucket), probed)


def train_ivf_centroids(data: DataFrame, n_centroids: int = 16,
                        vec_col: str = "embedding",
                        sample_rows: int = 20_000, iters: int = 10,
                        seed: int = 7) -> np.ndarray:
    """IVF coarse quantizer: k-means on a bounded driver sample
    (deterministic seed + Lloyd iterations). At 100 TB the sample stays
    `sample_rows` regardless of corpus size — training cost is constant;
    only assignment scales, and that is a broadcast argmin."""
    rows = (data.select(vec_col).limit(sample_rows).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-30)
    return C


def _ivf_assign_udf(bc, nprobe: int):
    schema = T.ArrayType(T.IntegerType())

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(schema)
    def assign(vec: pd.Series) -> pd.Series:
        C = bc.value
        out = []
        for v in vec:
            x = np.asarray(v, np.float64)
            x /= max(np.linalg.norm(x), 1e-30)
            sims = C @ x
            top = np.argsort(-sims)[:nprobe]
            out.append([int(t) for t in top])
        return pd.Series(out)

    return assign


def ivf_topk(data: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, nprobe: int = 2) -> DataFrame:
    """IVF approximate top-k (the FAISS IVF-flat shape): a k-means
    coarse quantizer partitions the corpus into `n_centroids` inverted
    lists; data rows join their OWN list, queries probe their `nprobe`
    nearest lists, and exact cosine runs only within probed lists —
    an equi-join on list id, never a cross product. nprobe ->
    n_centroids converges to brute force."""
    C = train_ivf_centroids(data, n_centroids, vec_col)
    bc = data.sparkSession.sparkContext.broadcast(C)
    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("neighbor_id_vec"),
        F.explode(_ivf_assign_udf(bc, 1)(F.col(vec_col))).alias("list_id"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("q_id_vec"),
        F.explode(_ivf_assign_udf(bc, nprobe)(F.col(vec_col))).alias("list_id"))
    j = (d.join(F.broadcast(q), "list_id")
         .filter(F.col("neighbor_id") != F.col("q_id"))
         .dropDuplicates(["q_id", "neighbor_id"]))
    cos = _dot_col(F.col("neighbor_id_vec"), F.col("q_id_vec")) / (
        _norm_col(F.col("neighbor_id_vec")) * _norm_col(F.col("q_id_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (j.withColumn("cos", cos).withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("q_id", "rank", "neighbor_id"))


def lsh_bucketed_topk(data: DataFrame, queries: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 8, dim: int = 64,
                      n_probes: int = 1) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket.
    Recall < 1 by design; pair generation is an equi-join on bucket id,
    so the work scales with bucket occupancy, not |data| x |queries|.

    n_probes > 1 enables multi-probe refinement: each query also joins
    the buckets whose smallest-margin sign bits flip — recall rises
    toward brute force at the cost of ~n_probes x candidate volume,
    still never a cross product (the IVF-style nprobe knob)."""
    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("neighbor_id_vec"),
        hyperplane_bucket_col(F.col(vec_col), n_planes, dim).alias("bucket"))
    if n_probes <= 1:
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("q_id_vec"),
            hyperplane_bucket_col(F.col(vec_col), n_planes, dim).alias("bucket"))
    else:
        q = queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).cast("array<double>").alias("q_id_vec"),
            F.explode(probe_buckets_col(
                F.col(vec_col), n_planes, dim, n_probes)).alias("bucket"))
    j = (d.join(F.broadcast(q), "bucket")
         .filter(F.col("neighbor_id") != F.col("q_id"))
         .dropDuplicates(["q_id", "neighbor_id"]))
    cos = _dot_col(F.col("neighbor_id_vec"), F.col("q_id_vec")) / (
        _norm_col(F.col("neighbor_id_vec")) * _norm_col(F.col("q_id_vec")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (j.withColumn("cos", cos).withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k).select("q_id", "rank", "neighbor_id"))
