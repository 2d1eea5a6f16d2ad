"""Similarity search over an embedding column (array<float>).

Two paths:
* brute-force cosine top-k — the exact baseline, one scan + one top-k;
* LSH-bucketed ANN — random-hyperplane signatures computed scan-side from a
  broadcast seeded projection matrix; queries probe only matching buckets.
  This is the 100 TB path: bucket cardinality ~n/2^bits, so the candidate
  join touches a vanishing fraction of the corpus.

Cosine math stays JVM-side (zip_with/aggregate in double precision); the
projection signature uses a vectorized pandas UDF (Arrow) because the
hyperplane matrix multiply is a genuine numeric kernel — numpy does in one
BLAS call what an expression tree cannot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _dot(va, vb):
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(vc):
    return F.sqrt(
        F.aggregate(
            F.transform(vc, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The query vector is inlined as a literal array (broadcast to every task
    inside the plan); one scan, one TakeOrdered — no shuffle of vectors.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (
        emb.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random-hyperplane matrix (bits x dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def with_lsh_bucket(emb: DataFrame, planes: np.ndarray,
                    vec_col: str = "embedding") -> DataFrame:
    """Add a sign-LSH ``bucket`` column: bit b = sign(v . plane_b).

    Vectorized pandas UDF (one matrix multiply per Arrow batch)."""
    planes_b = planes  # captured by value in the closure; small (bits x dim)

    @F.pandas_udf(T.IntegerType())
    def bucket_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vs.to_numpy())  # (batch, dim)
        signs = (mat @ planes_b.T) > 0  # (batch, bits)
        weights = (1 << np.arange(planes_b.shape[0])).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32"))

    return emb.withColumn("bucket", bucket_of(F.col(vec_col)))


def ivf_centroids(emb: DataFrame, n_lists: int = 16, seed: int = 42,
                  vec_col: str = "embedding", sample: int = 2048) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means (fixed-seed init, few
    Lloyd iterations) over a seeded sample of the corpus.

    Runs on the driver over a bounded sample — the standard way to train a
    coarse quantizer; assignment of the full corpus stays distributed."""
    rows = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))  # seeded-stable sample
        .limit(sample)
        .collect()  # bounded-sample ok: quantizer training set, <= `sample` rows
    )
    mat = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)]
    for _ in range(8):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def with_ivf_list(emb: DataFrame, centroids: np.ndarray,
                  vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest coarse centroid (``ivf_list``).

    Vectorized pandas UDF — one matrix distance computation per Arrow
    batch.  At scale ``ivf_list`` becomes the table's partition column so a
    probe is a partition-pruned scan of n_probe lists."""
    cents = centroids

    @F.pandas_udf(T.IntegerType())
    def list_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return emb.withColumn("ivf_list", list_of(F.col(vec_col)))


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_lists: int = 16, n_probe: int = 3, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: train a coarse quantizer, probe the n_probe nearest lists,
    exact-rank inside them.  Recall rises with n_probe (n_probe == n_lists
    degenerates to exact brute force)."""
    cents = ivf_centroids(emb, n_lists, seed, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:n_probe]
    probe_lists = [int(x) for x in order]
    assigned = with_ivf_list(emb, cents, vec_col)
    return cosine_topk(
        assigned.filter(F.col("ivf_list").isin(probe_lists)),
        query_vec, k, id_col, vec_col,
    )


def ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10, bits: int = 6,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, exact-rank inside it.

    Recall < 1 by construction (single-probe); raise recall with fewer bits
    or multi-probe.  At scale, ``bucket`` becomes the table's partition
    column so a probe is a partition-pruned scan.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(((planes @ q > 0) * (1 << np.arange(bits))).sum())
    bucketed = with_lsh_bucket(emb, planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == q_bucket), query_vec, k, id_col, vec_col
    )
