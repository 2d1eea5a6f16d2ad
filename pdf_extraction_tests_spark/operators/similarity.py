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
