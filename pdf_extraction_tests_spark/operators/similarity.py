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


def lsh_bucket_expr(planes: np.ndarray, vec_col: str = "embedding"):
    """Sign-LSH bucket as a PURE column expression: bit b = 1 iff
    dot(v, plane_b) > 0, packed little-endian.

    JVM-side (whole-stage codegen) and exactly reproducible in DuckDB via
    ``list_dot_product`` with the same literal planes — this is the
    oracle-checkable form used by the q28/q40 query paths.  For wide
    signatures (bits >~ 16) the pandas-UDF path (:func:`with_lsh_bucket`,
    one BLAS matmul per Arrow batch) wins; for the few-bit bucketing a
    partition-pruned probe needs, the expression form costs ``bits`` fused
    dot products per row and keeps the whole plan SQL-expressible."""
    bucket = F.lit(0)
    for b, plane in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            _dot(F.col(vec_col), lit) > 0, F.lit(1 << b)
        ).otherwise(F.lit(0))
    return bucket


def _plane_sql_literal(plane: np.ndarray) -> str:
    """One hyperplane as a DuckDB DOUBLE[] literal (repr round-trips f64)."""
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]"


def lsh_bucket_sql(planes: np.ndarray, vec_expr: str = "e") -> str:
    """DuckDB expression computing the same bucket as :func:`lsh_bucket_expr`
    over a DOUBLE[] column/expression ``vec_expr``."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_sql_literal(p)}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, p in enumerate(planes)
    ]
    return " + ".join(terms)


def ann_topk_expr(emb: DataFrame, query_vec: list[float], k: int = 10,
                  bits: int = 4, seed: int = 42, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """ANN top-k with the expression-form bucket (oracle-checkable q28 path).

    Same semantics as :func:`ann_topk`; the bucket assignment is a column
    expression instead of a pandas UDF, so the whole plan (bucket -> probe
    filter -> exact rank) is SQL-expressible.  The query's own bucket is
    computed driver-side with the identical float64 arithmetic."""
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(((planes @ q > 0) * (1 << np.arange(bits))).sum())
    bucketed = emb.withColumn("bucket", lsh_bucket_expr(planes, vec_col))
    return cosine_topk(
        bucketed.filter(F.col("bucket") == q_bucket), query_vec, k, id_col, vec_col
    )


def ann_topk_sql(planes: np.ndarray, k: int = 10, query_id: int = 0,
                 table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`ann_topk_expr` (query vector = row
    ``query_id``'s embedding, same literal planes)."""
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {table}),
    q AS (SELECT e AS qe, {lsh_bucket_sql(planes, 'e')} AS qbucket
          FROM v WHERE vec_id = {query_id}),
    b AS (SELECT vec_id, e, {lsh_bucket_sql(planes, 'e')} AS bucket FROM v)
    SELECT vec_id,
           round(list_dot_product(e, qe)
                 / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))),
                 6) AS cosine
    FROM b, q
    WHERE b.bucket = q.qbucket
    ORDER BY cosine DESC, vec_id
    LIMIT {k}
    """


def ivf_centroids(emb: DataFrame, n_lists: int = 16, seed: int = 42,
                  vec_col: str = "embedding", sample: int = 2048,
                  id_col: str = "vec_id") -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means (fixed-seed init, few
    Lloyd iterations) over a seeded sample of the corpus.

    Runs on the driver over a bounded sample — the standard way to train a
    coarse quantizer; assignment of the full corpus stays distributed.
    The sample is ordered by a hash of the (small) id column — NOT of the
    vector itself — so the scan never serializes vectors to strings; the
    orderBy+limit compiles to TakeOrdered (per-partition top-k, no full
    sort)."""
    rows = (
        emb.select(vec_col, id_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))  # seeded-stable sample
        .limit(sample)
        .select(vec_col)
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
    cents = ivf_centroids(emb, n_lists, seed, vec_col, id_col=id_col)
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((cents - q[None, :]) ** 2).sum(axis=1)).argsort()[:n_probe]
    probe_lists = [int(x) for x in order]
    assigned = with_ivf_list(emb, cents, vec_col)
    return cosine_topk(
        assigned.filter(F.col("ivf_list").isin(probe_lists)),
        query_vec, k, id_col, vec_col,
    )


def write_ivf_partitioned(emb: DataFrame, centroids: np.ndarray, path: str,
                          vec_col: str = "embedding") -> None:
    """Materialize the corpus PARTITIONED BY ivf_list — the at-scale ANN
    layout: each coarse cell is its own partition directory, so a probe
    becomes a partition-pruned scan of n_probe directories instead of a
    full-corpus scan + filter.  One shuffle on ivf_list at write time keeps
    one file per list instead of files x tasks."""
    assigned = with_ivf_list(emb, centroids, vec_col)
    (assigned.repartition("ivf_list")
     .write.mode("overwrite").partitionBy("ivf_list").parquet(path))


def ivf_topk_partitioned(spark, path: str, query_vec: list[float],
                         centroids: np.ndarray, k: int = 10, n_probe: int = 3,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Probe the :func:`write_ivf_partitioned` layout: the ivf_list filter
    is a PARTITION filter (pruned at planning, verified by plan test) —
    only the n_probe nearest lists' files are ever opened."""
    q = np.asarray(query_vec, dtype=np.float64)
    order = (((centroids - q[None, :]) ** 2).sum(axis=1)).argsort()[:n_probe]
    probe_lists = [int(x) for x in order]
    scan = spark.read.parquet(path).filter(F.col("ivf_list").isin(probe_lists))
    return cosine_topk(scan, query_vec, k, id_col, vec_col)


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
