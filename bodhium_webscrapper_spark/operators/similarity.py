"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — queries are broadcast against the
corpus, the dot product is a single JVM expression chain
(``zip_with`` → ``aggregate``), ranking is a per-query window. No Python in
the hot path.

Scale path: random-hyperplane LSH bucketing (a vectorized pandas UDF doing
one numpy matmul per Arrow batch) so candidate generation is a bucket
equi-join instead of an n×m cross join; exact cosine re-rank on candidates.
At 100 TB the bucket join shuffles only (id, bucket, vec) and AQE handles
bucket skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cosine).

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once, never shuffled — the window partitions by query_id, whose
    cardinality equals the (small) query count.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    """Random-hyperplane sign bucket: bucket = packed signs of V·P.

    Planes are a pure function of (dim, n_planes, seed) → deterministic
    across runs and executors. One numpy matmul per Arrow batch.
    """
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int32)

    @pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ planes) > 0
        return pd.Series((signs @ powers).astype(np.int32))

    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket equi-join + exact rerank.

    Recall < 1.0 by construction (single probe); raise recall by lowering
    n_planes or adding multi-probe. This is the 100 TB path: candidates per
    query shrink by ~2^n_planes versus brute force.
    """
    dim = len(corpus.select(vec_col).first()[0])
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        bucket(F.col(vec_col)).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        bucket(F.col(vec_col)).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
