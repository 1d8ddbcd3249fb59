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
from pyspark.sql.types import ArrayType, IntegerType


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
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cosine).

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once, never shuffled. Ranking is salted two-phase top-k (the
    per_host_budget pattern): a single window partitioned by query_id would
    funnel |corpus| scored rows per query into one task — a straggler at
    100× scale. Phase 1 keeps top-k per (query_id, salt) cell, bounding
    phase 2's exact window to k*salt_buckets rows per query. Any row in the
    true top-k is also in its salt cell's top-k, so the result is exact.
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
    return _topk_per_query(scored, k, salt_buckets)


def _topk_per_query(scored: DataFrame, k: int, salt_buckets: int = 16) -> DataFrame:
    """Salted two-phase exact top-k per query over (query_id, neighbor_id,
    cosine) rows — no single-partition window over the full scored set."""
    order = [F.col("cosine").desc(), F.col("neighbor_id").asc()]
    if salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col("query_id"), F.col("_salt")).orderBy(*order)
        scored = (
            scored.withColumn("_salt", salt)
            .withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= k)
            .drop("_salt", "_rn1")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
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


def hyperplane_probe_udf(dim: int, n_planes: int = 8, seed: int = 42,
                         n_probes: int = 4):
    """RANKED multi-probe buckets: base bucket + (n_probes-1) single-bit
    flips ordered by the vector's distance to each hyperplane (classic
    multi-probe LSH, Lv et al.). A true near neighbor that lands across a
    hyperplane almost always crosses one the query is CLOSE to — so probing
    the lowest-|margin| flips first buys the recall of flipping every bit at
    a fraction of the fan-out (n_probes ≪ n_planes+1), which matters once
    the query side stops being broadcast-small. Same plane family as
    ``hyperplane_bucket_udf`` (pure function of (dim, n_planes, seed));
    one numpy matmul + argsort per Arrow batch."""
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int32)
    n_flips = max(0, min(n_probes - 1, n_planes))

    @pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        proj = mat @ planes
        base = (((proj > 0) @ powers).astype(np.int32))
        # margin rank: |proj| ascending = least-confident planes first
        order = np.argsort(np.abs(proj), axis=1)[:, :n_flips]
        flips = base[:, None] ^ (1 << order).astype(np.int32)
        out = np.concatenate([base[:, None], flips], axis=1)
        return pd.Series(list(out))

    return probes


def hash_sample_candidates(
    corpus: DataFrame, vec_col: str, cutoff: int | None, seed: int
) -> DataFrame:
    """Rows whose deterministic hash falls below ``cutoff`` — the
    distributed half of codebook sampling: a pure Filter over the scan (no
    sort, no TakeOrdered, no shuffle), so at 10^10 vectors the sample costs
    one pruned pass instead of ranking every row. ``cutoff=None`` = no
    filter (the whole-corpus final widening step)."""
    h = F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed))
    out = corpus.select(F.col(vec_col).alias("_v"), h.alias("_h"))
    return out if cutoff is None else out.filter(F.col("_h") < cutoff)


def ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_per_centroid: int = 64,
    seed: int = 42,
    n_iters: int = 3,
) -> "np.ndarray":
    """Deterministic IVF codebook: k-means on a fixed-seed sample.

    The sample is the n smallest xxhash64(vector) values — a pure function
    of (corpus, seed), no RDD sampling nondeterminism. It is found WITHOUT
    sorting the corpus: a hash-threshold Filter collects the candidates
    whose hash falls under a cutoff (xxhash64 is ~uniform over int64, so a
    cutoff at fraction f of the range passes ~f·|corpus| rows), and the
    driver sorts only those few. The cutoff starts optimistic and widens
    deterministically (×16) until ≥ n rows survive — each widening only
    happens when the corpus is small enough that the next collect is ~16n
    rows, so driver memory stays bounded without ever running a count or a
    full-corpus sort. Lloyd iterations run driver-side in numpy on the
    small sample (classic IVF training: train small, assign big).
    """
    n = n_centroids * sample_per_centroid
    lo, span = -(1 << 63), 1 << 64
    frac = 1.0 / 1024
    while True:
        cutoff = None if frac >= 1.0 else lo + int(span * frac)
        sample = hash_sample_candidates(corpus, vec_col, cutoff, seed).collect()
        if len(sample) >= n or frac >= 1.0:
            break
        frac *= 16
    # ties on _h broken by vector bytes: fully deterministic even across
    # hash collisions (which orderBy("_h").limit(n) left to chance)
    sample.sort(key=lambda r: (r["_h"], tuple(r["_v"])))
    sample = sample[:n]
    x = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in sample])
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign_udf(cents: "np.ndarray", nprobe: int = 1):
    """Assign vectors to their nprobe nearest centroids (array<int>)."""
    c = cents.astype(np.float64)
    c_norm2 = (c**2).sum(axis=1)

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        # argmin ||v-c||^2 = argmin (||c||^2 - 2 v·c)
        d = c_norm2[None, :] - 2.0 * (mat @ c.T)
        idx = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(idx))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their single nearest
    centroid's inverted list; queries probe their nprobe nearest lists;
    exact cosine re-rank on candidates. The 100 TB path: candidate set per
    query shrinks by ~n_centroids/nprobe vs brute force, and the bucket join
    shuffles only (id, bucket, vec)."""
    cents = ivf_centroids(corpus, vec_col, n_centroids, seed=seed)
    assign1 = ivf_assign_udf(cents, nprobe=1)
    assignp = ivf_assign_udf(cents, nprobe=nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.explode(assign1(F.col(vec_col))).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(assignp(F.col(vec_col))).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk_per_query(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multi_probe: bool = False,
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket equi-join + exact rerank.

    Recall < 1.0 by construction (single probe). Two multi-probe modes:

    - ``multi_probe=True`` probes every 1-bit-flip neighbor of the query's
      bucket (n_planes+1 buckets per query) — a true near-neighbor differs
      from the query in few plane signs, so this recovers most single-probe
      misses WITHOUT a second index or lower corpus-side selectivity.
    - ``n_probes=T`` (ranked multi-probe, overrides ``multi_probe``) probes
      only the T buckets most likely to hold misses: the base bucket plus
      flips of the T-1 planes the query is CLOSEST to (see
      ``hyperplane_probe_udf``) — same recall mechanism at a fraction of
      the fan-out, the right default once the query side is large.

    The corpus is bucketed once either way; only the (small, broadcast)
    query side fans out. This is the 100 TB path: candidates per query
    shrink by ~2^n_planes versus brute force (÷fan-out when probing).
    """
    dim = len(corpus.select(vec_col).first()[0])
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        bucket(F.col(vec_col)).alias("_bucket"),
    )
    fan_out = multi_probe or n_probes is not None
    if n_probes is not None:
        probe = hyperplane_probe_udf(dim, n_planes, seed, n_probes=n_probes)
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.explode(probe(F.col(vec_col))).alias("_bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            bucket(F.col(vec_col)).alias("_bucket0"),
        )
        if multi_probe:
            # exact bucket + all 1-bit flips, built JVM-side from the UDF output
            probes = F.array(
                F.col("_bucket0"),
                *[F.col("_bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
            q = q.select(
                "query_id", "_qv", F.explode(probes).alias("_bucket")
            )
        else:
            q = q.withColumnRenamed("_bucket0", "_bucket")
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col(F.col("_cv"), F.col("_qv")))
    )
    if fan_out:
        # a candidate can match several probes of the same query
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    return _topk_per_query(scored, k)
