"""URL-seen membership: bloom pre-pass must never change exact semantics."""

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.seen import BloomState, build_bloom, seen_anti_join


def _dfs(spark):
    frontier = spark.range(0, 5000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.col("id").alias("payload"),
    )
    # seen = every third key (overlap) plus some foreign keys
    seen = spark.range(0, 5000, 3).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    return frontier, seen


def test_bloom_matches_exact_antijoin(spark):
    frontier, seen = _dfs(spark)
    exact = seen_anti_join(frontier, seen)
    bloom_df = build_bloom(seen, n_buckets=16)
    bloom = BloomState.from_df(spark, bloom_df, 16)
    with_bloom = seen_anti_join(frontier, seen, bloom=bloom)
    a = {r.payload for r in exact.collect()}
    b = {r.payload for r in with_bloom.collect()}
    assert a == b
    assert len(a) == 5000 - len(range(0, 5000, 3))


def test_bloom_no_false_negatives(spark):
    """Every seen key must test positive (bloom FNs would break dedup)."""
    _, seen = _dfs(spark)
    bloom_df = build_bloom(seen, n_buckets=16)
    bloom = BloomState.from_df(spark, bloom_df, 16)
    negatives = seen.filter(~bloom.might_contain_udf()(F.col("url_hash"))).count()
    assert negatives == 0


def test_bloom_fpp_reasonable(spark):
    """Foreign keys should mostly test negative (that's the whole point)."""
    _, seen = _dfs(spark)
    foreign = spark.range(100000, 110000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    bloom_df = build_bloom(seen, n_buckets=16)
    bloom = BloomState.from_df(spark, bloom_df, 16)
    fp = foreign.filter(bloom.might_contain_udf()(F.col("url_hash"))).count()
    assert fp / 10000 < 0.01


def test_bloom_non_pow2_buckets_no_false_negatives(spark):
    """Build buckets via F.pmod (signed), probe via numpy — they must agree
    for ANY n_buckets, not just powers of two (a mismatch makes bloom false
    negatives that bypass the exact anti-join)."""
    _, seen = _dfs(spark)
    for n_buckets in (13, 63, 100):
        bloom_df = build_bloom(seen, n_buckets=n_buckets)
        bloom = BloomState.from_df(spark, bloom_df, n_buckets)
        negatives = seen.filter(~bloom.might_contain_udf()(F.col("url_hash"))).count()
        assert negatives == 0, f"n_buckets={n_buckets}"


def test_distributed_bloom_matches_exact(spark):
    """Executor-side (cogrouped) bloom path: same exact semantics, and the
    incremental delta merge must not lose keys across waves."""
    from bodhium_webscrapper_spark.operators.seen import DistributedBloom

    frontier, seen = _dfs(spark)
    half_a = seen.filter(F.col("url_hash") % 2 == 0)
    half_b = seen.filter(F.col("url_hash") % 2 != 0)
    bloom = DistributedBloom(spark, n_buckets=16, capacity=10_000)
    bloom.add_delta(half_a)
    bloom.add_delta(half_b)  # exercises or_merge_blobs
    exact = seen_anti_join(frontier, seen)
    with_bloom = seen_anti_join(frontier, seen, bloom=bloom.state())
    a = {r.payload for r in exact.collect()}
    b = {r.payload for r in with_bloom.collect()}
    assert a == b

    # no false negatives: every seen key must flag maybe_seen
    flagged = bloom.pre_filter(seen.select("url_hash"), "url_hash")
    assert flagged.filter(~F.col("_maybe_seen")).count() == 0


def test_distributed_bloom_non_pow2_buckets(spark):
    from bodhium_webscrapper_spark.operators.seen import DistributedBloom

    _, seen = _dfs(spark)
    bloom = DistributedBloom(spark, n_buckets=13, capacity=10_000)
    bloom.add_delta(seen)
    flagged = bloom.pre_filter(seen.select("url_hash"), "url_hash")
    assert flagged.filter(~F.col("_maybe_seen")).count() == 0
