"""IcebergSnapshotStore e2e: runs the real crawl loop against an Iceberg
catalog when the iceberg-spark-runtime jar is present; self-skips otherwise
(no jar ships in this sandbox — the seam is code, and this test documents
exactly what flips on when the jar lands on the classpath)."""

from __future__ import annotations

import os

import pytest


def _iceberg_spark(spark, tmp_path):
    """Wire the Iceberg catalog onto the shared session (catalog confs are
    runtime-settable; only the jar itself must be on the startup classpath);
    None if the runtime class is absent (the only thing missing in this
    sandbox)."""
    from bodhium_webscrapper_spark.plans.iceberg_store import (
        has_iceberg_runtime,
        iceberg_conf,
    )

    if not has_iceberg_runtime(spark):
        return None
    for k, v in iceberg_conf("ice", os.path.join(str(tmp_path), "wh")).items():
        if k != "spark.sql.extensions":  # startup-only; MERGE INTO is native in Spark 4
            spark.conf.set(k, v)
    return spark


def test_crawl_on_iceberg_store(spark, crawl_fixture, tmp_path):
    """Full loop + resume determinism against the Iceberg store: identical
    crawl order vs the parquet-shim twin. Requires iceberg-spark-runtime."""
    ice = _iceberg_spark(spark, tmp_path)
    if ice is None:
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath; add "
            "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 "
            "(or drop the jar into pyspark/jars) and this test runs as-is"
        )
    from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob
    from bodhium_webscrapper_spark.plans.iceberg_store import IcebergSnapshotStore

    seeds = ice.read.parquet(crawl_fixture["seeds"])
    robots = ice.read.parquet(crawl_fixture["robots"])
    cfg = CrawlConfig(max_urls_per_host_per_wave=5, max_waves=3,
                      global_wave_limit=500)

    shim = CrawlJob(ice, crawl_fixture["pages"], seeds, robots, cfg,
                    os.path.join(str(tmp_path), "shim_ckpt"))
    shim.run()
    expected = [(r.wave, r.seq, r.canonical_url) for r in shim.crawl_order().collect()]

    store = IcebergSnapshotStore(ice, "ice", "crawl_ckpt")
    job = CrawlJob(ice, crawl_fixture["pages"], seeds, robots, cfg,
                   checkpoint_dir="unused", store=store)
    job.run()
    got = [(r.wave, r.seq, r.canonical_url) for r in job.crawl_order().collect()]
    assert got == expected

    # resume determinism on the Iceberg store
    store2 = IcebergSnapshotStore(ice, "ice", "crawl_ckpt2")
    partial = CrawlJob(ice, crawl_fixture["pages"], seeds, robots,
                       CrawlConfig(max_urls_per_host_per_wave=5, max_waves=2,
                                   global_wave_limit=500),
                       checkpoint_dir="unused", store=store2)
    partial.run()
    resumed = CrawlJob(ice, crawl_fixture["pages"], seeds, robots, cfg,
                       checkpoint_dir="unused",
                       store=IcebergSnapshotStore(ice, "ice", "crawl_ckpt2"))
    resumed.run(resume=True)
    got2 = [(r.wave, r.seq, r.canonical_url) for r in resumed.crawl_order().collect()]
    assert got2 == expected


def test_iceberg_store_interface_parity():
    """The Iceberg store must expose every member CrawlJob and the tests use
    on the shim — interface drift fails here long before a cluster run."""
    from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore
    from bodhium_webscrapper_spark.plans.iceberg_store import IcebergSnapshotStore

    needed = [
        "write", "write_rows", "read", "read_deltas", "has_artifact",
        "row_count", "column_sum", "manifest", "partition_metrics",
        "artifact_bytes", "committed_wave", "commit_wave", "compact_deltas",
        "wave_dir",
    ]
    for member in needed:
        assert callable(getattr(SnapshotStore, member)), member
        assert callable(getattr(IcebergSnapshotStore, member)), member
