"""Round-4 fixes, each pinned by a regression test:

1. full public-suffix support: ``set_public_suffixes`` exists (round 3
   promised it in a docstring but never shipped it), 3/4-label rules and
   private suffixes (github.io) resolve correctly in BOTH twins, and raw
   PSL text loads through ``load_public_suffix_list``.
2. codegen'd boilerplate strip: ``strip_boilerplate_re`` output is
   byte-identical to the HOF reference implementation, with no interpreted
   higher-order filter in its plan.
3. byte-gated pending artifact: a wide-row wave falls back to the Spark
   anti-join path even when its ROW count is under the driver threshold,
   and produces the identical pending artifact.
4. resume format guard: resuming a checkpoint whose manifest lacks the
   current format marker fails loudly at resume time, not with a
   path-not-found waves later.
5. store-seam metrics: the wave loop reads per-partition metrics through
   ``store.partition_metrics`` (works for stores whose wave_dir is not a
   filesystem path); the shim's output matches the old footer_metrics.
6. extraction NaN guard: a non-http(s) page url in a registrable/substring
   scope must not kill the extraction task.
7. ranked multi-probe LSH: probing by distance-to-hyperplane recovers a
   planted 1-bit-flip neighbor with FEWER probes than flip-all.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.plans.frontier import CrawlConfig, CrawlJob


def _mk_job(spark, crawl_fixture, tmp_path, name, **cfg_kwargs):
    seeds = spark.read.parquet(crawl_fixture["seeds"])
    robots = spark.read.parquet(crawl_fixture["robots"])
    defaults = dict(
        max_urls_per_host_per_wave=5, max_waves=4, global_wave_limit=500
    )
    defaults.update(cfg_kwargs)
    return CrawlJob(
        spark,
        crawl_fixture["pages"],
        seeds,
        robots,
        CrawlConfig(**defaults),
        os.path.join(str(tmp_path), name),
    )


# ---------------------------------------------------------------- 1. PSL

def test_psl_3label_and_private_suffixes():
    from bodhium_webscrapper_spark.functions.canonicalize import (
        registrable_domain_py,
    )

    # 3-label ICANN rule: registrable = suffix + 1 label
    assert registrable_domain_py("school.district.k12.ca.us") == "district.k12.ca.us"
    # 4-label rule
    assert registrable_domain_py("x.acme.pvt.k12.ma.us") == "acme.pvt.k12.ma.us"
    # private suffix: hosted subdomains are DISTINCT registrable domains
    assert registrable_domain_py("user1.github.io") == "user1.github.io"
    assert registrable_domain_py("user2.github.io") == "user2.github.io"
    assert registrable_domain_py("deep.user1.github.io") == "user1.github.io"
    # unchanged defaults
    assert registrable_domain_py("blog.example.co.uk") == "example.co.uk"
    assert registrable_domain_py("a.b.example.com") == "example.com"
    assert registrable_domain_py("github.io") == "github.io"


def test_psl_jvm_twin_matches_python(spark):
    from bodhium_webscrapper_spark.functions.canonicalize import (
        registrable_domain,
        registrable_domain_py,
    )

    hosts = [
        "school.district.k12.ca.us", "x.acme.pvt.k12.ma.us",
        "user1.github.io", "deep.user1.github.io", "github.io",
        "blog.example.co.uk", "a.b.example.com", "example.com",
        "127.0.0.1", "app.herokuapp.com", "x.y.nsw.edu.au",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r.host: r.rd
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("rd")
        ).collect()
    }
    for h in hosts:
        assert got[h] == registrable_domain_py(h), h


def test_set_public_suffixes_roundtrip(spark):
    from bodhium_webscrapper_spark.functions import canonicalize as c

    orig = c.current_suffix_rules()
    try:
        c.set_public_suffixes(["co.uk", "example.zz", "deep.rule.zz"])
        assert c.registrable_domain_py("a.b.example.zz") == "b.example.zz"
        assert c.registrable_domain_py("w.deep.rule.zz") == "w.deep.rule.zz"
        # a suffix dropped from the active set reverts to last-two-labels
        assert c.registrable_domain_py("user.github.io") == "github.io"
        df = spark.createDataFrame(
            [("a.b.example.zz",), ("w.deep.rule.zz",), ("user.github.io",)],
            "host string",
        )
        got = {
            r.host: r.rd
            for r in df.select(
                "host", c.registrable_domain(F.col("host")).alias("rd")
            ).collect()
        }
        assert got["a.b.example.zz"] == "b.example.zz"
        assert got["w.deep.rule.zz"] == "w.deep.rule.zz"
        assert got["user.github.io"] == "github.io"
        # round 5: wildcard/exception rules are now first-class
        # (exact semantics in both twins; see test_round5_fixes.py)
        c.set_public_suffixes(["*.ck", "!www.ck"])
        assert c.registrable_domain_py("a.foo.ck") == "a.foo.ck"
        assert c.registrable_domain_py("sub.www.ck") == "www.ck"
    finally:
        c._suffix_rules = orig


def test_load_public_suffix_list():
    from bodhium_webscrapper_spark.functions import canonicalize as c

    psl = """
// ===BEGIN ICANN DOMAINS===
// comment line
com
co.uk
*.ck
!www.ck
k12.ca.us
// ===BEGIN PRIVATE DOMAINS===
github.io
"""
    full = c.load_public_suffix_list(psl)
    assert "co.uk" in full and "k12.ca.us" in full and "github.io" in full
    assert "com" in full  # 1-label entries parse (setter drops them)
    # round 5: wildcard/exception rules are KEPT (the setter implements
    # their exact semantics; see test_round5_fixes.py)
    assert "*.ck" in full and "!www.ck" in full
    icann = c.load_public_suffix_list(psl, include_private=False)
    assert "github.io" not in icann and "co.uk" in icann


# ---------------------------------------------- 2. codegen boilerplate strip

BOILER_CASES = [
    "Real content line\ncopyright 2024 acme corp\nMore content",
    "copyright 2024\nonly content",
    "content only\nCopyright LAST LINE NO NEWLINE",
    "All Rights Reserved\nTerms of Service apply\nclick here to win",
    "keep\n\ncopyright x",          # blank line above a matched line stays
    "a\n\ncopyright x\nb",          # ...also mid-document
    "keep\ncopyright x\n",          # matched line with trailing newline
    "",                              # empty doc
    "   copyright indented\nok",    # leading horizontal whitespace
    "no boilerplate at all\njust text",
    "share this page\nshare this article\nkeep me",
]


def test_strip_boilerplate_re_identical_to_hof(spark):
    from bodhium_webscrapper_spark.functions.textstats import (
        strip_boilerplate,
        strip_boilerplate_re,
    )

    df = spark.createDataFrame([(t,) for t in BOILER_CASES], "text string")
    rows = df.select(
        strip_boilerplate(F.col("text")).alias("hof"),
        strip_boilerplate_re(F.col("text")).alias("re"),
    ).collect()
    for case, r in zip(BOILER_CASES, rows):
        assert r.hof == r.re, repr(case)


def test_strip_boilerplate_re_is_codegen(spark):
    from bodhium_webscrapper_spark.functions.textstats import strip_boilerplate_re

    df = spark.createDataFrame([("x",)], "text string")
    plan = df.select(
        strip_boilerplate_re(F.col("text"))
    )._jdf.queryExecution().executedPlan().toString()
    # no interpreted higher-order function in the plan
    assert "ArrayFilter" not in plan and "lambdafunction" not in plan


# ---------------------------------------------- 3. byte-gated pending path

def test_pending_byte_gate_spark_fallback(spark, crawl_fixture, tmp_path):
    """With the byte gate forced to 0, the pending artifact must be built by
    the Spark anti-join fallback and be IDENTICAL to the driver-path one."""
    a = _mk_job(spark, crawl_fixture, tmp_path, "pend_driver", max_waves=3)
    a.run()
    b = _mk_job(
        spark, crawl_fixture, tmp_path, "pend_spark", max_waves=3,
        pending_driver_max_bytes=0,
    )
    b.run()
    last = a.store.committed_wave()
    assert last == b.store.committed_wave()
    misses = sum(w["misses"] for w in a.store.manifest()["waves"].values())
    assert misses > 0, "fixture must produce fetch misses"
    for wave in range(last + 1):
        pa_ = a.store.read(spark, wave, "pending").orderBy("url_hash").collect()
        pb = b.store.read(spark, wave, "pending").orderBy("url_hash").collect()
        assert pa_ == pb, f"wave {wave}"


# ---------------------------------------------- 4. resume format guard

def test_resume_rejects_old_checkpoint_format(spark, crawl_fixture, tmp_path):
    job = _mk_job(spark, crawl_fixture, tmp_path, "fmt", max_waves=2)
    job.run()
    # simulate a round-2-era checkpoint: manifest without the format marker
    mpath = job.store._manifest_path
    with open(mpath) as f:
        m = json.load(f)
    assert m.get("format") == 2  # commits stamp the current format
    del m["format"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    stale = _mk_job(spark, crawl_fixture, tmp_path, "fmt", max_waves=4)
    with pytest.raises(ValueError, match="checkpoint format"):
        stale.run(resume=True)


# ---------------------------------------------- 5. store-seam metrics

def test_partition_metrics_store_seam(spark, tmp_path):
    from bodhium_webscrapper_spark.plans.checkpoint import SnapshotStore
    from bodhium_webscrapper_spark.plans.metrics import footer_metrics

    store = SnapshotStore(os.path.join(str(tmp_path), "st"))
    df = spark.range(1000).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    store.write(0, "page_results", df)
    seam = store.partition_metrics(0, "page_results", bytes_col="text")
    legacy = footer_metrics(
        store.wave_dir(0, "page_results"), 0, "page_results", bytes_col="text"
    )
    assert seam == [(pid, rows, b) for (_w, _s, pid, rows, b) in legacy]
    assert sum(r for (_p, r, _b) in seam) == 1000
    assert all(b > 0 for (_p, r, b) in seam if r > 0)
    # byte gate input: on-disk artifact size is positive and cheap
    assert store.artifact_bytes(0, "page_results") > 0


def test_iceberg_store_logic_recorder():
    """Execute IcebergSnapshotStore's branch logic against a recording fake
    (no runtime jar needed): create vs re-commit paths, the explicit
    partition DELETE before append (empty re-commits must clear stale
    rows), non-sequential commit rejection, and metadata-table queries for
    row_count/partition_metrics/artifact_bytes."""
    from unittest.mock import MagicMock

    from bodhium_webscrapper_spark.plans.iceberg_store import IcebergSnapshotStore

    spark = MagicMock(name="spark")
    spark.sql.return_value.first.return_value = [7]
    spark.sql.return_value.collect.return_value = []
    store = IcebergSnapshotStore.__new__(IcebergSnapshotStore)
    store.spark = spark
    store.ns = "ice.crawl"
    store.job_id = "crawl"
    store._manifest_tbl = "ice.crawl.job_manifest"

    # write: CREATE branch when the table does not exist
    spark.catalog.tableExists.return_value = False
    df = MagicMock(name="df")
    store.write(0, "scheduled", df)
    df.withColumn.return_value.writeTo.assert_called_with("ice.crawl.scheduled")
    chain = df.withColumn.return_value.writeTo.return_value
    chain.using.assert_called_with("iceberg")
    chain.using.return_value.partitionedBy.return_value.create.assert_called_once()

    # write: re-commit branch = explicit partition DELETE, then append
    spark.catalog.tableExists.return_value = True
    df2 = MagicMock(name="df2")
    store.write(3, "scheduled", df2)
    deletes = [c.args[0] for c in spark.sql.call_args_list if "DELETE" in c.args[0]]
    assert any("_wave_part = 3" in d for d in deletes)
    df2.withColumn.return_value.writeTo.return_value.append.assert_called_once()
    ow = df2.withColumn.return_value.writeTo.return_value.overwritePartitions
    assert not ow.called  # overwritePartitions would keep stale rows on empty

    # metadata-only statistics hit the .partitions/.files tables
    assert store.row_count(1, "scheduled") == 7
    assert store.artifact_bytes(1, "scheduled") == 7
    q = [c.args[0] for c in spark.sql.call_args_list]
    assert any(".partitions" in s and "record_count" in s for s in q)
    assert any(".files" in s and "file_size_in_bytes" in s for s in q)
    assert store.partition_metrics(1, "scheduled") == []

    # non-sequential commit rejected (manifest empty -> committed_wave=-1)
    spark.read.table.return_value.filter.return_value.collect.return_value = []
    with pytest.raises(ValueError, match="non-sequential"):
        store.commit_wave(5, {})


# ---------------------------------------------- 6. extraction NaN guard

def test_bad_page_url_does_not_kill_extraction(spark):
    from bodhium_webscrapper_spark.functions.extract import (
        make_extract_page_outlinks_udf,
    )

    udf = make_extract_page_outlinks_udf("registrable")
    html = (
        "<html><title>t</title><body>"
        '<a href="https://other.example/x">x</a>'
        '<a href="/local">l</a>'
        "<p>one two three four five six seven eight nine ten</p></body></html>"
    ).encode()
    df = spark.createDataFrame(
        [(html, "not a url at all"), (html, "https://good.example/p")],
        "html binary, url string",
    )
    rows = (
        df.withColumn("p", udf(F.col("html"), F.col("url")))
        .select(F.col("url"), F.col("p.outlinks").alias("outlinks"))
        .collect()
    )  # must not raise
    got = {r.url: r.outlinks for r in rows}
    # bad base: cross-host widen check is False, nothing in scope survives
    # except links resolvable without the base? "/local" cannot resolve
    assert got["not a url at all"] is not None
    assert got["https://good.example/p"] == ["https://good.example/local"]
    udf_sub = make_extract_page_outlinks_udf("substring")
    df.withColumn("p", udf_sub(F.col("html"), F.col("url"))).select(
        "p.outlinks"
    ).collect()  # substring scope must not raise either


# ---------------------------------------------- 7. ranked multi-probe LSH

def test_ranked_multiprobe_fewer_probes(spark):
    """A planted neighbor one LOW-MARGIN bit-flip away must be missed by the
    single probe, found by ranked multi-probe with n_probes=3 — fewer than
    the flip-all fan-out of n_planes+1=9."""
    from bodhium_webscrapper_spark.operators.similarity import lsh_topk

    dim, n_planes, seed = 16, 8, 42
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, dim))
    v = base[0] / np.linalg.norm(base[0])
    proj = v @ planes
    j = int(np.argmin(np.abs(proj)))
    p = planes[:, j]
    # reflect v across hyperplane j: flips exactly that sign, tiny move
    q = v - 2 * proj[j] * p / (p @ p)
    bq, bv = ((q @ planes) > 0), (proj > 0)
    assert (bq != bv).sum() == 1 and bq[j] != bv[j]  # planted: 1-bit flip
    # ...and j must be among q's 2 lowest-margin planes for n_probes=3
    assert j in np.argsort(np.abs(q @ planes))[:2]

    corpus_rows = [(i, [float(x) for x in row]) for i, row in enumerate(base)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(100, [float(x) for x in q])], "vec_id long, embedding array<double>"
    )
    single = lsh_topk(corpus, queries, k=5, n_planes=n_planes, seed=seed)
    ranked = lsh_topk(
        corpus, queries, k=5, n_planes=n_planes, seed=seed, n_probes=3
    )
    single_ids = {r.neighbor_id for r in single.collect()}
    ranked_ids = {r.neighbor_id for r in ranked.collect()}
    assert 0 not in single_ids, "planted neighbor must cross a hyperplane"
    assert 0 in ranked_ids, "ranked multi-probe must recover it with 3 probes"


# ------------------------------------------- 8. fused fetch join (round-4)

def test_giant_fallback_fetch_identical_to_broadcast(spark, crawl_fixture, tmp_path):
    """broadcast_wave_threshold=0 forces every wave onto the giant-wave
    fallback (keys-only semi-join + attrs shuffle); the committed artifacts
    must be row-identical to the default fused broadcast path — the
    physical cutover is semantics-free."""
    a = _mk_job(spark, crawl_fixture, tmp_path, "fetch_bcast")
    b = _mk_job(
        spark, crawl_fixture, tmp_path, "fetch_giant", broadcast_wave_threshold=0
    )
    sa, sb = a.run(), b.run()
    assert [w["scheduled"] for w in sa["waves"]] == [
        w["scheduled"] for w in sb["waves"]
    ]
    ea = a.extracted().orderBy("url_hash", "wave")
    eb = b.extracted().orderBy("url_hash", "wave")
    assert ea.schema == eb.schema
    assert ea.exceptAll(eb).isEmpty() and eb.exceptAll(ea).isEmpty()
    # full page_results schema (incl. derived canonical_url/host) matches too
    ra = a.store.read(spark, 0, "page_results")
    rb = b.store.read(spark, 0, "page_results")
    assert ra.columns == rb.columns
    assert ra.exceptAll(rb).isEmpty()


def test_async_finalize_commits_every_wave(spark, crawl_fixture, tmp_path):
    """The background wave-finalize must leave the same committed state a
    synchronous loop would: every run wave committed in order with metrics
    and lineage artifacts present, and the manifest's last wave equal to
    the summary's."""
    job = _mk_job(spark, crawl_fixture, tmp_path, "async_fin")
    summary = job.run()
    waves = [w["wave"] for w in summary["waves"]]
    assert summary["committed_wave"] == waves[-1]
    m = job.store.manifest()
    for w in waves:
        assert str(w) in m["waves"]
        assert job.store.has_artifact(w, "metrics")
        assert job.store.has_artifact(w, "lineage")
        assert "commit_async" in m["waves"][str(w)]["timings"]


def test_seeds_canonical_identical_crawl(spark, crawl_fixture, tmp_path):
    """seeds_canonical=True (trusted canonical seed dump, pure-JVM wave 0)
    must reproduce the default path's crawl exactly when the seeds are in
    fact canonical."""
    # the fixture plants non-canonical URL variants (WWW./:443 decoys) among
    # the pages; seeds_canonical's contract is a TRULY canonical dump, so
    # keep only fixed-point urls
    canon_seeds = (
        spark.read.parquet(crawl_fixture["pages"])
        .selectExpr("url", "cast(1.0 as double) as priority")
        .filter(~F.col("url").rlike("WWW|:443"))
        .limit(200)
    )
    jobs = {}
    for name, flag in (("seeds_raw", False), ("seeds_canon", True)):
        job = CrawlJob(
            spark,
            crawl_fixture["pages"],
            canon_seeds,
            spark.read.parquet(crawl_fixture["robots"]),
            CrawlConfig(
                max_urls_per_host_per_wave=5,
                max_waves=3,
                global_wave_limit=500,
                seeds_canonical=flag,
            ),
            os.path.join(str(tmp_path), name),
        )
        jobs[name] = (job, job.run())
    sa, sb = jobs["seeds_raw"][1], jobs["seeds_canon"][1]
    assert [w["scheduled"] for w in sa["waves"]] == [
        w["scheduled"] for w in sb["waves"]
    ]
    oa = jobs["seeds_raw"][0].crawl_order()
    ob = jobs["seeds_canon"][0].crawl_order()
    assert oa.exceptAll(ob).isEmpty() and ob.exceptAll(oa).isEmpty()
