"""In-page <meta name="robots"> directives (functions/extract.py
meta_robots_cols) and their crawl-loop wiring (CrawlConfig.honor_meta_robots):
nofollow pages contribute zero outlinks to the next frontier, noindex pages
are fetched but excluded from the extracted() corpus view.

Reference parity note: the reference follows every same-site link regardless
of page directives (/root/reference/app.py:497-538 — crawl4ai link harvest,
no meta inspection), which is why the flag defaults OFF; ON is target-spec
crawler correctness (REP's in-page half, robots.txt being the host half).
"""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bodhium_webscrapper_spark.functions.extract import (  # noqa: E402
    extract_text_py,
    meta_robots_cols,
)
from bodhium_webscrapper_spark.plans.frontier import (  # noqa: E402
    CrawlConfig,
    CrawlJob,
)
from bodhium_webscrapper_spark.sources.datagen import prepare_pages  # noqa: E402


def test_meta_robots_cols_variants(spark):
    rows = [
        (0, '<head><meta name="robots" content="noindex, follow"/></head>'),
        (1, '<head><meta content="nofollow" name="ROBOTS"/></head>'),
        (2, '<head><meta name="robots" content="NONE"/></head>'),
        (3, '<head><meta name="robots" content="index, follow"/></head>'),
        (4, "<head><title>no robots meta at all</title></head>"),
        (5, '<head><meta name="keywords" content="noindex"/></head>'),
        (6, "<head><meta name='robots' content='noindex,nofollow'/></head>"),
        (7, '<head><meta name="robots" content="pre-noindexed"/></head>'),
    ]
    df = spark.createDataFrame(rows, "i int, html string")
    noindex, nofollow = meta_robots_cols(F.col("html"))
    got = {
        r.i: (r.ni, r.nf)
        for r in df.select("i", noindex.alias("ni"), nofollow.alias("nf")).collect()
    }
    assert got[0] == (True, False)   # plain noindex
    assert got[1] == (False, True)   # content-first order, uppercased name
    assert got[2] == (True, True)    # 'none' shorthand implies both
    assert got[3] == (False, False)  # explicit allow is a no-op
    assert got[4] == (False, False)  # absent tag -> allowed
    assert got[5] == (False, False)  # name mismatch must not trigger
    assert got[6] == (True, True)    # single-quoted attributes
    assert got[7] == (False, False)  # token boundary: 'pre-noindexed' is not a directive


def _site_fixture(spark, tmp_path):
    """4-page single-host site: /a nofollow (links /b /c), /b noindex
    (links /d), /c and /d plain leaves."""

    def html(path, links, meta=""):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        words = " ".join(f"w{i}" for i in range(15))
        return (
            f"<html><head><title>{path}</title>{meta}</head>"
            f"<body><p>page {path} body {words}</p>{body}</body></html>"
        )

    nofollow = '<meta name="robots" content="nofollow"/>'
    noindex = '<meta name="robots" content="noindex"/>'
    specs = [
        ("https://h.example/a", html("/a", ["/b", "/c"], nofollow)),
        ("https://h.example/b", html("/b", ["/d"], noindex)),
        ("https://h.example/c", html("/c", [])),
        ("https://h.example/d", html("/d", [])),
    ]
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (u, ts, h.encode(), extract_text_py(h.encode()), "en") for u, h in specs
    ]
    raw = os.path.join(str(tmp_path), "pages_raw")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(raw)
    pages = prepare_pages(spark, raw, os.path.join(str(tmp_path), "pages"), n_files=2)
    seeds = spark.createDataFrame(
        [("https://h.example/a", 1.0), ("https://h.example/b", 1.0)],
        "url string, priority double",
    )
    robots = spark.createDataFrame(
        [], "host string, disallow_prefixes array<string>, crawl_delay_ms long"
    )
    return pages, seeds, robots


def _run(spark, tmp_path, name, honor):
    pages, seeds, robots = _site_fixture(spark, tmp_path)
    cfg = CrawlConfig(
        max_urls_per_host_per_wave=5,
        max_waves=3,
        global_wave_limit=100,
        verify_extraction=True,
        honor_meta_robots=honor,
    )
    job = CrawlJob(
        spark, pages, seeds, robots, cfg, os.path.join(str(tmp_path), name)
    )
    summary = job.run()
    return job, summary


def test_crawl_honors_meta_robots(spark, tmp_path):
    job, summary = _run(spark, tmp_path, "honored", honor=True)
    order = {
        (r.wave, r.canonical_url) for r in job.crawl_order().collect()
    }
    # wave 0 = the two seeds; wave 1 = ONLY /d (the nofollow page /a
    # contributed no outlinks, so /c is never discovered)
    assert {(0, "https://h.example/a"), (0, "https://h.example/b")} <= order
    wave1 = {u for w, u in order if w == 1}
    assert wave1 == {"https://h.example/d"}
    # the noindex page WAS fetched (its links were followed: /d arrived)...
    assert summary["waves"][0]["fetched"] == 2
    # ...but is excluded from the corpus view
    extracted = {r.canonical_url for r in job.extracted().collect()}
    assert extracted == {"https://h.example/a", "https://h.example/d"}
    # n_links accounting matches the emptied outlinks (count_next contract)
    nl = {
        r.canonical_url: r.n_links
        for r in job.store.read_deltas(
            spark, "page_results", job.store.committed_wave()
        ).collect()
    }
    assert nl["https://h.example/a"] == 0  # nofollow zeroed
    assert nl["https://h.example/b"] == 1


def test_crawl_default_ignores_meta_robots(spark, tmp_path):
    job, _ = _run(spark, tmp_path, "ignored", honor=False)
    order = {(r.wave, r.canonical_url) for r in job.crawl_order().collect()}
    wave1 = {u for w, u in order if w == 1}
    # parity mode: /a's links are followed, /c is discovered
    assert wave1 == {"https://h.example/c", "https://h.example/d"}
    extracted = {r.canonical_url for r in job.extracted().collect()}
    assert "https://h.example/b" in extracted  # noindex ignored
    # and the artifact schema is unchanged (no noindex column)
    cols = job.store.read_deltas(
        spark, "page_results", job.store.committed_wave()
    ).columns
    assert "noindex" not in cols
