"""RSS/Atom feed parsing (sources/feeds.py) and HTML charset sniffing
(functions/textstats.py sniff_charset) — the round-5c seed/extract
additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.functions.textstats import sniff_charset
from bodhium_webscrapper_spark.sources.feeds import feed_seeds, parse_feed

RSS = (
    "<rss><channel>"
    "<item><title>First &amp; best</title>"
    "<link> https://h.example/a?x=1&amp;y=2 </link>"
    "<pubDate>Mon, 05 Jan 2026 00:00:00 GMT</pubDate></item>"
    "<item><link>https://shared.example/new</link></item>"
    "<item><title>no link here</title></item>"
    "<item><link>https://h.example/c</link></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom">'
    '<entry><title>A0</title>'
    '<link rel="enclosure" href="https://h.example/img.png"/>'
    '<link rel="alternate" href="https://h.example/b"/>'
    "<updated>2026-01-03</updated></entry>"
    '<entry><link href="https://h.example/d" rel="alternate"/></entry>'
    '<entry><link href="https://shared.example/new"/></entry>'
    "</feed>"
)


def _feeds_df(spark):
    return spark.createDataFrame(
        [("https://h.example/rss.xml", RSS), ("https://h.example/atom.xml", ATOM)],
        ["feed_url", "feed_xml"],
    )


def test_parse_feed_rss_entries(spark):
    rows = (
        parse_feed(_feeds_df(spark))
        .filter(F.col("kind") == "rss")
        .orderBy("entry_pos")
        .collect()
    )
    # the link-less item is dropped but keeps its position slot
    assert [(r.entry_pos, r.link) for r in rows] == [
        (0, "https://h.example/a?x=1&y=2"),
        (1, "https://shared.example/new"),
        (3, "https://h.example/c"),
    ]
    assert rows[0].title == "First & best"  # entity-unescaped
    assert rows[0].published == "Mon, 05 Jan 2026 00:00:00 GMT"
    assert rows[1].title is None and rows[1].published is None


def test_parse_feed_atom_link_selection(spark):
    rows = (
        parse_feed(_feeds_df(spark))
        .filter(F.col("kind") == "atom")
        .orderBy("entry_pos")
        .collect()
    )
    # rel=alternate wins over the enclosure that PRECEDES it in doc order;
    # href-then-rel attribute order works; bare href defaults to alternate
    assert [r.link for r in rows] == [
        "https://h.example/b",
        "https://h.example/d",
        "https://shared.example/new",
    ]
    assert rows[0].published == "2026-01-03"


def test_feed_seeds_freshest_position_wins(spark):
    rows = {r.url: r.priority for r in feed_seeds(_feeds_df(spark)).collect()}
    # shared URL appears at RSS pos 1 and Atom pos 2 → best priority 1/2
    assert rows["https://shared.example/new"] == 0.5
    assert rows["https://h.example/a?x=1&y=2"] == 1.0
    assert rows["https://h.example/b"] == 1.0


def test_parse_feed_plan_has_no_exchange_no_python(spark):
    plan = parse_feed(_feeds_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_sniff_charset_cases(spark):
    cases = [
        ('<meta charset="UTF-8">', "utf-8"),
        ("<meta http-equiv='Content-Type' content='text/html; charset=ISO-8859-1'>",
         "windows-1252"),
        ('<?xml version="1.0" encoding="Windows-1251"?>', "windows-1251"),
        ("<meta charset=latin1>", "windows-1252"),
        ("<body>nothing</body>", "utf-8"),
        ("<META CHARSET='Shift_JIS'>", "shift_jis"),
        ('<meta charset = "utf8">', "utf-8"),
        # meta declaration beats the XML prolog
        ('<?xml version="1.0" encoding="UTF-8"?><meta charset="koi8-r">',
         "koi8-r"),
        # a charset-less meta before the real one must not shadow it
        ('<meta name="viewport" content="width=device-width">'
         '<meta charset="GB2312">', "gb2312"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {
        r.i: r.cs
        for r in df.select("i", sniff_charset(F.col("html")).alias("cs")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
