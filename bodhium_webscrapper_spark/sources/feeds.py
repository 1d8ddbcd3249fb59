"""RSS 2.0 / Atom feed parsing — ``<item>``/``<entry>`` to rows, JVM-side.

Feeds are the third seed-discovery surface next to sitemaps and robots
``Sitemap:`` lines (S1 in SURVEY.md §2.1): news/blog hosts publish their
freshest URLs there long before sitemaps update, so a crawl that polls
feeds finds new pages with minutes of latency instead of a recrawl cycle.
The reference's seed chain is sitemap-only (``/root/reference/app.py``
seed branch); feeds extend the same contract — fetched feed BODIES arrive
as a DataFrame column, extraction is one ``regexp_extract_all`` +
``posexplode`` scan, whole-stage codegen, zero shuffle at any corpus size.

Scope (documented, tested, same stance as ``sitemap.py``): the common
regular shape of both formats — RSS ``<item>`` blocks with ``<link>`` child
text, Atom ``<entry>`` blocks with ``<link ... href="...">`` attributes
(both attribute orders, ``rel="alternate"`` preferred over other rels,
bare ``href`` accepted), ``<title>``, and ``<pubDate>``/``<updated>``
timestamps; the five predefined XML entities unescaped. CDATA and exotic
namespace prefixes are out of scope for the regexp form; a production
upgrade swaps the entry regex for a real XML parser behind the same
output schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bodhium_webscrapper_spark.sources.sitemap import _xml_unescape

# one entry block per <item>…</item> (RSS) or <entry>…</entry> (Atom);
# (?s) so entries may span lines
_ENTRY_RE = r"(?s)<(?:item|entry)\b[^>]*>(.*?)</(?:item|entry)>"
_RSS_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
# Atom: rel-then-href / href-then-rel (the meta-robots both-orders lesson),
# else the first bare href on a <link>
_ATOM_ALT_RE = (
    r"""(?s)<link\b[^>]*rel\s*=\s*["']alternate["'][^>]*"""
    r"""href\s*=\s*["']([^"']*)["']"""
)
_ATOM_ALT_RE2 = (
    r"""(?s)<link\b[^>]*href\s*=\s*["']([^"']*)["'][^>]*"""
    r"""rel\s*=\s*["']alternate["']"""
)
_ATOM_HREF_RE = r"""(?s)<link\b[^>]*href\s*=\s*["']([^"']*)["']"""
_TITLE_RE = r"(?s)<title\b[^>]*>\s*(.*?)\s*</title>"
_PUBDATE_RE = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"
_UPDATED_RE = r"(?s)<updated>\s*(.*?)\s*</updated>"


def _entry_link(entry: Column, kind: Column) -> Column:
    """Entry URL under each format's convention. RSS ``<link>`` holds child
    text; Atom ``<link>`` is an attribute-only tag where the alternate rel
    (either attribute order) is THE entry page per RFC 4287 §4.2.7.2 and a
    rel-less href defaults to alternate."""
    rss = F.regexp_extract(entry, _RSS_LINK_RE, 1)
    alt1 = F.regexp_extract(entry, _ATOM_ALT_RE, 1)
    alt2 = F.regexp_extract(entry, _ATOM_ALT_RE2, 1)
    bare = F.regexp_extract(entry, _ATOM_HREF_RE, 1)
    atom = F.when(alt1 != "", alt1).when(alt2 != "", alt2).otherwise(bare)
    return F.when(kind == "atom", atom).otherwise(rss)


def parse_feed(
    df: DataFrame,
    xml_col: str = "feed_xml",
    source_col: str = "feed_url",
) -> DataFrame:
    """Explode RSS/Atom feed bodies into ``(feed_url, kind, entry_pos,
    link, title, published)`` rows.

    ``kind`` is ``"atom"`` for ``<feed`` documents, ``"rss"`` otherwise.
    ``entry_pos`` is the 0-based position in document order — feeds list
    newest-first, so position is a freshness rank the seed derivation
    turns into priority. ``published`` is the trimmed ``<pubDate>`` (RSS)
    or ``<updated>`` (Atom) string; casting is the caller's choice, same
    contract as sitemap ``lastmod``. Entries with no resolvable link are
    dropped (position-preserving). Links/titles are entity-unescaped but
    NOT canonicalized — that is the seed pipeline's job.
    """
    kind = F.when(F.col(xml_col).contains("<feed"), F.lit("atom")).otherwise(
        F.lit("rss")
    )
    entries = df.select(
        F.col(source_col).alias("feed_url"),
        kind.alias("kind"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ENTRY_RE), F.lit(1))
        ).alias("entry_pos", "_entry"),
    )
    e = F.col("_entry")
    published = F.when(
        F.col("kind") == "atom", F.regexp_extract(e, _UPDATED_RE, 1)
    ).otherwise(F.regexp_extract(e, _PUBDATE_RE, 1))
    return (
        entries.select(
            "feed_url",
            "kind",
            "entry_pos",
            _xml_unescape(_entry_link(e, F.col("kind"))).alias("link"),
            F.nullif(
                _xml_unescape(F.regexp_extract(e, _TITLE_RE, 1)), F.lit("")
            ).alias("title"),
            F.nullif(published, F.lit("")).alias("published"),
        )
        .filter(F.col("link") != "")
    )


def feed_seeds(
    df: DataFrame,
    xml_col: str = "feed_xml",
    source_col: str = "feed_url",
) -> DataFrame:
    """Batch-collected feed bodies → frontier seed list ``(url, priority
    double)`` — the exact contract of ``sitemap.sitemap_seeds`` so the two
    sources union into one seed wave.

    ``priority = 1.0 / (1.0 + entry_pos)`` honors the feed's newest-first
    ordering; a URL syndicated in several feeds keeps its best (freshest)
    position via ``max(priority)`` — first-wins across documents, the
    frontier's own dedup semantics. One exchange-free parse scan + one
    hash aggregation keyed on url.
    """
    entries = parse_feed(df, xml_col=xml_col, source_col=source_col)
    return (
        entries.select(
            F.col("link").alias("url"),
            (F.lit(1.0) / (F.lit(1.0) + F.col("entry_pos"))).alias("_p"),
        )
        .groupBy("url")
        .agg(F.max("_p").alias("priority"))
    )
