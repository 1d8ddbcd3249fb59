"""Crawler-trap host detection.

The reference crawls a fixed seed list and never faces unbounded URL
spaces, but its breadth-style outlink loop (``/root/reference/app.py:
592-648``, internal-link collection per fetched page) would walk straight
into the classic traps a production frontier must fence off: calendar
pages, session-id rewrites, faceted-search grids — hosts that keep
minting NEW urls for OLD content. At 10^10-frontier scale a single trap
host can eat an entire politeness budget forever, so detection has to be
an aggregate over the crawl log, not a per-url heuristic.

Signals (all exact integers, per host):

- ``n_urls``            rows observed for the host;
- ``n_fps``             distinct content fingerprints — a trap mints urls
                        faster than content, so ``n_fps << n_urls``;
- ``max_depth``         deepest path (segment count);
- ``n_repeat_urls``     urls whose path repeats one segment >= ``min_repeat``
                        times (``/a/b/a/b/a`` — the self-linking loop shape);
- ``max_params``        widest query string (faceted-search explosion);
- ``is_trap``           ``n_urls >= min_urls`` AND (content collapse:
                        ``100*n_fps <= max_fp_pct*n_urls``, OR loop shape:
                        ``100*n_repeat_urls >= repeat_pct*n_urls``).

Plan shape: one linear scan computing per-url signals as JVM column
expressions (split/filter/transform on path segments — arrays are a few
dozen entries, never wider), then ONE groupBy(host) with map-side partial
aggregation. The only shuffle moving more than (host, counters) is the
exact distinct-fingerprint count, which shuffles (host, 16-byte fp) pairs;
at 100 TB swap ``F.count_distinct`` for ``F.approx_count_distinct`` (HLL,
fully map-side-combined) — the thresholds are percentage-scale, far above
HLL error. Kept exact here so the DuckDB oracle replays bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _path_segments(url: Column) -> Column:
    path = F.regexp_extract(url, _PATH_RE, 1)
    return F.filter(F.split(path, "/"), lambda s: s != F.lit(""))


def _max_segment_repeat(segs: Column) -> Column:
    """Highest multiplicity of any single segment within one path.

    Quadratic in segment count — paths are bounded-tiny (a crawler that
    sees 10^3-segment paths has already found its trap), and it stays a
    whole-stage-codegen HOF instead of a per-row Python hop.
    """
    counts = F.transform(
        segs, lambda s: F.size(F.filter(segs, lambda x: x == s))
    )
    return F.coalesce(F.array_max(counts), F.lit(0))


def _n_params(url: Column) -> Column:
    q = F.regexp_extract(url, _QUERY_RE, 1)
    return F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))


def trap_host_signals(
    df: DataFrame,
    host_col: str,
    url_col: str,
    fp_col: str,
    min_urls: int = 20,
    max_fp_pct: int = 10,
    min_repeat: int = 3,
    repeat_pct: int = 50,
) -> DataFrame:
    """Per-host trap signals + verdict over (host, url, content-fingerprint)
    crawl-log rows. Callers pass distinct urls (the seen-set already
    guarantees this inside the wave loop). See module doc for semantics
    and the 100 TB plan-shape argument.
    """
    segs = _path_segments(F.col(url_col))
    per_url = df.select(
        F.col(host_col).alias("host"),
        F.col(fp_col).alias("fp"),
        F.size(segs).alias("_depth"),
        (_max_segment_repeat(segs) >= min_repeat).cast("int").alias("_rep"),
        _n_params(F.col(url_col)).alias("_np"),
    )
    agg = per_url.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("fp").alias("n_fps"),
        F.max("_depth").cast("long").alias("max_depth"),
        F.sum("_rep").cast("long").alias("n_repeat_urls"),
        F.max("_np").cast("long").alias("max_params"),
    )
    return agg.select(
        "host", "n_urls", "n_fps", "max_depth", "n_repeat_urls", "max_params",
        (
            (F.col("n_urls") >= min_urls)
            & (
                (F.col("n_fps") * 100 <= F.lit(max_fp_pct) * F.col("n_urls"))
                | (F.col("n_repeat_urls") * 100
                   >= F.lit(repeat_pct) * F.col("n_urls"))
            )
        ).alias("is_trap"),
    )


# ---------------------------------------------------------- URL templates

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def url_template(url: Column) -> Column:
    """Generalize a URL's path+query into its TEMPLATE — the shape shared
    by every member of a machine-minted URL family:

      - hex runs of >= 8 chars -> ``H``   (session ids, content hashes)
      - digit runs            -> ``N``   (page numbers, dates, item ids)
      - query VALUES          -> ``V``   (param names kept, order kept)

    ``/2024/03/item8234?page=7&sid=ab12cd34ef`` →
    ``/N/N/itemN?page=V&sid=V``. Hex collapses before digits so a hex run
    is one ``H``, not ``H``-``N`` shards. Pure JVM regexp chain — one
    whole-stage-codegen pass, replayed verbatim by the DuckDB oracle."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    q = F.regexp_extract(url, _QUERY_RE, 1)
    path_t = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "H"), r"[0-9]+", "N"
    )
    q_t = F.regexp_replace(q, r"=[^&#]*", "=V")
    return F.when(q == "", path_t).otherwise(F.concat(path_t, F.lit("?"), q_t))


def url_template_census(
    df: DataFrame,
    url_col: str,
    min_urls: int = 1,
) -> DataFrame:
    """Per-(host, template) URL-family census — the URL-space complement of
    ``trap_host_signals``'s content-side verdict. A family whose ``n_urls``
    keeps growing while every member is distinct (``n_distinct == n_urls``)
    is a minting pattern: calendars, faceted grids, session rewrites —
    fence it with a blocklist substring or a per-template budget BEFORE the
    content-collapse signal can accumulate fetches.

    Plan shape at 10^10 urls: one linear scan computing the template as a
    codegen'd regexp chain, then ONE groupBy on (host, template) — map-side
    partial aggregation bounds the shuffle by the number of DISTINCT
    families per partition (Zipf-bounded: big hosts reuse few templates —
    the very property being detected), never by URL count. The exact
    ``count_distinct(url)`` shuffles (host, template, url) for dedup; at
    100 TB swap it for ``approx_count_distinct`` (fully map-side HLL) —
    kept exact here so the oracle replays bit-identically.
    """
    u = F.col(url_col)
    per = df.select(
        F.regexp_extract(u, _HOST_RE, 1).alias("host"),
        url_template(u).alias("template"),
        u.alias("_u"),
    )
    return (
        per.groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct("_u").alias("n_distinct"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )
