"""WARC record parsing — the Common-Crawl-native source format.

The reference never touches WARC: its pages arrive one URL at a time
through a browser fetch (``/root/reference/app.py:497-538``). An engine
that claims Common-Crawl-style input (BASELINE input_hint) must also
ingest the archive format those corpora actually ship as: concatenated
WARC records (WARC/1.0 header block, named headers, blank line, payload,
blank line). This module parses the WET/conversion-style plaintext form.

Scale shape: each input row is one multi-record blob (on a real cluster,
one WET file chunk per row via ``spark.read.text``'s
``wholetext``/binaryFiles or an Iceberg staging table). Parsing is ONE
narrow projection — regexp split on the record magic, posexplode, then
per-record regexp_extract for each named header — all whole-stage
codegen, zero Python, so the scan parallelizes by blob row and never
shuffles. Per-record gzip members (the .warc.gz layout) are a decode
seam like multimodal's ``decode_fn``: split members JVM-side, inflate in
a mapInPandas batch — not implemented here because the plaintext form
covers the query semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MAGIC_RE = r"WARC/1\.0\r\n"
_SEP_RE = r"\r\n\r\n"


def parse_warc_records(
    df: DataFrame, blob_col: str = "blob", keep_cols: list[str] | None = None
) -> DataFrame:
    """Explode multi-record WARC blobs into one row per record.

    Returns ``keep_cols + (rec_idx, warc_type, uri, warc_date, warc_ts,
    content_length, payload, length_ok)``. ``rec_idx`` is the record's
    position within its blob (0-based). ``length_ok`` cross-checks the
    declared Content-Length against the payload's char length — the
    cheap corruption tripwire a 100 TB ingest wants inline, not as a
    second pass. Missing headers come out as empty strings (NULL
    content_length), never as parse failures: a malformed record must
    not kill a million-record scan.
    """
    keep = list(keep_cols or [])
    recs = F.split(F.col(blob_col), _MAGIC_RE)
    exploded = (
        df.select(*keep, F.posexplode(recs).alias("_i", "_rec"))
        .filter(F.col("_rec") != "")
    )
    parts = F.split(F.col("_rec"), _SEP_RE, 2)
    hdr = F.element_at(parts, 1)
    # limit=2 keeps payload-internal blank lines intact; strip the record's
    # own trailing separator — EXACTLY one CRLFCRLF (the writer's inverse):
    # a greedy (\r\n)+ here would also eat payload bytes when the payload
    # legitimately ends with CRLF line endings, truncating the content and
    # false-tripping length_ok. \z (not $) because Java's $ also matches
    # before a final line terminator.
    payload = F.regexp_replace(F.element_at(parts, 2), r"\r\n\r\n\z", "")

    def _h(name: str):
        return F.regexp_extract(hdr, rf"{name}: ([^\r\n]+)", 1)

    clen = F.nullif(_h("Content-Length"), F.lit("")).cast("long")
    date = _h("WARC-Date")
    return exploded.select(
        *keep,
        (F.col("_i") - 1).alias("rec_idx"),
        _h("WARC-Type").alias("warc_type"),
        _h("WARC-Target-URI").alias("uri"),
        date.alias("warc_date"),
        # try_: a record with a missing/garbled date yields NULL, it must
        # not abort the scan under ANSI timestamp parsing
        F.try_to_timestamp(date, F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("warc_ts"),
        clen.alias("content_length"),
        payload.alias("payload"),
        (clen == F.length(payload)).alias("length_ok"),
    )


def build_warc_record(
    uri,
    payload,
    warc_type="conversion",
    date="2026-01-01T00:00:00Z",
):
    """Column expression assembling one canonical WET-style record —
    the writer twin of :func:`parse_warc_records` (round-trip tested).
    ``uri``/``payload`` are Columns; ``warc_type``/``date`` str or Column."""
    wt = warc_type if not isinstance(warc_type, str) else F.lit(warc_type)
    dt = date if not isinstance(date, str) else F.lit(date)
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: "), wt, F.lit("\r\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\r\n"),
        F.lit("WARC-Date: "), dt, F.lit("\r\n"),
        F.lit("Content-Length: "), F.length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n\r\n"),
    )
