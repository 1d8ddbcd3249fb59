"""Unit tests: redirect-chain resolution (pointer doubling) and
cross-document line dedup."""

from pyspark.sql import functions as F

from bodhium_webscrapper_spark.operators.quality import line_dedup
from bodhium_webscrapper_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = resolve_redirects(df, **kw).collect()
    return {r.src_id: (r.final_id, r.hops, r.is_cycle) for r in rows}


def test_redirects_chain_and_cycle(spark):
    got = _resolve(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
    )
    assert got == {
        1: (4, 3, False),
        2: (4, 2, False),
        3: (4, 1, False),
        10: (11, 1, False),
        20: (None, None, True),
        21: (None, None, True),
    }


def test_redirects_long_chain_exact_hops(spark):
    # 20-hop chain: pointer doubling must compose hop counts exactly
    edges = [(i, i + 1) for i in range(20)]
    got = _resolve(spark, edges)
    assert got[0] == (20, 20, False)
    assert got[13] == (20, 7, False)


def test_redirects_hop_budget_flags_overlong(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _resolve(spark, edges, max_hops=4)
    assert got[8] == (10, 2, False)
    # 0 is 10 hops from the terminal: over the budget -> discard flag
    assert got[0] == (None, None, True)


def test_line_dedup_removes_cross_doc_keeps_within_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared banner\nunique one"),
            (2, "shared banner\nbody two"),
            (3, "shared banner"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, "doc_id", "text").collect()}
    # the cross-doc banner vanishes everywhere; doc 1's within-doc repeat
    # of its own unique line survives twice, order preserved
    assert out[1].text == "unique one\nunique one"
    assert (out[1].n_lines, out[1].n_dup_lines) == (3, 1)
    assert out[2].text == "body two"
    # all lines removed -> empty text, row still present
    assert out[3].text == ""
    assert (out[3].n_lines, out[3].n_dup_lines) == (1, 1)


def test_line_dedup_preserves_blank_lines(spark):
    """Structural blanks are exempt from the census (regression: ''
    segments from consecutive newlines share one corpus-wide hash, so
    any min_docs docs containing a paragraph break used to delete EVERY
    blank line — and all paragraph structure — from the whole corpus)."""
    docs = spark.createDataFrame(
        [
            (1, "para one\n\npara two"),
            (2, "other one\n\nother two\n"),
            (3, "shared banner\n  \nshared banner tail"),
            (4, "shared banner\n  \nshared banner tail"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, "doc_id", "text").collect()}
    # blank lines (and the trailing-newline empty segment) survive
    assert out[1].text == "para one\n\npara two"
    assert out[1].n_dup_lines == 0
    assert out[2].text == "other one\n\nother two\n"
    # content repeats still go; the whitespace-only separator stays
    assert out[3].text == "  "
    assert (out[3].n_lines, out[3].n_dup_lines) == (3, 2)


def test_line_dedup_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc"), (3, "a\nb")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in line_dedup(docs, "doc_id", "text", min_docs=3).collect()
    }
    # 'a' is in 3 docs (removed); 'b' only in 2 (kept at min_docs=3)
    assert out == {1: "b", 2: "c", 3: "b"}


# ---------------------------------------------------------------- WARC


def test_warc_roundtrip_and_internal_blank_lines(spark):
    from bodhium_webscrapper_spark.sources.warc import (
        build_warc_record,
        parse_warc_records,
    )

    # payload with an INTERNAL blank line: the limit-2 header split must
    # keep it intact
    body = "para one\r\n\r\npara two"
    # payload ENDING with CRLF: the trailer strip must remove exactly one
    # CRLFCRLF (the writer's inverse), not every trailing CRLF (regression:
    # a greedy (\r\n)+$ truncated CRLF-line-ending payloads and
    # false-tripped length_ok)
    crlf_tail = "line one\r\nline two\r\n"
    tail_df = spark.range(1).select(
        build_warc_record(F.lit("https://a.example/3"), F.lit(crlf_tail))
        .alias("blob")
    )
    (trow,) = parse_warc_records(tail_df, "blob").collect()
    assert trow.payload == crlf_tail
    assert trow.length_ok is True
    df = spark.range(1).select(
        F.concat(
            build_warc_record(F.lit("https://a.example/1"), F.lit(body)),
            build_warc_record(
                F.lit("https://a.example/2"), F.lit("plain"),
                warc_type="response", date="2025-12-31T23:59:59Z",
            ),
        ).alias("blob")
    )
    rows = parse_warc_records(df, "blob").orderBy("rec_idx").collect()
    assert len(rows) == 2
    r1, r2 = rows
    assert (r1.uri, r1.payload, r1.length_ok, r1.rec_idx) == (
        "https://a.example/1", body, True, 0)
    assert (r2.warc_type, r2.warc_date, r2.payload) == (
        "response", "2025-12-31T23:59:59Z", "plain")
    assert r2.warc_ts is not None and r2.content_length == 5


def test_warc_malformed_record_survives(spark):
    from bodhium_webscrapper_spark.sources.warc import parse_warc_records

    blob = (
        "WARC/1.0\r\nWARC-Type: conversion\r\n\r\npayload without length\r\n\r\n"
        "WARC/1.0\r\nWARC-Target-URI: https://b.example/\r\n"
        "Content-Length: 999\r\n\r\nshort\r\n\r\n"
    )
    df = spark.createDataFrame([(blob,)], "blob string")
    rows = parse_warc_records(df, "blob").orderBy("rec_idx").collect()
    assert len(rows) == 2
    # missing headers -> empty strings / NULL length, no row lost
    assert rows[0].uri == "" and rows[0].content_length is None
    assert rows[0].length_ok is None
    # declared length wrong -> corruption tripwire fires
    assert rows[1].content_length == 999 and rows[1].length_ok is False
