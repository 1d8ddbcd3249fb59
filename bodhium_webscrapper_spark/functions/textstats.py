"""Text-analysis column functions for training-data pipelines.

All pure JVM built-ins (whole-stage codegen; zero Python) so they run at
scan speed over a 100 TB documents table:

- token counting (whitespace tokenization + a BPE-ish subword estimate)
- quality scoring (length / punctuation / stopword / word-length signals,
  in the spirit of C4/Gopher text-quality rules)
- language ID (stopword-marker n-gram heuristic over en/de/fr)
- document fingerprinting (md5 content key; SimHash lives in operators.dedup)

Each has a deliberately SQL-expressible definition so DuckDB oracles can
replay it exactly (the driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed marker lexicons (deterministic; mirror classic stopword-based langid)
EN_MARKERS = ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"]
DE_MARKERS = ["der", "die", "das", "und", "ist", "nicht", "eine", "mit", "von", "für"]
FR_MARKERS = ["le", "la", "les", "et", "est", "pas", "une", "avec", "dans", "pour"]

PUNCT_CLASS = "[.,!?;:'\"()\\-]"


def norm_tokens(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def subword_count_est(text: Column) -> Column:
    """BPE-ish token estimate: word-chunks of <=4 chars + punctuation marks.

    ceil(len(word)/4) summed over words, plus punctuation count — a standard
    cheap proxy for BPE token counts, exactly reproducible in SQL.
    """
    words = norm_tokens(text)
    word_pieces = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    puncts = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return word_pieces + puncts


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(lit_arr, t)))


def stopword_ratio(text: Column, markers: list[str] | None = None) -> Column:
    toks = norm_tokens(text)
    n = F.size(toks)
    hits = _marker_hits(toks, markers or EN_MARKERS)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = norm_tokens(text)
    n = F.size(toks)
    total = F.aggregate(
        F.transform(toks, lambda w: F.length(w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: rewards mid-range length, some stopwords,
    sane word lengths; penalizes punctuation soup. C4/Gopher-flavored,
    deterministic, SQL-replayable."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    mwl = mean_word_len(text)
    wordlen_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.least(punct_ratio(text) * F.lit(2.0), F.lit(0.5))
    return F.round(
        (len_score * 0.4 + stop_score * 0.3 + wordlen_score * 0.3) - punct_pen, 6
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = norm_tokens(text)
    return {
        "en": _marker_hits(toks, EN_MARKERS),
        "de": _marker_hits(toks, DE_MARKERS),
        "fr": _marker_hits(toks, FR_MARKERS),
    }


def lang_id(text: Column) -> Column:
    """argmax of marker hits; ties broken en > de > fr; 'und' when no hits."""
    s = lang_scores(text)
    best = F.greatest(s["en"], s["de"], s["fr"])
    return (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Exact content fingerprint: md5 of normalized text (SURVEY A2 analogue:
    the reference's product_hash is sha256 of concatenated fields,
    RDS/app.py:459-460)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


# PII patterns: deliberately backref/lookaround-free so Java regex (Spark)
# and RE2 (DuckDB oracle, and most scale-out regex engines) agree exactly
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_scrub(text: Column) -> Column:
    """Redact emails / SSNs / phone numbers / IPv4 literals with typed
    placeholder tokens — pure JVM regexp_replace chain (scan-speed over
    100 TB; order matters: email first so its digits can't be phone-matched,
    SSN before the looser phone shape)."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (JVM regexp_count)."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, (pat, _) in PII_PATTERNS.items()}


BOILERPLATE_LINE_PATTERN = (
    r"^\s*(copyright|all rights reserved|terms of (service|use)|"
    r"privacy policy|cookie policy|subscribe to our newsletter|"
    r"click here|share this (page|article))"
)


def strip_boilerplate(text: Column, pattern: str = BOILERPLATE_LINE_PATTERN) -> Column:
    """Drop boilerplate LINES (copyright footers, nav/share chrome) from a
    document, keeping content lines verbatim. Matching is on the lowercased
    line against ``pattern`` (anchored at line start). Uses an array
    higher-order filter — interpreted, not codegen'd; kept as the reference
    implementation and for pattern styles ``strip_boilerplate_re`` cannot
    express. Hot 100 TB scan paths should use ``strip_boilerplate_re``
    (identical output, whole-stage codegen) — equality is pytest-asserted.
    """
    lines = F.split(text, r"\n")
    kept = F.filter(lines, lambda l: ~F.lower(l).rlike(pattern))
    return F.array_join(kept, "\n")


def strip_boilerplate_re(
    text: Column, pattern: str = BOILERPLATE_LINE_PATTERN
) -> Column:
    """``strip_boilerplate`` as a pure ``regexp_replace`` chain — whole-stage
    codegen (the HOF variant never enters codegen; this is the default for
    full-corpus scans, e.g. jobs/dataset_job.py).

    Two passes reproduce split→filter→join EXACTLY:
      1. remove every matched line TOGETHER WITH its trailing newline;
      2. the only matched line left is a final line with no trailing
         newline — remove it together with the newline BEFORE it (so
         "keep\\ndrop" → "keep", not "keep\\n").
    ``\\s*`` of the line-anchored pattern is rewritten to horizontal
    whitespace ``[ \\t]*``: in (?m) mode a bare ``\\s`` crosses newlines and
    would swallow the blank line above a matched line, which the per-line
    HOF variant keeps.
    """
    line_pat = pattern.replace(r"^\s*", r"^[ \t]*")
    return F.regexp_replace(
        F.regexp_replace(text, f"(?im){line_pat}[^\\n]*\\n", ""),
        f"(?im)\\n?{line_pat}[^\\n]*$",
        "",
    )


# ---------------------------------------------------------------- mojibake

# UTF-8 bytes mis-decoded as Latin-1/Windows-1252 — the classic double-
# encoding damage in crawled webtext (ftfy's core table, restricted to
# unambiguous printable multi-char sequences; single chars like a bare 'Ã'
# are left alone because they legitimately occur). Pairs are (damaged,
# repaired); outputs never re-trigger another pattern, so the replace
# chain is order-independent.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("Ã©", "é"), ("Ã¨", "è"), ("Ã¼", "ü"), ("Ã¶", "ö"), ("Ã¤", "ä"),
    ("Ã±", "ñ"), ("Ã³", "ó"), ("Ã§", "ç"), ("Ã¯", "ï"),
    ("â€™", "’"), ("â€œ", "“"), ("â€“", "–"), ("â€”", "—"), ("â€¦", "…"),
    ("Â«", "«"), ("Â»", "»"),
]

# third chars after 'â€' are the cp1252 renderings of bytes 0x99/0x9C/
# 0x93/0x94/0xA6 (™ œ “ ” ¦) — tested against encode/decode round-trips
MOJIBAKE_MARKER_RE = "(Ã[©¨¼¶¤±³§¯]|â€[™œ“”¦]|Â[«»])"


def fix_mojibake(text: Column) -> Column:
    """Repair common UTF-8-as-Latin-1 mojibake sequences.

    A literal-replace chain over MOJIBAKE_MAP — pure JVM (whole-stage
    codegen), scan-speed at 100 TB like the PII scrub. The reference
    pipeline inherits whatever bytes the browser rendered
    (``/root/reference/app.py:497-516``) and never repairs encoding
    damage; Common-Crawl-scale corpora carry it in a few percent of
    pages, and it poisons both dedup keys (damaged and clean variants of
    the same page hash apart) and char-level quality stats.
    """
    out = text
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def has_mojibake(text: Column) -> Column:
    """Cheap detector twin of :func:`fix_mojibake` (same sequence family)."""
    return text.rlike(MOJIBAKE_MARKER_RE)


# HTML charset declaration patterns, tried in spec-priority order: the
# HTML5 meta charset (WHATWG §4.2.5.4; both quote styles and unquoted),
# the legacy http-equiv Content-Type form's charset= parameter (same
# regex — it matches `charset=` wherever it appears inside a <meta> tag),
# then an XML declaration's encoding pseudo-attribute.
_META_CHARSET_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)"""
_XML_ENCODING_RE = r"""(?i)<\?xml[^>]*encoding\s*=\s*["']([A-Za-z0-9_.:\-]+)["']"""

# Label aliases per the WHATWG Encoding Standard's label table (the subset
# that appears in real crawls; unknown labels pass through lowercased so
# the downstream decoder — the declared injection point — decides).
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",  # WHATWG: ISO-8859-1 decodes as cp1252
    "iso8859-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "cp1252": "windows-1252",
    "win-1252": "windows-1252",
    "unicode-1-1-utf-8": "utf-8",
}


def sniff_charset(html: Column, default: str = "utf-8") -> Column:
    """Declared character set of an HTML/XML document — the pre-decode step
    of the extraction pipeline (a crawl that decodes everything as UTF-8
    manufactures the mojibake ``fix_mojibake`` then has to repair; sniffing
    first fixes it at the source). Returns a lowercased, WHATWG-aliased
    label (``latin1``/``iso-8859-1``/``ascii`` → ``windows-1252`` per the
    Encoding Standard, the browser behavior real pages depend on);
    ``default`` when nothing is declared.

    Pure JVM ``regexp_extract`` chain + one literal CASE ladder — scan
    speed, zero Python, zero shuffle; runs in the fetch projection next to
    the extraction UDF. BOM bytes outlive HTML-to-text conversion poorly,
    so byte-order marks are the BINARY decoder's concern (multimodal
    ``decode_fn`` seam); this sniffs the DECLARATION, which survives in the
    string column the pages table carries.
    """
    meta = F.regexp_extract(html, _META_CHARSET_RE, 1)
    xml = F.regexp_extract(html, _XML_ENCODING_RE, 1)
    label = F.lower(
        F.when(meta != "", meta).when(xml != "", xml).otherwise(F.lit(default))
    )
    out = label
    for alias, canon in _CHARSET_ALIASES.items():
        out = F.when(label == alias, F.lit(canon)).otherwise(out)
    return out


# Unicode scripts the crawler routes on, in dominance tie-break priority
# order. Java regex spells the script property \p{IsXxx}; the WHATWG-lang
# routing decision downstream (which lang-id model, which tokenizer, which
# CCNet LM) only needs the coarse script class, not full lang-id.
SCRIPTS = ["latin", "cyrillic", "greek", "han"]
_SCRIPT_RE = {
    "latin": r"\p{IsLatin}",
    "cyrillic": r"\p{IsCyrillic}",
    "greek": r"\p{IsGreek}",
    "han": r"\p{IsHan}",
}


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script letter counts plus ``letters`` (total ``\\p{L}``) —
    the routing signal for multilingual corpora: which lang-id model /
    tokenizer / per-language CCNet LM a document should flow to, and the
    mixed-script spam signal (Cyrillic lookalikes inside Latin words is a
    classic cloaking trick). One ``regexp_count`` per script — JVM-side
    regex over the page scan, whole-stage codegen, zero shuffle, zero
    Python; counts are integers so the oracle twin is value-exact."""
    out = {k: F.regexp_count(text, F.lit(v)) for k, v in _SCRIPT_RE.items()}
    out["letters"] = F.regexp_count(text, F.lit(r"\p{L}"))
    return out


def dominant_script(text: Column) -> Column:
    """Name of the script with the strictly greatest letter count —
    earlier entries of :data:`SCRIPTS` win ties (deterministic, and Latin
    first matches the web's base-rate prior); ``'unknown'`` when the
    document has no letters in any tracked script."""
    counts = script_counts(text)
    expr = F.lit("unknown")
    for name in reversed(SCRIPTS):
        cond = F.lit(True)
        for other in SCRIPTS:
            if SCRIPTS.index(other) < SCRIPTS.index(name):
                cond = cond & (counts[name] > counts[other])
            elif other != name:
                cond = cond & (counts[name] >= counts[other])
        expr = F.when((counts[name] > 0) & cond, F.lit(name)).otherwise(expr)
    return expr
