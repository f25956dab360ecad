"""Charset sniffing over raw response bytes — the decode step the
fetch stage's utf-8 → latin-1 ladder (sources/fetch.py:292-295,
reference crawler.py:252-262) guesses blind. Precedence follows the
WHATWG encoding-sniffing order a browser applies:

  1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE),
  2. ``charset=`` parameter of the Content-Type header,
  3. ``<meta charset=…>`` / ``<meta http-equiv=content-type …>`` inside
     the first SNIFF_BYTES of the body,
  4. heuristic: body is well-formed UTF-8 → utf-8, else windows-1252
     (the WHATWG fallback superset of latin-1).

Everything is whole-stage-codegen JVM expressions over the LOSSLESS
latin-1 view of the bytes (``decode(body, 'ISO-8859-1')`` maps byte
0xNN to codepoint U+00NN, so byte patterns become ``\\xNN`` regex
classes — including the UTF-8 well-formedness grammar in step 4). No
Python, no UDF; at 100 TB this is a map-side projection on the fetch
output, pruned to the sniff window before any regex runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SNIFF_BYTES = 1024  # WHATWG prescan window for <meta> declarations

# UTF-8 well-formedness over the latin-1 byte view (RFC 3629 grammar).
# Works verbatim in Java regex (Spark) and RE2 (DuckDB): both treat
# \xNN as the U+00NN codepoint, which IS byte NN under latin-1.
UTF8_GRAMMAR = (
    "^(?:[\\x00-\\x7F]"
    "|[\\xC2-\\xDF][\\x80-\\xBF]"
    "|\\xE0[\\xA0-\\xBF][\\x80-\\xBF]"
    "|[\\xE1-\\xEC\\xEE\\xEF][\\x80-\\xBF][\\x80-\\xBF]"
    "|\\xED[\\x80-\\x9F][\\x80-\\xBF]"
    "|\\xF0[\\x90-\\xBF][\\x80-\\xBF][\\x80-\\xBF]"
    "|[\\xF1-\\xF3][\\x80-\\xBF][\\x80-\\xBF][\\x80-\\xBF]"
    "|\\xF4[\\x80-\\x8F][\\x80-\\xBF][\\x80-\\xBF]"
    ")*$"
)

# charset token: the label after `charset=`, optionally quoted.
# \x22/\x27 instead of literal quotes so the SAME pattern string embeds
# into the DuckDB oracle's SQL literal unescaped (Java regex and RE2
# both take \xNN).
HDR_CHARSET_RE = r"(?i)charset\s*=\s*[\x22\x27]?([a-zA-Z0-9_][a-zA-Z0-9._\-]*)"
META_CHARSET_RE = r"(?i)<meta[^>]{0,200}?charset\s*=\s*[\x22\x27]?([a-zA-Z0-9_][a-zA-Z0-9._\-]*)"


def _canon_label(c: Column) -> Column:
    """Lowercase + WHATWG label aliases for the handful the web actually
    serves; unknown labels pass through lowered (caller may reject)."""
    low = F.lower(c)
    return (
        F.when(low.isin("utf8", "unicode-1-1-utf-8"), "utf-8")
        .when(low.isin("latin1", "latin-1", "iso8859-1", "iso_8859-1", "l1", "cp819"), "iso-8859-1")
        .when(low.isin("cp1252", "x-cp1252", "ansi_x3.4-1968", "ascii", "us-ascii"), "windows-1252")
        .when(low.isin("shift-jis", "sjis", "x-sjis"), "shift_jis")
        .otherwise(low)
    )


def sniff_charset(latin1_body: Column, content_type: Column) -> Column:
    """Declared-or-sniffed charset label (lowercase) for a response.

    ``latin1_body`` is the lossless byte view — ``F.decode(body,
    'ISO-8859-1')`` for a BinaryType column (see :func:`sniff_charset_bytes`).
    ``content_type`` is the raw Content-Type header value ('' / NULL ok).
    """
    head = F.substring(latin1_body, 1, SNIFF_BYTES)
    bom = (
        # latin-1 view of EF BB BF / FF FE / FE FF
        F.when(head.startswith("ï»¿"), "utf-8")
        .when(head.startswith("ÿþ"), "utf-16le")
        .when(head.startswith("þÿ"), "utf-16be")
    )
    hdr = F.regexp_extract(F.coalesce(content_type, F.lit("")), HDR_CHARSET_RE, 1)
    meta = F.regexp_extract(head, META_CHARSET_RE, 1)
    heur = F.when(latin1_body.rlike(UTF8_GRAMMAR), "utf-8").otherwise("windows-1252")
    return F.coalesce(
        bom,
        _canon_label(F.nullif(hdr, F.lit(""))),
        _canon_label(F.nullif(meta, F.lit(""))),
        heur,
    ).alias("charset")


def sniff_charset_bytes(body: Column, content_type: Column) -> Column:
    """:func:`sniff_charset` over the fetch stage's raw BinaryType body."""
    return sniff_charset(F.decode(body, "ISO-8859-1"), content_type)
