"""Content-type sniffing (WHATWG MIME Sniffing Standard, §6-7) over the
raw response bytes — the router that decides which pipeline a fetched
body enters: HTML → the parse/extract path, image/audio/video → the
multimodal passes (pipeline/multimodal.py), archives/PDF → skip.

Server Content-Type headers lie constantly at web scale (the standard
exists because of that), so the router keys on the BYTES. Bodies use the
repo's lossless latin-1 string view (byte 0xNN ≡ codepoint U+00NN, the
same convention functions/charset.py established), which keeps every
test pure-JVM and oracle-expressible.

Pattern subset implemented (the spec's tables 5.1/6.1/6.2, minus types
whose codecs this repo doesn't model): HTML tag patterns, XML, PDF,
PNG/GIF/BMP/JPEG, RIFF-WAVE, MP4 ftyp, gzip, zip; the fallback applies
the spec's binary-data-byte test (0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F)
to pick text/plain vs application/octet-stream."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# WHATWG §7.1: HTML tag patterns, matched case-insensitively after
# leading HTML whitespace, each terminated by space or '>'
HTML_TAGS = (
    "!DOCTYPE HTML", "HTML", "HEAD", "SCRIPT", "IFRAME", "H1", "DIV",
    "FONT", "TABLE", "A", "STYLE", "TITLE", "B", "BODY", "BR", "P",
    "!--",
)

# binary data bytes (WHATWG §3): anything in these ranges marks a binary
# body for the text/plain fallback
BINARY_BYTE_RX = (
    "[\\x00-\\x08\\x0b\\x0e-\\x1a\\x1c-\\x1f]"
)


def _tag_rx() -> str:
    tags = "|".join(t.replace("!--", "!\\-\\-") for t in HTML_TAGS)
    # leading HTML whitespace (tab/LF/FF/CR/space), '<', a tag, then a
    # space or '>' terminator (the spec's "tag-terminating byte")
    return f"(?is)^[\\t\\n\\x0c\\r ]*<(?:{tags})[ >]"


TAG_RX = _tag_rx()


def sniff_mime(body: Column) -> Column:
    """Computed MIME type of a body's latin-1 string view. NULL body →
    NULL (a failed fetch routes nowhere)."""
    b = body
    return (
        F.when(b.isNull(), F.lit(None).cast("string"))
        # exact-prefix magic first (spec §6.1 table order)
        .when(b.startswith("%PDF-"), F.lit("application/pdf"))
        .when(b.startswith("GIF87a") | b.startswith("GIF89a"), F.lit("image/gif"))
        .when(
            b.startswith("\x89PNG\r\n\x1a\n"), F.lit("image/png")
        )
        .when(b.startswith("\xff\xd8\xff"), F.lit("image/jpeg"))
        .when(b.startswith("BM"), F.lit("image/bmp"))
        .when(
            b.startswith("RIFF") & (F.substring(b, 9, 4) == "WAVE"),
            F.lit("audio/wav"),
        )
        # MP4 needs more than 'ftyp' at offset 4 — the spec's rule also
        # validates the leading 4-byte box size (>= 12), else any text
        # with 'ftyp' at positions 5-8 would route to the video pipeline.
        # Requiring the first three size bytes to be 0x00 accepts every
        # real ftyp box (< 16 MB, invariably < 256 B) and rejects text.
        .when(
            (F.substring(b, 5, 4) == "ftyp")
            & b.rlike("^\x00\x00\x00[\x0c-\xff]"),
            F.lit("video/mp4"),
        )
        .when(b.startswith("\x1f\x8b"), F.lit("application/gzip"))
        .when(b.startswith("PK\x03\x04"), F.lit("application/zip"))
        # tag patterns after the magics (a PNG can't be HTML, but HTML
        # often has leading whitespace the magics never do)
        .when(b.rlike(TAG_RX), F.lit("text/html"))
        .when(
            F.regexp_replace(b, "^[\\t\\n\\x0c\\r ]*", "").startswith("<?xml"),
            F.lit("text/xml"),
        )
        .when(b.rlike(BINARY_BYTE_RX), F.lit("application/octet-stream"))
        .otherwise(F.lit("text/plain"))
    )


def route_for(mime: Column) -> Column:
    """Pipeline route per sniffed type: the parse/extract path for HTML
    and XML (sitemaps), the multimodal decode passes per media kind,
    'skip' for everything the engine stores but does not process."""
    return (
        F.when(mime.isNull(), F.lit("none"))
        .when(mime.isin("text/html", "text/xml"), F.lit("parse"))
        .when(mime.startswith("image/"), F.lit("image"))
        .when(mime.startswith("audio/"), F.lit("audio"))
        .when(mime.startswith("video/"), F.lit("video"))
        .when(mime == "text/plain", F.lit("text"))
        .otherwise(F.lit("skip"))
    )
