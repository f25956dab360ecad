"""Block-level main-content extraction (boilerplate removal).

The reference takes page text wholesale — ``soup.get_text()`` at
job_extraction_service.py:744-745 — so navigation chrome, tag clouds
and footer links all land in the extracted text. This module
generalizes that step with the published text-to-link-density block
heuristic (jusText, Pomikálek 2011; Boilerpipe, Kohlschütter et al.
WSDM 2010): segment the page into blocks at block-level tag
boundaries, score each block by character count and anchor-text share,
and keep only blocks that are long enough AND link-sparse. At web
scale this is the difference between a corpus of prose and a corpus
that is one-third repeated menus.

Everything is a pure-JVM expression pipeline (split / transform /
filter / aggregate over arrays) — zero shuffle, zero Python in the hot
path; the per-document block array never leaves the row.

Density rule (integer math, so both engines agree bit-for-bit):
    content := chars >= min_chars AND link_chars * 3 <= chars
i.e. a block is boilerplate if it is short or if more than one third
of its visible characters sit inside <a> anchors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level elements end/begin a text block (jusText's segmentation
# grain). Inline tags (<a>, <b>, <span>, ...) stay inside their block.
BLOCK_SPLIT_RX = (
    r"</?(?:p|div|h[1-6]|li|td|th|blockquote|section|article|aside|nav|"
    r"header|footer|ul|ol|table|tr|br)\b[^>]*>"
)
# Anchor inner text: [^<]* (not lazy .*?) — identical semantics in Java
# regex and RE2, so the DuckDB oracle can run the very same pattern.
ANCHOR_TEXT_RX = r"<a\s[^>]*>([^<]*)</a>"
TAG_RX = r"<[^>]*>"
WS_RX = r"\s+"

DEFAULT_MIN_CHARS = 25


def _norm_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(c, TAG_RX, ""), WS_RX, " "))


def block_structs(html: Column) -> Column:
    """html → array<struct<text,chars,link_chars>> of non-empty blocks,
    in document order. Row-local; no shuffle."""
    blocks = F.split(html, BLOCK_SPLIT_RX)

    def per_block(b: Column) -> Column:
        text = _norm_text(b)
        link_chars = F.aggregate(
            F.transform(
                F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RX), F.lit(1)),
                lambda t: F.length(F.trim(F.regexp_replace(t, WS_RX, " "))),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return F.struct(
            text.alias("text"),
            F.length(text).alias("chars"),
            link_chars.alias("link_chars"),
        )

    return F.filter(F.transform(blocks, per_block), lambda s: s["chars"] > 0)


def with_main_content(
    df: DataFrame,
    html_col: str = "html",
    min_chars: int = DEFAULT_MIN_CHARS,
    out_col: str = "main_text",
) -> DataFrame:
    """Adds block-classification columns:

    - ``main_text``   — content blocks joined by newline, document order
    - ``n_blocks``    — non-empty blocks seen
    - ``n_content``   — blocks classified content
    - ``content_chars`` / ``boiler_chars`` — character mass per class

    All map-side; a 100 TB corpus pays scan cost only.
    """
    scored = F.transform(
        block_structs(F.col(html_col)),
        lambda s: F.struct(
            s["text"].alias("text"),
            s["chars"].alias("chars"),
            (
                (s["chars"] >= F.lit(min_chars))
                & (s["link_chars"] * 3 <= s["chars"])
            ).alias("is_content"),
        ),
    )
    df = df.withColumn("_mc_blocks", scored)
    content = F.filter(F.col("_mc_blocks"), lambda s: s["is_content"])
    return (
        df.withColumn(
            "n_blocks", F.size("_mc_blocks").cast("long")
        )
        .withColumn("n_content", F.size(content).cast("long"))
        .withColumn(
            "content_chars",
            F.aggregate(
                content, F.lit(0), lambda acc, s: acc + s["chars"]
            ).cast("long"),
        )
        .withColumn(
            "boiler_chars",
            F.aggregate(
                F.filter(F.col("_mc_blocks"), lambda s: ~s["is_content"]),
                F.lit(0),
                lambda acc, s: acc + s["chars"],
            ).cast("long"),
        )
        .withColumn(
            out_col,
            F.array_join(F.transform(content, lambda s: s["text"]), "\n"),
        )
        .drop("_mc_blocks")
    )
