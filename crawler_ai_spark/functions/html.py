"""The parse_page pandas UDF — the engine's single structural-HTML hot path.

Everything that genuinely needs a DOM scan (canonical text, title, meta
description, heading cascade, link extraction with nav/footer slots, footer
text/tel scoping, embedded <script> bodies) happens in ONE Arrow-batched
pandas UDF per page, wrapping the pure-Python scanner in
``functions/textnorm.py``. Every other extraction (emails, phones, job
fields, scores, filters) runs on the UDF's *outputs* as built-in JVM
expressions — per SURVEY.md §2.10 the reference's per-row Python collapses
to exactly this one structural UDF plus built-ins.

Scale notes:
- Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch) keep the
  Python boundary amortized; the scanner is a single pass per document.
- out_links come back as parallel arrays (hrefs/slots/texts) to stay on the
  fast Arrow list<string> path; ``explode_links`` zips them JVM-side.
- Call parse_page AFTER all frontier filters so Catalyst never parses a page
  the crawl discards (the plan-shape rule of SURVEY.md §4: filters first,
  UDF last — Catalyst can't push predicates through an opaque UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from crawler_ai_spark.functions import textnorm

PARSE_SCHEMA = StructType(
    [
        StructField("text", StringType()),             # P2 canonical text (byte-parity column)
        StructField("title", StringType()),            # <title> (crawler.py:336-338)
        StructField("meta_description", StringType()),
        StructField("heading_title", StringType()),    # h1/h2 cascade (job_extraction_service.py:1696-1720)
        StructField("description", StringType()),      # meta/paragraph cascade (crawler.py:340-384)
        StructField("link_hrefs", ArrayType(StringType())),
        StructField("link_slots", ArrayType(StringType())),   # nav | footer | body
        StructField("link_texts", ArrayType(StringType())),
        StructField("footer_text", StringType()),      # normalized footer text (contact_footer.py:60)
        StructField("footer_tel_hrefs", ArrayType(StringType())),
        StructField("footer_phones", ArrayType(StringType())),  # contact_footer.py:47-83 pipeline
        StructField("footer_emails", ArrayType(StringType())),
        StructField("script_texts", ArrayType(StringType())),  # S7 embedded-JSON source
    ]
)


def _parse_one(html_bytes) -> dict:
    if html_bytes is None:
        # unfetched page (fetch-error row or no pages row): no response ⇒
        # NULL text, so the byte-identical-text invariant (parse.text ≡
        # fixture text) holds null-safely; every other field parses-empty
        out = _EMPTY_PARSE.copy()
        out["text"] = None
        return out
    if isinstance(html_bytes, (bytes, bytearray)):
        # safe_decode — app/utils/text.py:33-37 (utf-8, errors ignored)
        html = bytes(html_bytes).decode("utf-8", errors="ignore")
    else:
        html = str(html_bytes)
    p = textnorm.scan_html(html)
    phones, emails = textnorm.footer_contacts(p)
    return {
        "text": textnorm.canonical_text(html),
        "title": p.title,
        "meta_description": p.meta_description,
        "heading_title": textnorm.pick_title_from_headings(p),
        "description": textnorm.page_description(p),
        "link_hrefs": [h for h, _, _ in p.out_links],
        "link_slots": [s for _, s, _ in p.out_links],
        "link_texts": [t for _, _, t in p.out_links],
        "footer_text": textnorm.normalize_unicode_ws(p.footer_text),
        "footer_tel_hrefs": p.footer_tel_hrefs,
        "footer_phones": phones,
        "footer_emails": emails,
        "script_texts": p.script_texts,
    }


_EMPTY_PARSE = {
    "text": "",
    "title": "",
    "meta_description": "",
    "heading_title": "",
    "description": "",
    "link_hrefs": [],
    "link_slots": [],
    "link_texts": [],
    "footer_text": "",
    "footer_tel_hrefs": [],
    "footer_phones": [],
    "footer_emails": [],
    "script_texts": [],
}


@pandas_udf(PARSE_SCHEMA)
def parse_page(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched structural parse of the ``html`` binary column."""
    rows = [_parse_one(h) for h in html]
    return pd.DataFrame(rows, columns=[f.name for f in PARSE_SCHEMA.fields])


def with_parse(df: DataFrame, html_col: str = "html", out: str = "parse") -> DataFrame:
    """Attach the parse struct. Filters that only need URL columns must be
    applied BEFORE this call (see module docstring)."""
    return df.withColumn(out, parse_page(F.col(html_col)))


def explode_links(df: DataFrame, parse_col: str = "parse") -> DataFrame:
    """parse struct → one row per out-link with document position.

    Columns added: link_pos (0-based document order), href, slot, anchor_text.
    JVM-side: arrays_zip + posexplode; no Python."""
    p = F.col(parse_col)
    zipped = F.arrays_zip(
        p["link_hrefs"].alias("href"),
        p["link_slots"].alias("slot"),
        p["link_texts"].alias("anchor_text"),
    )
    return (
        df.select("*", F.posexplode_outer(zipped).alias("link_pos", "_link"))
        .withColumn("href", F.col("_link.href"))
        .withColumn("slot", F.col("_link.slot"))
        .withColumn("anchor_text", F.col("_link.anchor_text"))
        .drop("_link")
    )


def decoded_html(html_col: Column) -> Column:
    """Raw HTML bytes → string, JVM-side (career scoring & email extraction
    operate on the raw markup string, crawler.py:292-327 /
    scrapy_career_spider.py:501-503)."""
    return F.decode(html_col, "UTF-8")
