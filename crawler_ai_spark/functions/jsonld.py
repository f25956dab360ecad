"""JSON-LD structured-data extraction — schema.org blocks embedded in
<script type="application/ld+json"> tags. Job boards publish JobPosting
records this way (Google Jobs requires it), so at web scale this is the
HIGHEST-precision job-field source a crawler has: typed fields straight
from the publisher instead of regex over rendered HTML (generalizes the
reference's embedded-JSON source, reference crawler.py script-JSON
handling, the same way S7 did).

Block extraction is a JVM regexp; parsing is F.from_json (Jackson,
JVM-side, whole-stage codegen) — no Python in the path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_JSONLD_BLOCK_RX = (
    r"(?is)<script\b[^>]*\btype\s*=\s*[\"']?application/ld\+json[\"']?"
    r"[^>]*>(.*?)</script>"
)

# the schema.org JobPosting fields the reference's job extractor maps
# (title/company/location/date/type) — extend as needed; from_json
# ignores JSON fields absent from the schema
JOBPOSTING_SCHEMA = StructType(
    [
        StructField("@type", StringType()),
        StructField("title", StringType()),
        StructField("datePosted", StringType()),
        StructField("employmentType", StringType()),
        StructField(
            "hiringOrganization",
            StructType([StructField("name", StringType())]),
        ),
        StructField(
            "jobLocation",
            StructType(
                [
                    StructField(
                        "address",
                        StructType([StructField("addressLocality", StringType())]),
                    )
                ]
            ),
        ),
    ]
)


def jsonld_blocks(html: Column) -> Column:
    """array<string> of every raw JSON-LD script payload in the page,
    document order, trimmed; empty array when none."""
    raw = F.regexp_extract_all(
        F.coalesce(html, F.lit("")), F.lit(_JSONLD_BLOCK_RX), F.lit(1)
    )
    # regexp trim: Spark's trim() strips only 0x20, not \n\t inside the
    # pretty-printed blocks publishers emit
    return F.transform(
        raw, lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")
    )


def jobposting_from_block(block: Column) -> Column:
    """Parse one JSON-LD payload as a schema.org JobPosting struct;
    non-JSON or non-matching payloads parse to NULL fields (from_json
    is permissive) — filter on ``@type = 'JobPosting'``."""
    return F.from_json(block, JOBPOSTING_SCHEMA)
