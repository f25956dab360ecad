"""Seventh-wave catalog queries (round 4, continued): archive-product
and link-graph derivations layered on the WARC source and the parse
pipeline.

Every query synthesizes its input deterministically from the driver
tables (no external data) and carries a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _t

# ---------------------------------------------------------------------------
# WAT derivation (sources/warc.warc_to_wat): WARC response records →
# per-record JSON metadata (the third Common Crawl derivative next to
# WET and CDX). The synthesized html is built by construction — title,
# meta description, and doc_id%4 body anchors are all arithmetic in
# doc_id — so DuckDB re-derives every extracted field from first
# principles while Spark must round-trip the page through WARC framing,
# the real structural parse, to_json, and from_json to reproduce them.
# ---------------------------------------------------------------------------

_WAT_MICROS = "1704067200000000 + doc_id * 1000000"

_WAT_ORACLE = f"""
WITH pages AS (
  SELECT doc_id,
         'https://wat' || (doc_id % 13) || '.example.com/p/' || doc_id AS url,
         make_timestamp({_WAT_MICROS}) AS warc_ts,
         doc_id % 4 AS k
  FROM documents
)
SELECT url,
       strftime(warc_ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts_str,
       'response' AS rec_type,
       CAST(CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS INT) AS status,
       'Page ' || doc_id AS title,
       'Summary ' || (doc_id % 7) AS meta_description,
       CAST(k AS BIGINT) AS n_links,
       CASE k WHEN 0 THEN ''
              WHEN 1 THEN '/p/' || doc_id || '-0'
              WHEN 2 THEN '/p/' || doc_id || '-0|/p/' || doc_id || '-1'
              ELSE '/p/' || doc_id || '-0|/p/' || doc_id || '-1|/p/'
                   || doc_id || '-2' END AS hrefs,
       CASE k WHEN 0 THEN '' WHEN 1 THEN 'go 0' WHEN 2 THEN 'go 0|go 1'
              ELSE 'go 0|go 1|go 2' END AS anchors,
       CASE k WHEN 0 THEN '' WHEN 1 THEN 'body' WHEN 2 THEN 'body|body'
              ELSE 'body|body|body' END AS slots
FROM pages ORDER BY url
"""

_WAT_ANCHOR_SQL = (
    "CASE WHEN doc_id % 4 > {i} THEN"
    " '<a href=\"/p/' || CAST(doc_id AS STRING) || '-{i}\">go {i}</a>'"
    " ELSE '' END"
)

_WAT_HTML_SQL = (
    "'<html><head><title>Page ' || CAST(doc_id AS STRING) || '</title>"
    '<meta name="description" content="Summary \' || CAST(doc_id % 7 AS STRING)'
    " || '\"></head><body>' || "
    + " || ".join(_WAT_ANCHOR_SQL.format(i=i) for i in range(3))
    + " || '</body></html>'"
)


@_register("warc_wat_extract", oracle=_WAT_ORACLE)
def q_warc_wat_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WAT product, end to end: synthesized pages → WARC
    files (per-record gzip) → read back → warc_to_wat JSON metadata →
    from_json(WAT_SCHEMA) → scalar fields. Unlike WET, non-200 records
    keep their metadata. The oracle predicts every field by
    construction, so WARC framing, the structural parse (title / meta
    description / anchor slots+texts), and the JSON round-trip must
    compose to an exact identity."""
    import shutil
    import tempfile

    from crawler_ai_spark.sources.warc import (
        WAT_SCHEMA,
        read_warc,
        warc_to_wat,
        write_warc,
    )

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.expr(
            "'https://wat' || CAST(doc_id % 13 AS STRING) || '.example.com/p/'"
            " || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(f"timestamp_micros({_WAT_MICROS})").alias("warc_ts"),
        F.expr(f"CAST(({_WAT_HTML_SQL}) AS BINARY)").alias("html"),
        F.expr("CAST(CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS INT)").alias(
            "status"
        ),
    )
    out = tempfile.mkdtemp(prefix="warc_wat_")
    try:
        write_warc(pages.repartition(8, "url"), out, gzip_records=True).collect()
        wat = warc_to_wat(read_warc(spark, out))
        w = F.from_json(F.col("wat_json"), WAT_SCHEMA)["envelope"]
        meta = w["payload"]["html_meta"]
        result = wat.select(
            "url",
            w["warc_header"]["date"].alias("ts_str"),
            w["warc_header"]["type"].alias("rec_type"),
            w["payload"]["status"].alias("status"),
            meta["title"].alias("title"),
            meta["meta_description"].alias("meta_description"),
            F.size(meta["links"]).cast("long").alias("n_links"),
            F.array_join(
                F.transform(meta["links"], lambda l: l["href"]), "|"
            ).alias("hrefs"),
            F.array_join(
                F.transform(meta["links"], lambda l: l["text"]), "|"
            ).alias("anchors"),
            F.array_join(
                F.transform(meta["links"], lambda l: l["slot"]), "|"
            ).alias("slots"),
        ).orderBy("url")
        # materialize before the WARC dir is deleted (warc_wet_extract
        # pattern) — lazily reading a removed tmpdir would leak it instead
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
