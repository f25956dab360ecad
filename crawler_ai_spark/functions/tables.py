"""HTML <table> extraction to relational cells — structured-data mining
from crawled pages.

The reference mines job fields out of free text and anchor containers
(app/services/job_extraction_service.py); tabular markup is the other
structured surface on the web (salary grids, office lists, spec sheets),
and a corpus engine wants it as rows, not markup. Output grain is one
row per cell: (table_idx, row_idx, col_idx, cell, is_header).

Spark-first: the nested repetition (tables → rows → cells) is pure
JVM — regexp_extract_all + nested transform + two posexplodes. No
Python, no shuffle; the operator is map-side and pipelines into
whatever aggregation follows. Nested tables are out of scope (the
non-greedy table regex stops at the first </table>; documented bound,
same as every regex-grain extractor in functions/)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TABLE_RX = r"(?is)<table\b[^>]*>.*?</table>"
_ROW_RX = r"(?is)<tr\b[^>]*>.*?</tr>"
_CELL_RX = r"(?is)<t[dh]\b[^>]*>.*?</t[dh]>"
_HEADER_RX = r"(?is)^<th"


def _cell_text(cell: Column) -> Column:
    # strip inner markup, collapse whitespace — the P15 normalize shape
    return F.trim(
        F.regexp_replace(F.regexp_replace(cell, r"(?s)<[^>]*>", " "), r"\s+", " ")
    )


def extract_tables(
    df: DataFrame, html_col: str = "html", keep: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """One row per table cell. `html_col` may be BINARY or STRING."""
    from crawler_ai_spark.functions.html import decoded_html

    typ = df.schema[html_col].dataType.typeName()
    html = decoded_html(F.col(html_col)) if typ == "binary" else F.col(html_col)

    tables = F.regexp_extract_all(html, F.lit(_TABLE_RX), 0)
    rows_per_table = F.transform(
        tables, lambda t: F.regexp_extract_all(t, F.lit(_ROW_RX), 0)
    )
    out = (
        df.select(*keep, F.posexplode_outer(rows_per_table).alias("table_idx", "_rows"))
        .select(
            *keep, "table_idx", F.posexplode_outer("_rows").alias("row_idx", "_row")
        )
        .withColumn("_cells", F.regexp_extract_all(F.col("_row"), F.lit(_CELL_RX), 0))
        .select(
            *keep,
            "table_idx",
            "row_idx",
            F.posexplode_outer("_cells").alias("col_idx", "_cell"),
        )
        .where(F.col("_cell").isNotNull())
        .select(
            *keep,
            "table_idx",
            "row_idx",
            "col_idx",
            _cell_text(F.col("_cell")).alias("cell"),
            F.col("_cell").rlike(_HEADER_RX).alias("is_header"),
        )
    )
    return out
