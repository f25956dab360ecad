"""HTML table extraction (functions/tables.py)."""

from crawler_ai_spark.functions import tables as TB


def _cells(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return [
        (r.table_idx, r.row_idx, r.col_idx, r.cell, r.is_header)
        for r in TB.extract_tables(df)
        .orderBy("table_idx", "row_idx", "col_idx")
        .collect()
    ]


def test_cells_headers_and_markup_stripping(spark):
    html = (
        "<body><table><tr><th>H1</th><th>H2</th></tr>"
        '<tr><td class="a"><b>bold</b>  text</td><td>plain</td></tr></table>'
        "<table><TR><TD>second</TD></TR></table></body>"
    )
    assert _cells(spark, html) == [
        (0, 0, 0, "H1", True),
        (0, 0, 1, "H2", True),
        (0, 1, 0, "bold text", False),
        (0, 1, 1, "plain", False),
        (1, 0, 0, "second", False),
    ]


def test_no_table_and_binary_input(spark):
    assert _cells(spark, "<body><p>no tables</p></body>") == []
    df = spark.createDataFrame(
        [(1, b"<table><tr><td>bin</td></tr></table>")], "doc_id long, html binary"
    )
    rows = TB.extract_tables(df).collect()
    assert [(r.cell, r.is_header) for r in rows] == [("bin", False)]
