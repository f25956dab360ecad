"""Main-content extraction (functions/maincontent.py): block
segmentation + length/link-density classification, hand-checked."""

import pyspark.sql.functions as F  # noqa: F401

from crawler_ai_spark.functions.maincontent import with_main_content

HTML = (
    '<div><a href="/">Home</a> <a href="/jobs">Jobs</a></div>'
    "<h1>Short title</h1>"
    "<p>This paragraph is long enough to clear the minimum character "
    "threshold and contains no anchors at all, so it is content.</p>"
    '<p>Prose with <a href="/x">a small link</a> embedded keeps its link '
    "density far below one third of the visible characters here.</p>"
    '<div>(c) 2026 Corp <a href="/privacy">Privacy policy</a> '
    '<a href="/terms">Terms of service</a></div>'
    "<li><a href=\"/t/1\">tag</a></li>"
)


def test_block_classification(spark):
    df = spark.createDataFrame([(1, HTML)], "id LONG, html STRING")
    row = with_main_content(df, "html").collect()[0]
    # blocks: nav, h1, p1, p2, footer, li → 6 non-empty
    assert row.n_blocks == 6
    # content: the two paragraphs only
    assert row.n_content == 2
    parts = row.main_text.split("\n")
    assert len(parts) == 2
    assert parts[0].startswith("This paragraph is long enough")
    assert parts[1].startswith("Prose with a small link")
    assert row.content_chars == sum(len(p) for p in parts)
    # nav (short+dense), h1 (short), footer (long but >1/3 anchor text),
    # li (short) are all boilerplate
    assert row.boiler_chars > 0


def test_footer_fails_density_not_length(spark):
    # footer text is >= 25 chars, so only the density half of the AND
    # can reject it — pin that the gate actually fires
    footer = (
        '<div>(c) 2026 Corp <a href="/privacy">Privacy policy</a> '
        '<a href="/terms">Terms of service</a></div>'
    )
    df = spark.createDataFrame([(1, footer)], "id LONG, html STRING")
    row = with_main_content(df, "html").collect()[0]
    assert row.n_blocks == 1 and row.n_content == 0
    assert row.boiler_chars >= 25


def test_empty_and_tag_only_pages(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "<div></div><p>  </p>"), (3, None)],
        "id LONG, html STRING",
    )
    rows = {r.id: r for r in with_main_content(df, "html").collect()}
    assert rows[1].n_blocks == 0 and rows[1].main_text == ""
    assert rows[2].n_blocks == 0 and rows[2].main_text == ""
    assert rows[3].n_blocks is None and rows[3].main_text is None
