"""Open Graph / Twitter-card extraction (functions/ogmeta.py): attribute
order, quote style, first-tag-wins, binary input decode, absence → ''."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions import ogmeta as OG


def _vals(spark, html: str, **exprs):
    df = spark.createDataFrame([(html,)], ["html"])
    row = df.select(
        *[c.alias(k) for k, c in exprs.items()]
    ).collect()[0]
    return row.asDict()


def test_order_and_quote_variants(spark):
    html = (
        "<html><head>"
        '<meta content="Reversed Desc" property="og:description">'
        "<meta property='og:type' content='article'>"
        '<meta property="og:title" content="The Title">'
        "</head></html>"
    )
    got = _vals(
        spark, html,
        t=OG.og_expr(F.col("html"), "title"),
        d=OG.og_expr(F.col("html"), "description"),
        ty=OG.og_expr(F.col("html"), "type"),
        img=OG.og_expr(F.col("html"), "image"),
    )
    assert got == {"t": "The Title", "d": "Reversed Desc", "ty": "article", "img": ""}


def test_first_tag_wins_and_twitter_name_attr(spark):
    html = (
        '<meta property="og:title" content="First"><meta property="og:title"'
        ' content="Second"><meta name="twitter:card" content="summary">'
    )
    got = _vals(
        spark, html,
        t=OG.og_expr(F.col("html"), "title"),
        c=OG.twitter_expr(F.col("html"), "card"),
    )
    assert got == {"t": "First", "c": "summary"}
    # twitter: tags use name=, og: uses property= — no cross-match
    assert _vals(spark, html, x=OG.og_expr(F.col("html"), "card"))["x"] == ""


def test_with_og_metadata_binary_input(spark):
    html = b'<meta property="og:site_name" content="Example Corp">'
    df = spark.createDataFrame([(html,)], "html binary")
    row = OG.with_og_metadata(df).collect()[0]
    assert row.og_site_name == "Example Corp"
    assert row.og_title == "" and row.twitter_card == ""
