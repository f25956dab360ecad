"""Page-level REP — meta robots / X-Robots-Tag / rel=nofollow edge
semantics pinned at the function level (catalog `page_rep_gate`
oracle-checks the composed gate at 500 rows)."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.pagerep import (
    followable_hrefs,
    meta_robots_expr,
    rel_links_expr,
    x_robots_expr,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("v")).collect()[0].v


def test_meta_robots_variants(spark):
    cases = [
        ('<meta name="robots" content="noindex,nofollow">', (True, True)),
        ("<meta content='NOINDEX' name='robots'>", (True, False)),  # order+case
        ("<META NAME=ROBOTS CONTENT=none>", (True, True)),  # none ≡ both
        ('<meta name="robots" content="all">', (False, False)),
        ('<meta name="viewport" content="noindex">', (False, False)),  # wrong name
        ('<meta name="robots" content="noindexing">', (False, False)),  # token bound
        # multiple tags union (most restrictive wins)
        (
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">',
            (True, True),
        ),
        ("<html>no meta</html>", (False, False)),
        (None, (False, False)),
    ]
    for html, want in cases:
        v = _one(spark, meta_robots_expr(F.col("html")), html=html)
        assert (v.noindex, v.nofollow) == want, html


def test_x_robots_header(spark):
    cases = [
        ("noindex, nofollow", (True, True)),
        ("googlebot: noindex", (True, False)),  # ua-prefixed form
        ("noarchive, nosnippet", (False, False)),
        ("NONE", (True, True)),
        (None, (False, False)),
    ]
    for hdr, want in cases:
        v = _one(spark, x_robots_expr(F.col("h")), h=hdr)
        assert (v.noindex, v.nofollow) == want, hdr


def test_rel_links_and_follow_gate(spark):
    html = (
        '<a href="/keep">a</a>'
        '<a rel="nofollow" href="/drop1">b</a>'
        "<a href='/drop2' rel='ugc external'>c</a>"
        "<a href=/drop3 rel=sponsored>d</a>"
        '<a rel="noopener" href="/keep2">e</a>'
        "<a name=anchor>no href</a>"
    )
    links = _one(spark, rel_links_expr(F.col("html")), html=html)
    assert [(l.href, l.nofollow) for l in links] == [
        ("/keep", False),
        ("/drop1", True),
        ("/drop2", True),
        ("/drop3", True),
        ("/keep2", False),
    ]
    assert _one(spark, followable_hrefs(F.col("html")), html=html) == [
        "/keep",
        "/keep2",
    ]
    # page-level nofollow (either channel) empties the set
    nf = '<meta name="robots" content="nofollow"><a href="/x">x</a>'
    assert _one(spark, followable_hrefs(F.col("html")), html=nf) == []
    df = spark.createDataFrame(
        [('<a href="/x">x</a>', "nofollow")], "html string, xr string"
    )
    got = df.select(
        followable_hrefs(F.col("html"), F.col("xr")).alias("v")
    ).collect()[0].v
    assert got == []
