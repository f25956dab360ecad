"""Microdata extraction (functions/microdata.py): value-resolution
table, nesting boundaries, multi-name itemprops, scope rules. The
catalog's microdata_extract oracle row pins the cross-engine identity
over real HTML parses."""

from __future__ import annotations

from crawler_ai_spark.functions.microdata import extract_microdata, microdata_rows


def test_value_resolution_table():
    html = (
        '<div itemscope itemtype="T">'
        '<meta itemprop="m" content="MC">'
        '<a itemprop="a" href="/h">text ignored</a>'
        '<img itemprop="i" src="/s.png">'
        '<time itemprop="t" datetime="2024-01-01">Jan</time>'
        '<time itemprop="t2">fallback text</time>'
        '<data itemprop="d" value="42">forty-two</data>'
        '<span itemprop="s">  spaced   text </span>'
        "</div>"
    )
    got = {(p, v) for _, _, p, v in extract_microdata(html)}
    assert got == {
        ("m", "MC"), ("a", "/h"), ("i", "/s.png"), ("t", "2024-01-01"),
        ("t2", "fallback text"), ("d", "42"), ("s", "spaced text"),
    }


def test_nesting_and_scope_rules():
    html = (
        '<p itemprop="outside">ignored</p>'
        '<div itemscope itemtype="A">'
        '<span itemprop="x">1</span>'
        '<div itemprop="child" itemscope itemtype="B">'
        '<span itemprop="y">2</span></div>'
        "</div>"
    )
    rows = extract_microdata(html)
    # item 0 = A with x and the flattened child ref; item 1 = B with y
    assert (0, "A", "x", "1") in rows
    assert (0, "A", "child", "[item:B]") in rows
    assert (1, "B", "y", "2") in rows
    # B's props never leak into A; out-of-scope itemprop never extracts
    assert not any(r[0] == 0 and r[2] == "y" for r in rows)
    assert not any(r[2] == "outside" for r in rows)


def test_multiname_and_empty():
    rows = extract_microdata('<div itemscope><b itemprop="p q">v</b></div>')
    assert {(p, v) for _, _, p, v in rows} == {("p", "v"), ("q", "v")}
    assert extract_microdata("") == []
    assert extract_microdata("<html><body>no items</body></html>") == []


def test_dataframe_stage(spark):
    pages = spark.createDataFrame(
        [
            ("u1", b'<div itemscope itemtype="T"><i itemprop="p">x</i></div>'),
            ("u2", b"<p>nothing</p>"),
        ],
        "url string, html binary",
    )
    rows = microdata_rows(pages).collect()
    assert [(r.url, r.itemtype, r.prop, r.value) for r in rows] == [
        ("u1", "T", "p", "x")
    ]
