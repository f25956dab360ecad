"""HTML microdata extraction (WHATWG HTML §5 "Microdata") — the third
structured-data channel next to JSON-LD (functions/jsonld.py) and Open
Graph/Twitter cards (functions/ogmeta.py): job boards and retail sites
annotate markup in-place with itemscope/itemtype/itemprop instead of a
separate script block, so a structured-data pipeline that reads only
ld+json misses them.

Subset implemented (the published value-resolution table):

- every element carrying ``itemscope`` starts an item; ``itemtype``
  names its vocabulary (absent -> '').
- an item's properties are its descendant ``itemprop`` elements, NOT
  descending into nested itemscope subtrees (those are their own
  items); a nested itemscope that itself carries ``itemprop``
  contributes ``(prop, '[item:<itemtype>]')`` to its parent — the
  reference-style flattening of item-valued properties.
- property value by element: meta -> @content, a/area/link -> @href,
  img/audio/video/embed/iframe/source/track -> @src, time ->
  @datetime (falling back to text), data -> @value, else the
  whitespace-collapsed text content.
- ``itemprop`` may hold multiple space-separated names — one output
  row each.

Runs as an Arrow-batched mapInPandas over the domlite stdlib DOM
(functions/domlite.py — no bs4 in the sandbox): one pass over pages,
no shuffle; output exploded to one row per (item, prop)."""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.functions.domlite import Node, parse_dom

_WS = re.compile(r"\s+")

_SRC_TAGS = {"img", "audio", "video", "embed", "iframe", "source", "track"}


def _value_of(node: Node) -> str:
    name = node.name
    attrs = node.attrs
    if name == "meta":
        return attrs.get("content", "") or ""
    if name in ("a", "area", "link"):
        return attrs.get("href", "") or ""
    if name in _SRC_TAGS:
        return attrs.get("src", "") or ""
    if name == "time":
        return attrs.get("datetime") or _WS.sub(" ", node.get_text()).strip()
    if name == "data":
        return attrs.get("value", "") or ""
    return _WS.sub(" ", node.get_text()).strip()


def extract_microdata(html: str) -> list[tuple[int, str, str, str]]:
    """html -> [(item_idx, itemtype, prop, value)], items indexed in
    document order (the order itemscope elements open)."""
    root = parse_dom(html or "")
    out: list[tuple[int, str, str, str]] = []
    counter = [0]

    def walk_item(scope: Node, idx: int, itemtype: str) -> None:
        def rec(node: Node) -> None:
            for ch in getattr(node, "children", ()):
                if not isinstance(ch, Node):
                    continue
                is_scope = "itemscope" in ch.attrs
                props = (ch.attrs.get("itemprop") or "").split()
                if is_scope:
                    child_idx = counter[0]
                    counter[0] += 1
                    child_type = ch.attrs.get("itemtype", "") or ""
                    for p in props:
                        out.append((idx, itemtype, p, f"[item:{child_type}]"))
                    walk_item(ch, child_idx, child_type)
                    continue  # nested scope owns its subtree
                for p in props:
                    out.append((idx, itemtype, p, _value_of(ch)))
                rec(ch)

        rec(scope)

    def find_scopes(node: Node) -> None:
        for ch in getattr(node, "children", ()):
            if not isinstance(ch, Node):
                continue
            if "itemscope" in ch.attrs:
                idx = counter[0]
                counter[0] += 1
                walk_item(ch, idx, ch.attrs.get("itemtype", "") or "")
                # nested scopes are visited by walk_item; don't re-find
            else:
                find_scopes(ch)

    find_scopes(root)
    return out


MICRODATA_SCHEMA = (
    "url string, item_idx int, itemtype string, prop string, value string"
)


def microdata_rows(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(url, html[, ...]) -> one row per (item, prop). Binary html
    decodes as utf-8-replace (the corpus convention)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                h = row.html
                if isinstance(h, (bytes, bytearray, memoryview)):
                    h = bytes(h).decode("utf-8", "replace")
                for idx, t, p, v in extract_microdata(h or ""):
                    rows.append((row.url, idx, t, p, v))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "item_idx", "itemtype", "prop", "value"]
                )

    return pages.select("url", F.col(html_col).alias("html")).mapInPandas(
        _extract, schema=MICRODATA_SCHEMA
    )
