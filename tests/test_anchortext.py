"""operators/anchortext.py semantics on hand-built edges where the
right rollup is obvious (the catalog oracle pins cross-engine values)."""

from __future__ import annotations

from crawler_ai_spark.operators.anchortext import anchor_text_rollup


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_url string, anchor string"
    )


def test_rollup_counts_hosts_and_top_terms(spark):
    edges = _edges(
        spark,
        [
            ("a.com", "http://t/1", "great jobs board"),
            ("b.com", "http://t/1", "jobs board"),
            ("b.com", "http://t/1", "the best JOBS site"),  # stopword + case
            ("c.com", "http://t/2", ""),  # empty anchor
        ],
    )
    out = {r.dst_url: r for r in anchor_text_rollup(edges).collect()}
    t1 = out["http://t/1"]
    assert (t1.in_degree, t1.n_src_hosts) == (3, 2)
    # jobs×3, board×2, then count-1 terms tie-broken lexicographically
    assert t1.top_terms == "jobs|board|best"
    t2 = out["http://t/2"]
    assert (t2.in_degree, t2.n_src_hosts, t2.top_terms) == (1, 1, "")


def test_repeated_word_in_one_anchor_counts_once(spark):
    edges = _edges(
        spark,
        [
            ("a.com", "http://t/3", "spam spam spam spam ham"),
            ("b.com", "http://t/3", "ham sandwich"),
        ],
    )
    (row,) = anchor_text_rollup(edges).collect()
    # ham appears in 2 edges, spam only in 1 despite 4 copies
    assert row.top_terms == "ham|sandwich|spam"
