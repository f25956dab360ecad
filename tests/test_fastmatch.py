"""fastmatch.priority_fast ≡ filters.priority_expr — element-wise, on
every keyword, adversarial boundary/unicode strings, NULLs, and a
deterministic 5k random-URL sweep. The Arrow/RE2 fast path may never
diverge from the JVM rule the oracles and the golden crawl sim pin."""

import random

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import fastmatch as FM
from crawler_ai_spark.functions import filters as FL


def _compare(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "href string")
    got = (
        df.withColumn("jvm", FL.priority_expr(F.col("href")))
        .withColumn("re2", FM.priority_fast(F.col("href")))
        .collect()
    )
    bad = [(r["href"], r["jvm"], r["re2"]) for r in got if r["jvm"] != r["re2"]]
    assert not bad, bad[:10]


def test_every_keyword_and_boundaries(spark):
    urls = []
    for kw in (
        list(K.CAREER_KEYWORDS) + list(K.NAV_KEYWORDS) + list(K.CONTENT_KEYWORDS)
    ):
        urls.append(f"https://x.com/{kw}/1")  # mid-path
        urls.append(f"https://x.com/a?q={kw}")  # query tail
        urls.append(kw)  # whole string
        urls.append(f"https://x.com/{kw.upper()}")  # case-folded by lower()
    _compare(spark, urls)


def test_adversarial_strings(spark):
    _compare(
        spark,
        [
            "",
            "https://x.com/",
            "https://x.com/a.b?c*d(e)f[g]h",  # regex metachars in the URL
            "https://x.com/aboutcareers",  # overlapping nav+career
            "https://x.com/presscareer",  # content then career
            "https://x.com/tuyển-dụng/x",  # unicode keyword
            "https://x.com/TUYỂN-DỤNG/x",  # unicode upper
            "https://x.com/İstanbul/jobs",  # dotted capital I case mapping
            "https://x.com/ß-straße/karriere",  # sharp s
            "x" * 5000,  # long non-matching
            ("https://h.example.com/" + "segment/" * 200 + "career"),
        ],
    )


def test_null_href_matches_jvm_fallthrough(spark):
    df = spark.createDataFrame([(None,), ("https://x.com/jobs",)], "href string")
    got = (
        df.withColumn("jvm", FL.priority_expr(F.col("href")))
        .withColumn("re2", FM.priority_fast(F.col("href")))
        .collect()
    )
    for r in got:
        assert r["jvm"] == r["re2"]
    assert got[0]["re2"] == 10  # NULL → otherwise-bucket, both paths


def test_random_url_sweep(spark):
    rng = random.Random(42)
    frags = (
        [k for k in K.CAREER_KEYWORDS]
        + [k for k in K.NAV_KEYWORDS]
        + [k for k in K.CONTENT_KEYWORDS]
        + ["product", "item", "xyz", "page", "p", "view", "9981", "download"]
    )
    urls = []
    for _ in range(5000):
        host = f"host{rng.randrange(500)}.example.com"
        segs = "/".join(rng.choice(frags) for _ in range(rng.randrange(1, 4)))
        if rng.random() < 0.3:
            segs = segs.upper()
        urls.append(f"https://{host}/{segs}")
    _compare(spark, urls)


def test_fast_path_plans_arrow_not_row_python(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://x.com/p/"), F.col("id").cast("string")).alias("href")
    )
    out = df.withColumn("p", FM.priority_fast(F.col("href")))
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
