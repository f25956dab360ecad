"""Registered-domain (PSL algorithm) — exact/wildcard/exception rule
semantics pinned at the function level (catalog `registered_domains`
oracle-checks the composed derivation at 500 rows)."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.urls import registered_domain_expr


def test_psl_rule_classes(spark):
    cases = [
        # exact multi-label suffix: longest match wins over default
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("co.uk", None),  # host IS a public suffix
        # default '*' rule for gTLDs / unknown TLDs
        ("www.example.com", "example.com"),
        ("deep.a.b.example.com", "example.com"),
        ("host.unknowntld", "host.unknowntld"),
        ("com", None),
        # private-section platform suffixes
        ("sub.myuser.github.io", "myuser.github.io"),
        ("myuser.github.io", "myuser.github.io"),
        # wildcard *.ck: every child of ck is itself a public suffix
        ("foo.ck", None),
        ("bar.foo.ck", "bar.foo.ck"),
        # exception !www.ck carves www.ck back out as registrable
        ("www.ck", "www.ck"),
        # 4-label wildcard parent (compute.amazonaws.com)
        ("x.compute.amazonaws.com", None),
        ("y.x.compute.amazonaws.com", "y.x.compute.amazonaws.com"),
        # normalization: case, trailing dot, blanks
        ("Example.COM.", "example.com"),
        ("", None),
        (None, None),
        ("localhost", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.v
        for r in df.select(
            registered_domain_expr(F.col("host")).alias("v")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_psl_stays_in_codegen(spark):
    df = spark.createDataFrame([("a.co.uk",)], "host string")
    plan = (
        df.select(registered_domain_expr(F.col("host")).alias("v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
