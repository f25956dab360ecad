"""IDN/punycode host normalization — edge semantics + the ASCII
fast-path gate (catalog `idn_host_normalize` oracle-checks the encoding
at 500 rows)."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.urls import _idn_one, idn_host_expr


def test_idn_pure_python_edges():
    assert _idn_one(None) is None
    assert _idn_one("") == ""
    assert _idn_one("...") == ""
    assert _idn_one("  Plain.Example.COM.  ") == "plain.example.com"
    assert _idn_one("münchen.example") == "xn--mnchen-3ya.example"
    # overlong label (>63 chars post-encode) can't encode: lowercased form kept
    assert _idn_one("ü" * 80 + ".example") == "ü" * 80 + ".example"


def test_idn_expr_and_ascii_gate(spark):
    rows = [
        "MÜNCHEN.example",
        "WWW.Example.COM.",
        "xn--mnchen-3ya.example",
        None,
    ]
    df = spark.createDataFrame([(h,) for h in rows], "host string")
    got = [r.v for r in df.select(idn_host_expr(F.col("host")).alias("v")).collect()]
    assert got == [
        "xn--mnchen-3ya.example",
        "www.example.com",
        "xn--mnchen-3ya.example",
        None,
    ]
    # the UDF's input is nulled for ASCII rows: the plan must show the
    # CASE gate feeding ArrowEvalPython, not the raw host column
    plan = df.select(idn_host_expr(F.col("host")).alias("v"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "CASE WHEN" in plan
