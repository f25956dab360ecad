"""JSON-LD structured-data extraction — block-regexp and JobPosting
parse edge semantics pinned at the function level (catalog
`jsonld_jobposting` oracle-checks the same logic at 300 rows).

Reference parity: the reference mines embedded script-JSON for job
records (crawler.py script handling; job_extraction_service.py embedded
parse); schema.org JSON-LD is the typed, publisher-declared form of the
same signal at web scale.
"""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.jsonld import jobposting_from_block, jsonld_blocks


def _blocks(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(jsonld_blocks(F.col("html")).alias("b")).collect()[0].b


def test_block_extraction_variants(spark):
    # plain, single-quoted attr, unquoted attr, uppercase tag+attr
    for h in (
        '<script type="application/ld+json">{"a":1}</script>',
        "<script type='application/ld+json'>{\"a\":1}</script>",
        "<script type=application/ld+json>{\"a\":1}</script>",
        '<SCRIPT TYPE="application/ld+json">{"a":1}</SCRIPT>',
        '<script async type="application/ld+json" id="x">{"a":1}</script>',
    ):
        assert _blocks(spark, h) == ['{"a":1}'], h


def test_block_extraction_multiline_and_order(spark):
    html = (
        '<script type="application/ld+json">\n {"first":\n true} \n</script>'
        "<script>var x = 1;</script>"  # plain JS: not JSON-LD
        '<script type="text/javascript">{"no":1}</script>'
        '<script type="application/ld+json">{"second":true}</script>'
    )
    assert _blocks(spark, html) == ['{"first":\n true}', "{\"second\":true}"]


def test_block_extraction_none_and_null(spark):
    assert _blocks(spark, "<html><body>nothing</body></html>") == []
    assert _blocks(spark, None) == []


def test_jobposting_parse_and_type_gate(spark):
    good = (
        '{"@type":"JobPosting","title":"Dev","datePosted":"2024-01-02",'
        '"employmentType":"PART_TIME",'
        '"hiringOrganization":{"name":"Acme"},'
        '"jobLocation":{"address":{"addressLocality":"Hanoi"}}}'
    )
    rows = [
        (0, good),
        (1, '{"@type":"Organization","name":"Acme"}'),  # wrong type
        (2, "utter garbage"),  # permissive parse → null struct
        (3, '{"@type":"JobPosting","title":"Min"}'),  # optionals absent
    ]
    df = spark.createDataFrame(rows, "id int, block string")
    out = (
        df.select("id", jobposting_from_block(F.col("block")).alias("jp"))
        .where(F.col("jp.`@type`") == "JobPosting")
        .select(
            "id",
            "jp.title",
            F.col("jp.hiringOrganization.name").alias("company"),
            F.col("jp.jobLocation.address.addressLocality").alias("loc"),
            "jp.employmentType",
        )
        .orderBy("id")
        .collect()
    )
    assert [tuple(r) for r in out] == [
        (0, "Dev", "Acme", "Hanoi", "PART_TIME"),
        (3, "Min", None, None, None),
    ]
