"""Codegen-health sweep: every catalog query must COMPILE under
whole-stage codegen. janino's 64 KB method limit does not fail a query —
Spark logs a warning and silently downgrades the stage to interpreted
evaluation, a real ~10-100x tax at cluster scale that no correctness
gate sees. `spark.sql.codegen.fallback=false` turns the silent downgrade
into a hard error, so a too-large generated method fails CI here.

Two catalog queries shipped with this disease before the sweep existed:
`career_detection_pipeline` (the ~265-term C3 confidence fold inlined
into one consume method — fixed by the staged term-array form, see
functions/confidence.py) and `job_url_pipeline` (FilterExec predicate
codegen has no common-subexpression elimination, so the F3 gate embedded
the synthesized-url CASE once per reference, ~1.5 MB of generated code —
fixed by keeping the gate inside a CSE-capable projection and filtering
above the limit)."""

from __future__ import annotations

import pytest

from crawler_ai_spark import catalog as C

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def strict_spark(spark):
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", prev)


@pytest.mark.parametrize("name", sorted(C.QUERIES))
def test_query_compiles_without_codegen_fallback(strict_spark, name):
    df = C.QUERIES[name](strict_spark, SF_DIR)
    # noop sink executes the full plan (AQE included) without collecting
    df.write.format("noop").mode("overwrite").save()
