"""F7 — rule-based job validation ("AI validation" in the reference's
naming, job_extraction_service.py:1120-1279) as one boolean column.

The cascade, in order:
1. reject when the URL contains any non-job pattern;
2. reject when title AND description are both empty;
3. reject when the (stripped) description is missing or < 30 chars;
4. reject when "title description" (lowercased) contains any critical
   keyword;
5. count positive job indicators; then
   - zero indicators: accept iff len(title) > 5 and the title contains a
     job-title keyword (the embedded-jobs path) — otherwise fall through
     to the rejects below;
   - ≥ 3: accept;
   - 1-2: accept iff len(title) > 5 and the title contains a borderline
     word or a job-title keyword, else reject;
   - else reject.

tests/test_detector_parity.py executes the reference's own coroutine
(self is unused, so it runs unbound) and asserts identical verdicts."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions.filters import any_substr, count_hits


def validate_job_expr(title: Column, description: Column, job_url: Column) -> Column:
    t = F.trim(F.coalesce(title, F.lit("")))
    d = F.trim(F.coalesce(description, F.lit("")))
    url_low = F.lower(F.coalesce(job_url, F.lit("")))
    content_low = F.lower(F.concat(t, F.lit(" "), d))
    title_low = F.lower(t)

    url_reject = any_substr(url_low, K.F7_NON_JOB_URL_PATTERNS)
    both_empty = (t == "") & (d == "")
    desc_short = (d == "") | (F.length(d) < K.F7_MIN_DESCRIPTION_LEN)
    critical = any_substr(content_low, K.F7_CRITICAL_REJECT)

    positive = count_hits(content_low, K.F7_POSITIVE_INDICATORS)
    titleish = (F.length(t) > 5) & any_substr(title_low, K.F7_JOB_TITLE_KEYWORDS)
    borderline = (F.length(t) > 5) & any_substr(title_low, K.F7_BORDERLINE_TITLE_WORDS)

    decision = (
        F.when((positive == 0) & titleish, F.lit(True))
        .when(positive >= 3, F.lit(True))
        .when((positive >= 1) & (borderline | titleish), F.lit(True))
        .otherwise(F.lit(False))
    )
    return (
        F.when(url_reject | both_empty | desc_short | critical, F.lit(False))
        .otherwise(decision)
    )
