"""F7b — element-level job-confidence check (the validation.py sibling):
reference app/services/element_checker.py:20-101 `check_element_for_job`.

Scores one DOM element's text + attributes: keyword count (capped 0.6),
pattern count (capped 0.4), data-job/position/career attributes (+0.3),
job-ish class tokens (+0.2), job-ish id (+0.2); likely-job iff the sum
reaches 0.3, confidence capped at 1.0. All JVM when/regexp chains."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# element_checker.py:35-41
ELEMENT_JOB_KEYWORDS = (
    "job", "career", "position", "opportunity", "vacancy",
    "hiring", "recruitment", "employment", "work",
    "tuyển dụng", "việc làm", "cơ hội", "vị trí",
    "nghề nghiệp", "công việc", "làm việc",
)

# element_checker.py:46-52 — re.search over the lowered text
ELEMENT_JOB_PATTERNS = (
    r"\b(developer|engineer|designer|manager|analyst|specialist)\b",
    r"\b(full.?time|part.?time|remote|hybrid|onsite)\b",
    r"\b(experience|skill|requirement|qualification)\b",
    r"\b(salary|compensation|benefit|package)\b",
    r"\b(apply|application|submit|join|work)\b",
)

# element_checker.py:77 / :84 — class/id token probes
ELEMENT_ATTR_KEYWORDS = ("job", "career", "position", "opportunity")


def element_job_check_expr(
    text: Column, has_data_attr: Column, class_text: Column, id_text: Column
) -> Column:
    """STRUCT(confidence, is_likely_job, reason) — check_element_for_job
    (:20-101) with the element's pre-extracted pieces: stripped text, the
    data-job/data-position/data-career presence flag, the joined class
    list, and the id. Float fold order matches the reference exactly
    (kw-base + pattern + data + class + id, then min 1.0)."""
    stripped = F.trim(text)
    low = F.lower(stripped)
    kw = sum(
        (low.contains(k).cast("int") for k in ELEMENT_JOB_KEYWORDS), F.lit(0)
    )
    pm = sum(
        (low.rlike(p).cast("int") for p in ELEMENT_JOB_PATTERNS), F.lit(0)
    )
    conf = F.lit(0.0)
    conf = conf + F.when(kw > 0, F.least(kw.cast("double") * 0.2, F.lit(0.6))).otherwise(0.0)
    conf = conf + F.when(pm > 0, F.least(pm.cast("double") * 0.15, F.lit(0.4))).otherwise(0.0)
    conf = conf + F.when(F.coalesce(has_data_attr, F.lit(False)), F.lit(0.3)).otherwise(0.0)
    cls_low = F.lower(F.coalesce(class_text, F.lit("")))
    cls_hit = F.lit(False)
    id_low = F.lower(F.coalesce(id_text, F.lit("")))
    id_hit = F.lit(False)
    for k in ELEMENT_ATTR_KEYWORDS:
        cls_hit = cls_hit | cls_low.contains(k)
        id_hit = id_hit | id_low.contains(k)
    conf = conf + F.when(cls_hit, F.lit(0.2)).otherwise(0.0)
    conf = conf + F.when(id_hit, F.lit(0.2)).otherwise(0.0)
    short = stripped.isNull() | (F.length(stripped) < 10)
    return F.struct(
        F.when(short, F.lit(0.0)).otherwise(F.least(conf, F.lit(1.0))).alias("confidence"),
        F.when(short, F.lit(False)).otherwise(conf >= 0.3).alias("is_likely_job"),
        F.when(short, F.lit("Text too short"))
        .otherwise(
            F.concat(
                F.lit("Keywords: "), kw.cast("string"), F.lit(", Patterns: "), pm.cast("string")
            )
        )
        .alias("reason"),
    )
