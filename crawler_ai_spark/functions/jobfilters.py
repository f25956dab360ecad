"""F8 — user-facing job filters (job_extraction_service.py:238-577):
type/location/salary/posted-date predicates with synonym maps.

Each builder takes the FILTER VALUES as Python arguments (they are query
parameters, not data) and returns a boolean Column over the job row."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# job_extraction_service.py:62-69
JOB_TYPE_MAPPINGS: dict[str, tuple[str, ...]] = {
    "full-time": ("full time", "fulltime", "toàn thời gian", "chính thức"),
    "part-time": ("part time", "parttime", "bán thời gian", "thời vụ"),
    "contract": ("contract", "hợp đồng", "temporary", "tạm thời"),
    "internship": ("intern", "internship", "thực tập", "trainee"),
    "remote": ("remote", "work from home", "làm việc từ xa", "online"),
    "hybrid": ("hybrid", "kết hợp", "flexible", "linh hoạt"),
}

# job_extraction_service.py:72-78
LOCATION_PATTERNS: dict[str, tuple[str, ...]] = {
    "hanoi": ("hà nội", "hanoi", "hn", "thăng long"),
    "ho_chi_minh": ("hồ chí minh", "ho chi minh", "hcm", "tp.hcm", "saigon"),
    "da_nang": ("đà nẵng", "da nang", "danang"),
    "can_tho": ("cần thơ", "can tho", "cantho"),
    "hai_phong": ("hải phòng", "hai phong", "haiphong"),
}


def matches_job_type_expr(
    job_type: Column, title: Column, description: Column, filter_types: list[str]
) -> Column:
    """_matches_job_type (:466-493): the filter string OR any mapped
    synonym occurring in job_type, title, or description."""
    jt = F.lower(F.coalesce(job_type, F.lit("")))
    tt = F.lower(F.coalesce(title, F.lit("")))
    dd = F.lower(F.coalesce(description, F.lit("")))
    out = F.lit(False)
    for ftype in filter_types:
        fl = ftype.lower()
        hit = jt.contains(fl) | tt.contains(fl) | dd.contains(fl)
        for kw in JOB_TYPE_MAPPINGS.get(fl, ()):
            hit = hit | jt.contains(kw) | tt.contains(kw) | dd.contains(kw)
        out = out | hit
    return out


def matches_location_expr(location: Column, filter_locations: list[str]) -> Column:
    """_matches_location (:495-512)."""
    loc = F.lower(F.coalesce(location, F.lit("")))
    out = F.lit(False)
    for floc in filter_locations:
        fl = floc.lower()
        hit = loc.contains(fl)
        for pat in LOCATION_PATTERNS.get(fl, ()):
            hit = hit | loc.contains(pat)
        out = out | hit
    return out


def matches_salary_expr(
    salary: Column, min_salary: int = 0, max_salary: int | None = None
) -> Column:
    """_matches_salary_range (:514-534): jobs without salary info or
    without digits are INCLUDED; else the FIRST digit-run (commas removed)
    must fall inside [min, max]."""
    s = F.regexp_replace(F.coalesce(salary, F.lit("")), ",", "")
    first_num = F.regexp_extract(s, r"(\d+)", 1)
    value = F.when(first_num != "", first_num.cast("long"))
    in_range = value >= min_salary
    if max_salary is not None:
        in_range = in_range & (value <= max_salary)
    return (s == "") | (first_num == "") | in_range


def matches_posted_date_expr(posted_date: Column, date_filter: str) -> Column:
    """_matches_posted_date (:536-577) — FAITHFUL TO A REFERENCE BUG: the
    filter computes ``now - datetime.timedelta(days=…)`` but ``timedelta``
    is not an attribute of the ``datetime`` CLASS, so every recognized
    filter raises AttributeError which the blanket except turns into
    ``return True``. Net effect: the posted-date filter always includes
    every job. Reproduced as a constant; fix deliberately NOT applied
    (matching the reference's observable behavior is the contract)."""
    return F.lit(True)


def apply_job_filters(
    jobs,
    job_types: list[str] | None = None,
    locations: list[str] | None = None,
    salary_min: int = 0,
    salary_max: int | None = None,
    use_salary: bool = False,
    posted_date_filter: str | None = None,
):
    """_apply_job_filters (:238-265) — conjunction of the active filters."""
    out = jobs
    if job_types:
        out = out.where(
            matches_job_type_expr(
                F.col("job_type"), F.col("title"), F.col("description"), job_types
            )
        )
    if locations:
        out = out.where(matches_location_expr(F.col("location"), locations))
    if use_salary:
        out = out.where(matches_salary_expr(F.col("salary"), salary_min, salary_max))
    if posted_date_filter:
        out = out.where(matches_posted_date_expr(F.col("posted_date"), posted_date_filter))
    return out
