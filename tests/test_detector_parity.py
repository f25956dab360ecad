"""F5/C2 parity against the REFERENCE'S OWN functions (SURVEY.md §5.1):
the Spark expressions must produce the same rejection rule and the same
integer score as executing /root/reference's check_early_rejection /
calculate_career_score on a diverse URL battery."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions.detector import (
    career_detector_score_expr,
    early_rejection_reason_expr,
)

_REASON_MAP = {
    "Contains non-career indicator": "non_career_indicator",
    "Contains date pattern": "date_pattern",
    "Contains long ID pattern": "long_id",
    "Contains file extension": "file_extension",
    "Path too deep": "path_too_deep",
    "Contains non-career path": "non_career_path",
    "Job detail page detected": "job_detail_page",
}

URLS = [
    "https://acme.example.com/careers",
    "https://acme.example.com/career",
    "https://acme.example.com/jobs",
    "https://acme.example.com/tuyen-dung",
    "https://acme.example.com/viec-lam",
    "https://acme.example.com/careers/our-culture",
    "https://acme.example.com/careers/benefits",
    "https://acme.example.com/recruitment?job=1",
    "https://acme.example.com/hiring?career=x&apply=now",
    "https://acme.example.com/news/2024/01/story",
    "https://acme.example.com/blog/post",
    "https://acme.example.com/products/item",
    "https://acme.example.com/about",
    "https://acme.example.com/a/b/c/d",
    "https://acme.example.com/x.pdf",
    "https://acme.example.com/12345",
    "https://acme.example.com/deadbeef",
    "https://acme.example.com/jobs/view",
    "https://acme.example.com/apply/form",
    "https://acme.example.com/",
    "https://acme.example.com/tuyendung",
    "https://acme.example.com/positions?position=dev&hiring=yes",
    "https://acme.example.com/career%20page",
    "https://acme.example.com/viec-lam/ha-noi",
    "https://acme.example.com/nghe-nghiep",
    "https://acme.example.com/opportunity",
]


@pytest.fixture(scope="module")
def ref_detector():
    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.path.insert(0, "/root/reference")
    from app.services import career_detector as cd

    return cd


def test_early_rejection_matches_reference(spark, ref_detector):
    cd = ref_detector
    expected = {}
    for u in URLS:
        rejected, reason = cd.check_early_rejection(u, cd.analyze_url_structure(u))
        if not rejected:
            expected[u] = None
        else:
            cat = next((v for k, v in _REASON_MAP.items() if reason.startswith(k)), reason)
            expected[u] = cat
    df = spark.createDataFrame([(u,) for u in URLS], "url STRING")
    got = {
        r.url: r.reason
        for r in df.select(
            "url", early_rejection_reason_expr(F.col("url")).alias("reason")
        ).collect()
    }
    assert got == expected


def test_career_score_matches_reference(spark, ref_detector):
    cd = ref_detector
    expected = {
        u: cd.calculate_career_score(u, cd.analyze_url_structure(u))[0] for u in URLS
    }
    df = spark.createDataFrame([(u,) for u in URLS], "url STRING")
    got = {
        r.url: r.score
        for r in df.select(
            "url", career_detector_score_expr(F.col("url")).alias("score")
        ).collect()
    }
    assert got == expected, {
        u: (got[u], expected[u]) for u in URLS if got[u] != expected[u]
    }


# ---------------------------------------------------------------------------
# C3 — URL career confidence vs the reference's _analyze_url_for_career
# ---------------------------------------------------------------------------

C3_URLS = [
    "https://acme.example.com/careers",
    "https://acme.example.com/career",
    "https://acme.example.com/jobs/",
    "https://careers.acme.example.com/open",
    "https://jobs.acme.example.com/",
    "https://acme.example.com/",
    "https://acme.example.com/index.html",
    "https://acme.example.com/sitemap.xml",
    "ftp://acme.example.com/careers",
    "https://acme.example.com/a/b/c/d/e",
    "https://acme.example.com/dev/tech",            # 0.3+0.3+0.2 FP-edge
    "https://acme.example.com/digital-ml",          # dash-bounded generics
    "https://acme.example.com/tuyen-dung",
    "https://acme.example.com/viec-lam/ha-noi",
    "https://acme.example.com/blog/dev",
    "https://acme.example.com/products/login",
    "https://acme.example.com/about",
    "https://acme.example.com/join-us",
    "https://acme.example.com/work-with-us",
    "https://topcv.vn/viec-lam",
    "https://acme.example.com/news.json",
    "https://acme.example.com/hop-tac-tuyen-dung",
    "https://acme.example.com/testing",
    "https://acme.example.com/it",
    "https://acme.example.com/case-studies/ai",
    "https://acme.example.com/showcase",
]

_C3_REASON_MAP = {
    "XML/sitemap content": "xml",
    "Non-HTTP URL": "non_http",
    "Homepage": "homepage",
    "Path too deep": "path_too_deep",
    "Strong non-career pattern": "strong_non_career",
    "Low confidence score": "low_confidence",
}


@pytest.fixture(scope="module")
def ref_service():
    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    sys.modules["aiohttp"].ClientSession = object
    sys.modules["aiohttp"].ClientTimeout = object
    sys.modules["aiohttp"].TCPConnector = object
    sys.path.insert(0, "/root/reference")
    from app.services.career_pages_service import CareerPagesService

    return CareerPagesService()


def test_career_confidence_matches_reference(spark, ref_service):
    import asyncio

    from crawler_ai_spark.functions.confidence import career_confidence_expr

    expected = {}
    for u in C3_URLS:
        a = asyncio.run(ref_service._analyze_url_for_career(u, "https://acme.example.com", True))
        reason = a["rejection_reason"]
        cat = None
        if reason:
            cat = next((v for k, v in _C3_REASON_MAP.items() if reason.startswith(k)), reason)
        expected[u] = (a["confidence"], a["is_career_page"], a["is_potential"], cat)

    df = spark.createDataFrame([(u,) for u in C3_URLS], "url STRING")
    rows = df.select("url", career_confidence_expr(F.col("url")).alias("c")).collect()
    got = {
        r.url: (r.c.confidence, r.c.is_career_page, r.c.is_potential, r.c.rejection)
        for r in rows
    }
    mismatches = {u: (got[u], expected[u]) for u in C3_URLS if got[u] != expected[u]}
    assert not mismatches, mismatches


# ---------------------------------------------------------------------------
# C7 — job analyzers vs the reference's JobAnalyzer
# ---------------------------------------------------------------------------

TITLES = [
    "Senior Java Developer",
    "Junior QA Engineer",
    "entry level tester",
    "Mid Level Designer",
    "Lead DevOps (AWS & K8s)",
    "Principal Architect",
    "Head of Marketing",
    "intern",
    "ab",
    "",
    "Backend Developer 2024",
    "Växjö Dev",
    "a " + "very " * 40 + "long title engineer",
    "Product Manager - Payments",
    "fresh graduate software engineer",
    "5-10 years experienced architect",
]

TECH_TEXTS = [
    "we use Python and React on AWS with Docker and Kubernetes",
    "Java/Spring backend, Postgres, Redis, deployed to GCP",
    "plain text with no tech at all... or is there",
    "",
    "ML pipelines in PyTorch and TensorFlow on Azure",
]


@pytest.fixture(scope="module")
def ref_analyzer():
    sys.path.insert(0, "/root/reference")
    from app.services.job_analyzer import JobAnalyzer

    return JobAnalyzer()


def test_technologies_match_reference(spark, ref_analyzer):
    from crawler_ai_spark.functions.analyzers import technologies_expr

    expected = {t: sorted(set(ref_analyzer.extract_technologies(t))) for t in TECH_TEXTS}
    df = spark.createDataFrame([(t,) for t in TECH_TEXTS], "t STRING")
    got = {
        r.t: sorted(r.techs)
        for r in df.select("t", technologies_expr(F.col("t")).alias("techs")).collect()
    }
    assert got == expected


def test_level_and_category_match_reference(spark, ref_analyzer):
    from crawler_ai_spark.functions.analyzers import job_category_expr, job_level_expr

    exp_level = {t: ref_analyzer.extract_job_level(t) for t in TITLES if t}
    exp_cat = {t: ref_analyzer.categorize_job(t) for t in TITLES if t}
    df = spark.createDataFrame([(t,) for t in TITLES if t], "t STRING")
    rows = df.select(
        "t", job_level_expr(F.col("t")).alias("lvl"), job_category_expr(F.col("t")).alias("cat")
    ).collect()
    got_level = {r.t: r.lvl for r in rows}
    got_cat = {r.t: r.cat for r in rows}
    assert got_level == exp_level
    assert got_cat == exp_cat


def test_title_analysis_matches_reference(spark, ref_analyzer):
    from crawler_ai_spark.functions.analyzers import analyze_title_expr

    expected = {}
    for t in TITLES:
        a = ref_analyzer.analyze_job_title(t)
        expected[t] = (
            a.get("normalized"),
            a.get("length"),
            a.get("word_count"),
            a["valid"],
            round(float(a["score"]), 6),
            tuple(a["issues"]),
        )
    df = spark.createDataFrame([(t,) for t in TITLES], "t STRING")
    rows = df.select("t", analyze_title_expr(F.col("t")).alias("a")).collect()
    got = {
        r.t: (
            r.a.normalized, r.a.length, r.a.word_count, r.a.valid,
            round(r.a.score, 6), tuple(r.a.issues),
        )
        for r in rows
    }
    mismatches = {t: (got[t], expected[t]) for t in TITLES if got[t] != expected[t]}
    assert not mismatches, mismatches


# ---------------------------------------------------------------------------
# F7 — rule-based job validation vs the reference's coroutine
# ---------------------------------------------------------------------------

F7_CASES = [
    # (title, description, url)
    ("Senior Java Developer", "Responsibilities: build services. Requirements: 5 years of experience.", "https://x.com/jobs/1"),
    ("Senior Java Developer", "short desc", "https://x.com/jobs/1"),
    ("", "", "https://x.com/jobs/2"),
    ("About Us", "We are a great company with core values and mission vision for everyone.", "https://x.com/about"),
    ("Privacy", "This privacy policy explains how your data is processed at length today.", "https://x.com/jobs/3"),
    ("DevOps Engineer", "x" * 40, "https://x.com/jobs/4"),
    ("Random Words Here", "x" * 40, "https://x.com/jobs/5"),
    ("Designer", "y" * 35, "https://x.com/jobs/6"),
    ("UX Designer hiring now", "benefits and package on offer for the role", "https://x.com/jobs/7"),
    ("Quản lý dự án", "mô tả công việc: triển khai giải pháp; yêu cầu: kinh nghiệm", "https://x.com/tuyen-dung/8"),
    ("Engineer", "salary competitive, apply with resume, experience preferred", "https://x.com/jobs/9"),
    ("zz", "salary mentioned once here in this borderline description text", "https://x.com/jobs/10"),
    ("Sales position open", "apply today", "https://x.com/jobs/11"),
    ("Good Job", "responsibilities listed here thoroughly for this role", "https://x.com/en/jobs/12"),
]


def test_job_validation_matches_reference(spark, ref_service):
    import asyncio

    from app.services.job_extraction_service import JobExtractionService
    from crawler_ai_spark.functions.validation import validate_job_expr

    expected = {}
    for title, desc, url in F7_CASES:
        verdict = asyncio.run(
            JobExtractionService._validate_job_with_ai(
                None, {"title": title, "description": desc}, url
            )
        )
        expected[(title, desc, url)] = verdict

    df = spark.createDataFrame(F7_CASES, "title STRING, description STRING, url STRING")
    rows = df.select(
        "title", "description", "url",
        validate_job_expr(F.col("title"), F.col("description"), F.col("url")).alias("ok"),
    ).collect()
    got = {(r.title, r.description, r.url): r.ok for r in rows}
    mismatches = {k: (got[k], expected[k]) for k in expected if got[k] != expected[k]}
    assert not mismatches, mismatches


# ---------------------------------------------------------------------------
# D4 — _are_titles_similar direct parity; F8 — job filters parity
# ---------------------------------------------------------------------------

SIM_PAIRS = [
    ("senior java developer", "senior java developer"),
    ("senior java developer", "java developer senior"),
    ("senior java developer", "senior java developer (remote)"),
    ("java developer", "java developer (định hướng lead team)"),
    ("senior backend engineer python", "senior backend engineer go"),
    ("business analyst", "data analyst"),
    ("of the and", "of the and"),
    ("a b c d", "b c d e"),
    ("one two three four five", "three four five six seven"),
    ("x y", "x y z"),
]


def test_titles_similar_matches_reference(spark, ref_service):
    from app.services.job_extraction_service import JobExtractionService

    from crawler_ai_spark.functions.jobs import _sig_tokens, titles_similar_expr

    expected = {
        (a, b): JobExtractionService._are_titles_similar(None, a, b) for a, b in SIM_PAIRS
    }
    df = spark.createDataFrame(SIM_PAIRS, "a STRING, b STRING")
    rows = df.select(
        "a", "b",
        titles_similar_expr(
            F.col("a"), F.col("b"), _sig_tokens(F.col("a")), _sig_tokens(F.col("b"))
        ).alias("sim"),
    ).collect()
    got = {(r.a, r.b): r.sim for r in rows}
    assert got == expected, {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}


F8_JOBS = [
    # (title, description, job_type, location, salary, posted_date)
    ("Senior Dev", "great role", "Full-time", "Hà Nội", "20,000,000 VND", "2024-01-02"),
    ("QA", "part time work", "", "TP.HCM", "", ""),
    ("Intern", "thực tập sinh", "Internship", "Da Nang", "5 triệu", "15/01/2024"),
    ("Remote Eng", "work from home ok", "Remote", "", "abc", "not a date"),
    ("Analyst", "hợp đồng 6 tháng", "Contract", "Cần Thơ", "1200 USD", "2020-01-01"),
]


def test_job_filters_match_reference(spark, ref_service):
    import asyncio

    from crawler_ai_spark.functions import jobfilters as JF

    svc = ref_service  # CareerPagesService has no filters; need JobExtractionService
    from app.services.job_extraction_service import JobExtractionService

    jes = JobExtractionService()
    # reference quirk: job_type_mappings/location_patterns are assigned
    # inside clear_all_cache() (mis-indented out of __init__); the API
    # entry points always call it before filtering, so parity does too
    jes.clear_all_cache()
    jobs = [
        {"title": t, "description": d, "job_type": jt, "location": loc,
         "salary": sal, "posted_date": pd_}
        for t, d, jt, loc, sal, pd_ in F8_JOBS
    ]
    df = spark.createDataFrame(
        F8_JOBS,
        "title STRING, description STRING, job_type STRING, location STRING, "
        "salary STRING, posted_date STRING",
    )

    scenarios = [
        dict(job_types_filter=["full-time", "remote"]),
        dict(job_types_filter=["internship"]),
        dict(location_filter=["hanoi", "ho_chi_minh"]),
        dict(salary_range={"min": 1000, "max": 100000}),
        dict(posted_date_filter="last_week"),
        dict(job_types_filter=["contract"], location_filter=["can_tho"],
             salary_range={"min": 0, "max": 2000}),
    ]
    for sc in scenarios:
        expected = {
            j["title"]
            for j in asyncio.run(jes._apply_job_filters(jobs, **sc))
        }
        sr = sc.get("salary_range")
        got_df = JF.apply_job_filters(
            df,
            job_types=sc.get("job_types_filter"),
            locations=sc.get("location_filter"),
            salary_min=(sr or {}).get("min", 0),
            salary_max=(sr or {}).get("max"),
            use_salary=sr is not None,
            posted_date_filter=sc.get("posted_date_filter"),
        )
        got = {r.title for r in got_df.collect()}
        assert got == expected, (sc, got, expected)


def test_staged_confidence_bitwise_matches_expr(spark):
    """with_career_confidence (the codegen-safe staged form every catalog
    query uses) must be BIT-identical to career_confidence_expr (the
    reference-shaped fold the test above pins to the reference): the
    aggregate-over-term-array left fold adds exactly 0.0 for every missed
    term, which is the IEEE identity on every reachable partial sum."""
    import struct

    from crawler_ai_spark.functions.confidence import (
        career_confidence_expr,
        with_career_confidence,
    )

    df = spark.createDataFrame([(u,) for u in C3_URLS], "url STRING")
    a = {
        r.url: r.c
        for r in df.select("url", career_confidence_expr(F.col("url")).alias("c")).collect()
    }
    b = {r.url: r.c for r in with_career_confidence(df, F.col("url")).collect()}
    assert set(a) == set(b)
    for u in a:
        assert struct.pack("d", a[u].confidence) == struct.pack("d", b[u].confidence), u
        assert (a[u].is_career_page, a[u].is_potential, a[u].rejection) == (
            b[u].is_career_page,
            b[u].is_potential,
            b[u].rejection,
        ), u
