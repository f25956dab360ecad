"""P9b parity: extract_job_cards + dedup_job_cards vs the REFERENCE'S OWN
`_extract_jobs_from_cards` (job_extraction_service.py:2192-2290, which runs
`_extract_jobs_by_patterns`, `_parse_job_text` and
`_deduplicate_jobs_by_title`), executed directly with a stub soup object
exposing get_text() — the test_detector_parity.py technique.

Texts use ASCII whitespace only: Python's regex \\s is unicode-wide while
Java/RE2's is ASCII, a documented (jobcards.py docstring) dialect boundary.
"""

from __future__ import annotations

import sys
import types

import pytest

from crawler_ai_spark.functions import jobcards as JC

URL = "https://www.acme-corp.vn/careers"

PAGES = list(enumerate(
    [b for b in JC.CARD_FIXTURE_BLOBS if b]
    + [
        # multi-pattern overlaps: specific title patterns 1/12 vs generic 26
        "Thực tập sinh Business Analyst\nThực tập sinh Hành chính nhân sự\n"
        "mức lương: 5 triệu\nfull-time",
        # BiPlus pair (patterns 5/14) + date pattern 23
        "BiPlus Internship Program 2024\nBiPlus Intern\n01/03/2024: Hạn nộp hồ sơ",
        # order-matters pair: pattern 6 fires before 15 on the same text
        "BD Manager - Quản lý nhóm phát triển kinh doanh\n"
        "Business Development Assistant\nAM - Account Management",
        # pattern 19 carrying 'Remote' into the location override
        "Platform Engineer Remote positions Apply\nTechnical Solution Manager",
        # pattern 21 + 25 + job-type keywords
        "[Remote] Frontend Engineer - React\nQuản lý nhân sự\nTrợ lý kinh doanh\n"
        "bán thời gian\nProject Management",
        # no job content at all
        "chào mừng đến với trang chủ của chúng tôi\nliên hệ: 024 3835 0000",
    ]
))


class StubSoup:
    def __init__(self, text: str):
        self._text = text

    def get_text(self):
        return self._text


@pytest.fixture(scope="module")
def ref_jes():
    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    sys.modules["aiohttp"].ClientSession = object
    sys.modules["aiohttp"].ClientTimeout = object
    sys.modules["aiohttp"].TCPConnector = object
    sys.path.insert(0, "/root/reference")
    from app.services.job_extraction_service import JobExtractionService

    return JobExtractionService()


FIELDS = ("job_index", "title", "location", "job_type", "salary", "description")


def _spark_jobs(spark, dedup: bool):
    df = spark.createDataFrame(PAGES, "doc_id INT, text STRING")
    out = JC.extract_job_cards(df)
    if dedup:
        out = JC.dedup_job_cards(out)
    rows = out.orderBy("doc_id", "job_index").collect()
    got: dict[int, list[tuple]] = {i: [] for i, _ in PAGES}
    for r in rows:
        got[r.doc_id].append(tuple(r[f] for f in FIELDS))
    return got


def test_extract_jobs_from_cards_matches_reference(spark, ref_jes):
    """Full reference path (patterns + parse + greedy dedup) — field-exact."""
    expected: dict[int, list[tuple]] = {}
    for i, text in PAGES:
        jobs = ref_jes._extract_jobs_from_cards(StubSoup(text), URL)
        expected[i] = [
            tuple(j.get(f if f != "job_index" else "job_index") for f in FIELDS)
            for j in jobs
        ]
    got = _spark_jobs(spark, dedup=True)
    mismatches = {
        i: {"got": got[i], "want": expected[i]}
        for i, _ in PAGES
        if got[i] != expected[i]
    }
    assert not mismatches, mismatches


def test_extract_stage_matches_reference_prefuzzy(spark, ref_jes):
    """The pre-fuzzy stage alone vs _extract_jobs_by_patterns run with the
    reference's comprehensive pattern list = ours (checks CARD_PATTERNS is
    a faithful transcription, including order)."""
    expected: dict[int, list[tuple]] = {}
    for i, text in PAGES:
        jobs = ref_jes._extract_jobs_by_patterns(text, list(JC.CARD_PATTERNS), URL, "comprehensive")
        expected[i] = [tuple(j.get(f) for f in FIELDS) for j in jobs]
    got = _spark_jobs(spark, dedup=False)
    mismatches = {
        i: {"got": got[i], "want": expected[i]}
        for i, _ in PAGES
        if got[i] != expected[i]
    }
    assert not mismatches, mismatches


def test_distribution_is_not_degenerate(spark, ref_jes):
    """Coverage probe (the doc_exact_dups lesson): the parity above must
    not be agreement on empty/trivial sets."""
    got = _spark_jobs(spark, dedup=True)
    pre = _spark_jobs(spark, dedup=False)
    n_jobs = sum(len(v) for v in got.values())
    n_pre = sum(len(v) for v in pre.values())
    assert n_jobs >= 15, got
    assert n_pre > n_jobs, "greedy dedup dropped nothing — fuzzy path untested"
    pages_with_jobs = sum(1 for v in got.values() if v)
    assert pages_with_jobs >= 8
    assert any(not v for v in got.values()), "need a no-job control page"
    locations = {j[2] for v in got.values() for j in v}
    assert {"Singapore Only", "Remote"} <= locations
    types_ = {j[3] for v in got.values() for j in v}
    assert "Internship" in types_ and "Full-time" in types_
