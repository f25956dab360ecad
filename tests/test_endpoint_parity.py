"""S10/A7 parity — the last two reference endpoints, executed for real:

- /validate_job_details: the REAL Pydantic model
  (schemas.py:207-228) over the same variant matrix the catalog
  query synthesizes, plus the route's field-precedence error mapping
  (routes.py:431-434);
- /ai_agent_analysis: the REAL AdvancedJobFinder.ai_agent_analysis
  (advanced_job_finder.py:357-450) run via asyncio on a job list —
  exact equality for counts/distribution/average/recommended; the
  reference's top-5 uses hash-ordered ``list(set(...))[:5]``, so parity
  for those is membership + length (our engine determinizes to
  sorted-first-5 by the O6 policy)."""

from __future__ import annotations

import asyncio
import sys
import types

import pytest

sys.path.insert(0, "/root/reference")
# advanced_job_finder imports bs4/aiohttp at module level; the analysis
# methods under test never touch them (same stub as test_detector_parity)
for mod, attrs in (
    ("bs4", {"BeautifulSoup": object}),
    ("aiohttp", {"ClientSession": object, "ClientTimeout": object, "TCPConnector": object}),
):
    m = sys.modules.setdefault(mod, types.ModuleType(mod))
    for k, v in attrs.items():
        setattr(m, k, v)

pydantic = pytest.importorskip("pydantic")
from app.models.schemas import JobDetailValidationRequest  # noqa: E402


def _variants():
    for doc_id in range(24):
        n = str(doc_id % 37)
        link = [
            f"https://co{n}.example/j",
            f"http://co{n}.example/j",
            "",
            f"notaurl{n}",
        ][doc_id % 4]
        desc = [
            f"A sufficiently long description {n}",
            "short",
            "         ",
        ][doc_id % 3]
        yield doc_id, link, desc


def test_validate_job_details_parity():
    for doc_id, link, desc in _variants():
        try:
            JobDetailValidationRequest(
                job_name=f"Job {doc_id}",
                job_description=desc,
                job_link=link,
                crawl_company_id="c1",
            )
            ref_valid, ref_field = True, None
        except Exception as e:  # pydantic.ValidationError
            ref_valid = False
            s = str(e)
            ref_field = "job_link" if "job_link" in s else (
                "job_description" if "job_description" in s else "unknown"
            )
        link_ok = link.startswith(("http://", "https://"))
        desc_ok = len(desc.strip()) >= 10
        ours_valid = link_ok and desc_ok
        ours_field = None if ours_valid else ("job_link" if not link_ok else "job_description")
        assert ours_valid == ref_valid, (doc_id, link, desc)
        assert ours_field == ref_field, (doc_id, link, desc)


def test_boundary_description_lengths():
    # exactly 10 chars after strip is VALID (validator: len < 10 fails)
    JobDetailValidationRequest(
        job_name="j", job_description="  abcdefghij  ", job_link="https://x", crawl_company_id="c"
    )
    with pytest.raises(Exception):
        JobDetailValidationRequest(
            job_name="j", job_description="  abcdefghi  ", job_link="https://x", crawl_company_id="c"
        )


JOBS = [
    {"title": f"T{i}", "company": f"C{i % 4}", "location": f"L{i % 3}",
     "job_type": ["Full-time", "Part-time", ""][i % 3], "salary": "",
     "description": "d" * 30, "quality_score": (i * 7) % 101 / 100.0}
    for i in range(11)
]


def test_ai_agent_summary_parity():
    from app.services.advanced_job_finder import AdvancedJobFinder

    res = asyncio.run(AdvancedJobFinder().ai_agent_analysis(JOBS, "summary"))
    assert res["success"] and res["total_jobs_analyzed"] == len(JOBS)
    r = res["result"]
    companies = {j["company"] for j in JOBS}
    locations = {j["location"] for j in JOBS}
    assert r["summary"] == f"Found {len(JOBS)} jobs across {len(companies)} companies"
    # hash-ordered top-5: membership + length parity (we determinize)
    assert set(r["top_companies"]) <= companies
    assert len(r["top_companies"]) == min(5, len(companies))
    assert set(r["top_locations"]) <= locations
    assert len(r["top_locations"]) == min(5, len(locations))
    # distribution skips empty keys; exact dict parity
    expected = {}
    for j in JOBS:
        if j["job_type"]:
            expected[j["job_type"]] = expected.get(j["job_type"], 0) + 1
    assert r["job_type_distribution"] == expected
    assert r["average_quality_score"] == pytest.approx(
        sum(j["quality_score"] for j in JOBS) / len(JOBS)
    )


def test_ai_agent_recommendations_and_empty():
    from app.services.advanced_job_finder import AdvancedJobFinder

    f = AdvancedJobFinder()
    rec = asyncio.run(f.ai_agent_analysis(JOBS, "recommendations"))
    assert rec["result"]["recommended_jobs"] == [j["title"] for j in JOBS[:5]]
    empty = asyncio.run(f.ai_agent_analysis([], "summary"))
    assert empty["success"] is False
