"""P16 parity — anchor→container extraction vs the REAL reference code.

``container_extractor.py`` only imports bs4 inside its (async, fetching)
``extract`` entry point; every algorithmic method — ``_find_job_container``,
``_extract_job_from_container`` (and its field extractors),
``_is_valid_job_data`` — is sync and DOM-generic, so we execute the
reference methods directly against domlite's mini-DOM and compare with
our ``extract_container_jobs`` on the same HTML. The anchor sweep
(``find_all(text=...)``) is replayed identically on both sides."""

from __future__ import annotations

import sys

import pytest

from crawler_ai_spark.functions import domlite as DL

sys.path.insert(0, "/root/reference")
from app.services.container_extractor import ContainerExtractor  # noqa: E402


def reference_extract(html: str, url: str, max_jobs: int = 10) -> list[dict]:
    """The reference pipeline (container_extractor.py:36-59) with the
    REAL methods, minus the fetch: same indicator sweep, then the
    reference's container walk, dedup, extraction, and validity gate."""
    ce = ContainerExtractor()
    root = DL.parse_dom(html)
    anchors = []
    for indicator in DL.JOB_INDICATORS:
        for t in root.find_all_text(lambda s, i=indicator: s and i in s.lower()):
            if t.parent is not None:
                anchors.append(t.parent)
    containers = []
    for anchor in anchors:
        c = ce._find_job_container(anchor)
        if c is not None and not any(c == seen for seen in containers):
            containers.append(c)
    jobs = []
    for idx, container in enumerate(containers[:max_jobs], start=1):
        jd = ce._extract_job_from_container(container, url, idx)
        if jd and ce._is_valid_job_data(jd):
            jobs.append(jd)
    return jobs


FIELDS = ("job_index", "title", "company", "location", "job_type", "salary",
          "job_link", "description")


def _ours(html, url, max_jobs=10):
    return [
        tuple(j[f] for f in FIELDS)
        for j in DL.extract_container_jobs(html, url, max_jobs)
    ]


def _theirs(html, url, max_jobs=10):
    return [
        tuple(j[f] for f in FIELDS)
        for j in reference_extract(html, url, max_jobs)
    ]


URL = "https://www.acme.example/careers"


def test_parity_on_catalog_templates():
    from crawler_ai_spark.catalog import _CONTAINER_TEMPLATES

    for n in ("0", "7", "36"):
        for tpl in _CONTAINER_TEMPLATES:
            html = tpl.replace("{N}", n)
            url = f"https://www.site{n}.vn/careers"
            assert _ours(html, url) == _theirs(html, url)
    # the valid templates produce output (non-degenerate probe)
    assert _ours(_CONTAINER_TEMPLATES[0].replace("{N}", "3"),
                 "https://www.site3.vn/careers")


CARD = """<div class="job">
<h4>Backend Engineer X</h4>
<p>Apply now</p>
<p>Salary: 1500 USD</p>
<a href="https://acme.example/j/1">See more</a>
</div>"""

EDGE_PAGES = [
    # oversized container: >2000 chars of text inside the card → rejected
    "<html><body><div class='job'><h4>Big Engineer</h4><p>Apply now</p>"
    "<p>Salary: big</p><p>" + "x" * 2100 + "</p></div></body></html>",
    # two byte-identical cards: bs4 structural equality merges them
    "<html><body><p>" + "z " * 1200 + "</p>" + CARD + CARD + "</body></html>",
    # title too long (>=100 chars) falls through the h-tag rung
    "<html><body><p>" + "z " * 1200 + "</p><div class='job'><h4>"
    + "Engineer " * 15 + "</h4>Short Engineer Line<p>Apply now</p>"
    "<p>Salary: 99</p></div></body></html>",
    # misnested / unclosed tags
    "<html><body><p>" + "z " * 1200 + "</p><div class='job'><h4>Night Engineer"
    "</h4><p>Apply now<p>Location: Hn</p><em>Salary: 5</div></body></html>",
    # container found at depth >1 (anchor nested in spans)
    "<html><body><p>" + "z " * 1200 + "</p><div class='job'><h5>Deep Analyst</h5>"
    "<div><span><b>Apply now</b></span></div><p>Salary: 7</p></div></body></html>",
    # no containers at all
    "<html><body><p>just weather talk here</p></body></html>",
    # valueless class attribute (<span class>) — bs4 normalizes to "";
    # must not crash the class_ title rung
    "<html><body><p>" + "z " * 1200 + "</p><div class='job'><span class>decor"
    "</span><div class='job-title'>Senior Engineer</div><p>Apply now</p>"
    "<p>Salary: 100</p></div></body></html>",
]


@pytest.mark.parametrize("html", EDGE_PAGES)
def test_parity_on_edge_pages(html):
    assert _ours(html, URL) == _theirs(html, URL)


def test_max_jobs_cap_parity():
    cards = "".join(
        CARD.replace("Backend Engineer X", f"Backend Engineer {i}").replace(
            "/j/1", f"/j/{i}"
        )
        for i in range(6)
    )
    html = "<html><body><p>" + "z " * 1200 + "</p>" + cards + "</body></html>"
    for cap in (2, 4, 10):
        ours, theirs = _ours(html, URL, cap), _theirs(html, URL, cap)
        assert ours == theirs
        assert len(ours) == min(cap, 6)


# -- random-page property parity (the shared-bug net: both engines, one
# random structured input, field-for-field equality) ----------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_TITLE_WORDS = ["Senior", "Junior", "Backend", "Engineer", "Analyst",
                "Barista", "Clerk", "Designer", "Q", "Lead"]
_FIELD_LINES = [
    "<p>Apply now</p>", "<p>Salary: {i} USD</p>", "<p>Location: City {i}</p>",
    "<p>Deadline: soon</p>", "<p>Full-time</p>", "<p>Contract</p>",
    "<p>View details</p>", "<p>plain words only</p>",
]
_TITLE_WRAP = ["<h3>{t}</h3>", "<h5>{t}</h5>", "<div class='job-title'>{t}</div>",
               "<strong>{t}</strong>", "{t}", ""]


@st.composite
def container_page(draw):
    n_cards = draw(st.integers(0, 4))
    cards = []
    for i in range(n_cards):
        title = " ".join(draw(st.lists(st.sampled_from(_TITLE_WORDS), min_size=1, max_size=4)))
        wrap = draw(st.sampled_from(_TITLE_WRAP)).replace("{t}", f"{title} {i}")
        lines = draw(st.lists(st.sampled_from(_FIELD_LINES), min_size=0, max_size=5))
        link = draw(st.sampled_from(
            ["", f"<a href='https://x.example/j/{i}'>See more</a>",
             f"<a href='/rel/{i}'>See more</a>"]))
        nest = draw(st.booleans())
        body = "\n".join([wrap] + [ln.replace("{i}", str(i)) for ln in lines] + [link])
        card = f"<div class='job'>\n{body}\n</div>"
        cards.append(f"<div class='wrap'>\n{card}\n</div>" if nest else card)
    filler = "<p>" + "z " * draw(st.sampled_from([900, 1200])) + "</p>"
    return "<html><body>\n" + filler + "\n" + "\n".join(cards) + "\n</body></html>"


@settings(max_examples=25, deadline=None)
@given(container_page(), st.sampled_from([1, 3, 10]))
def test_random_page_parity(html, cap):
    assert _ours(html, URL, cap) == _theirs(html, URL, cap)


def test_company_from_url_parity():
    ce = ContainerExtractor()
    for url in (
        "https://www.acme.example/careers",
        "https://careers.foo.vn/x",
        "https://jobs.bar.com/",
        "http://plainhost/x",
        "https://www.sub.multi.part.org/",
    ):
        assert DL.company_from_url(url) == ce._extract_company_from_url(url)
