"""P16 — anchor→container job extraction (reference
``container_extractor.py:1-226``), the reference's third embedded-job
strategy: find text nodes carrying job-ish indicator phrases, walk UP the
DOM to the smallest enclosing element that looks like one job card
(≥2 field indicators, < 2000 chars of text), then extract
title/type/location/salary/link per card.

Unlike the pattern path (jobcards.py) this is inherently a TREE
algorithm, so it runs as an Arrow-batched pandas UDF over a minimal DOM
built on stdlib ``html.parser`` (the sandbox has no bs4; the subset of
the bs4 API the reference touches — ``parent`` / ``get_text`` /
``find`` / ``find_all`` / attr access / content equality — is
implemented here and doubles as the stub DOM for the reference-exec
parity tests, which run the REAL reference methods against these nodes).

Scale shape: one pass over the pages, no shuffle; the per-row cost is
bounded by the 2000-char container cap and the ≤6-level walk. Output is
``array<struct>`` exploded to one row per extracted job.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urlparse

# --------------------------------------------------------------------------
# reference constants (container_extractor.py — cited per list)
# --------------------------------------------------------------------------

# :27-35 — anchor-text indicators (find_all(text=...) sweep)
JOB_INDICATORS = [
    "apply now", "apply", "ứng tuyển", "tuyển dụng",
    "download jd", "job description", "mô tả công việc",
    "fulltime", "part-time", "toàn thời gian", "bán thời gian",
    "hạn ứng tuyển", "deadline", "thời hạn",
    "mức lương", "salary", "lương",
    "nơi làm việc", "location", "địa điểm",
    "view details", "see more", "learn more", "join us", "work with us",
    "career opportunity",
]

# :68-71 — the container test (≥2 of these in the element's text)
CONTAINER_INDICATORS = [
    "fulltime", "part-time", "mức lương", "salary", "nơi làm việc",
    "location", "hạn ứng tuyển", "deadline", "apply", "ứng tuyển",
]

CONTAINER_MAX_TEXT = 2000   # :74
CONTAINER_MAX_DEPTH = 6     # :64

TITLE_CLASSES = ["title", "job-title", "position", "role"]  # :113

# :150-157 — location sweep; :169-174 — salary sweep (first match wins)
LOCATION_PATTERNS = [
    r"nơi làm việc[:\s]+([^\n]+)",
    r"location[:\s]+([^\n]+)",
    r"địa điểm[:\s]+([^\n]+)",
    r"work location[:\s]+([^\n]+)",
]
SALARY_PATTERNS = [
    r"mức lương[:\s]+([^\n]+)",
    r"salary[:\s]+([^\n]+)",
    r"lương[:\s]+([^\n]+)",
]

# :213-217 — validation keyword gate
VALIDATION_KEYWORDS = [
    "developer", "engineer", "analyst", "manager", "specialist",
    "consultant", "coordinator", "assistant", "director", "lead",
    "senior", "junior", "intern", "tester", "designer", "architect",
    "marketing", "sales", "finance", "accounting", "hr",
]

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


# --------------------------------------------------------------------------
# minimal DOM (the bs4 subset the reference algorithm touches)
# --------------------------------------------------------------------------


class TextNode(str):
    """A text node: a str that knows its parent (bs4 NavigableString)."""

    parent: "Node | None" = None


class Node:
    __slots__ = ("name", "attrs", "parent", "children")

    def __init__(self, name: str, attrs=None, parent: "Node | None" = None):
        self.name = name
        # bs4 normalizes valueless attributes (<span class>) to "";
        # html.parser yields None — keep bs4's behavior so e.g. the
        # class_ title rung never crashes on malformed HTML
        self.attrs = {k: ("" if v is None else v) for k, v in dict(attrs or {}).items()}
        self.parent = parent
        self.children: list = []

    # -- bs4 API subset ----------------------------------------------------

    def get_text(self) -> str:
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                stack.extend(reversed(c.children))
            else:
                out.append(str(c))
        return "".join(out)

    def _classes(self) -> list[str]:
        cls = self.attrs.get("class", "")
        return cls.split() if isinstance(cls, str) else list(cls)

    def _iter_tags(self):
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                yield c
                stack.extend(reversed(c.children))

    def find(self, name: str | None = None, class_=None, href: bool = False):
        for t in self._iter_tags():
            if name is not None and t.name != name:
                continue
            if class_ is not None and not any(class_(c) for c in t._classes()):
                continue
            if href and "href" not in t.attrs:
                continue
            return t
        return None

    def find_all(self, name: str | None = None, href: bool = False) -> list:
        return [
            t
            for t in self._iter_tags()
            if (name is None or t.name == name) and (not href or "href" in t.attrs)
        ]

    def find_all_text(self, predicate) -> list[TextNode]:
        """bs4 ``find_all(text=callable)`` — document-order text nodes."""
        out: list[TextNode] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                stack.extend(reversed(c.children))
            elif predicate(c):
                out.append(c)
        return out

    def __getitem__(self, key: str):
        return self.attrs[key]

    def __eq__(self, other) -> bool:
        """bs4 Tag equality is structural (same name, attrs, contents) —
        the reference's ``container not in containers`` dedup relies on
        it, so two byte-identical cards merge."""
        if self is other:
            return True
        if not isinstance(other, Node):
            return NotImplemented
        if self.name != other.name or self.attrs != other.attrs:
            return False
        if len(self.children) != len(other.children):
            return False
        return all(
            (a == b if isinstance(a, Node) else str(a) == str(b))
            and isinstance(a, Node) == isinstance(b, Node)
            for a, b in zip(self.children, other.children)
        )

    def __hash__(self):  # identity hash; equality is structural like bs4
        return id(self)

    def __repr__(self):
        return f"<{self.name} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, attrs, parent=self.stack[-1]))

    def handle_endtag(self, tag):
        if any(n.name == tag for n in self.stack[1:]):
            while self.stack[-1].name != tag:
                self.stack.pop()
            self.stack.pop()
        # unmatched end tag: ignored (bs4 html.parser behavior)

    def handle_data(self, data):
        t = TextNode(data)
        t.parent = self.stack[-1]
        self.stack[-1].children.append(t)


def parse_dom(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


# --------------------------------------------------------------------------
# the reference algorithm (container_extractor.py:36-226)
# --------------------------------------------------------------------------


def find_job_container(anchor) -> Node | None:
    """:61-79 — walk ≤6 levels up to the first element whose text has ≥2
    field indicators and stays under 2000 chars (the anchor itself is
    level 0)."""
    current, depth = anchor, 0
    while current is not None and depth < CONTAINER_MAX_DEPTH:
        text = current.get_text().lower() if hasattr(current, "get_text") else ""
        count = sum(1 for i in CONTAINER_INDICATORS if i in text)
        if count >= 2 and len(current.get_text()) < CONTAINER_MAX_TEXT:
            return current
        current = current.parent
        depth += 1
    return None


def _extract_title(container: Node) -> str:
    """:104-131 — h1..h6, then title-ish classes, then <strong>, then the
    first 4..99-char text line."""
    for tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        el = container.find(tag)
        if el:
            title = el.get_text().strip()
            if 3 < len(title) < 100:
                return title
    for cls in TITLE_CLASSES:
        el = container.find(class_=lambda x, c=cls: x and c in x.lower())
        if el:
            title = el.get_text().strip()
            if 3 < len(title) < 100:
                return title
    strong = container.find("strong")
    if strong:
        title = strong.get_text().strip()
        if 3 < len(title) < 100:
            return title
    for line in container.get_text().split("\n"):
        line = line.strip()
        if 3 < len(line) < 100:
            return line
    return ""


def _extract_job_type(container: Node) -> str:
    """:133-146."""
    text = container.get_text().lower()
    if "fulltime" in text or "full-time" in text or "toàn thời gian" in text:
        return "Full-time"
    if "part-time" in text or "parttime" in text or "bán thời gian" in text:
        return "Part-time"
    if "contract" in text or "hợp đồng" in text:
        return "Contract"
    if "intern" in text or "thực tập" in text:
        return "Internship"
    return "Full-time"


def _first_pattern(text: str, patterns: list[str], max_len: int = 100) -> str:
    for p in patterns:
        m = re.search(p, text, re.IGNORECASE)
        if m:
            v = m.group(1).strip()
            if 0 < len(v) < max_len:
                return v
    return ""


def company_from_url(url: str) -> str:
    """:187-196."""
    domain = urlparse(url).netloc.lower()
    domain = domain.replace("www.", "").replace("careers.", "").replace("jobs.", "")
    if "." in domain:
        return domain.split(".")[0].title()
    return domain.title()


def _extract_job_link(container: Node, page_url: str) -> str:
    """:198-207 — first absolute link, else the page itself."""
    for link in container.find_all("a", href=True):
        href = link["href"]
        if href and href.startswith("http"):
            return href
    return page_url


def _is_valid(title: str, description: str) -> bool:
    """:209-224 — min lengths + at least one job keyword anywhere."""
    title, description = title.strip(), description.strip()
    if len(title) < 3 or len(description) < 20:
        return False
    content = f"{title} {description}".lower()
    return any(k in content for k in VALIDATION_KEYWORDS)


def extract_container_jobs(html: str, page_url: str, max_jobs: int = 10) -> list[dict]:
    """The full anchor→container pipeline (:36-59): indicator text sweep
    → parent anchors → container walk-up → structural dedup → per-card
    field extraction → validity gate. ``job_index`` is the container
    ordinal (1-based), so invalid cards leave gaps — as the reference's
    ``enumerate(containers[:max_jobs], start=1)`` does."""
    root = parse_dom(html)
    anchors: list[Node] = []
    for indicator in JOB_INDICATORS:
        for t in root.find_all_text(lambda s, i=indicator: s and i in s.lower()):
            if t.parent is not None:
                anchors.append(t.parent)
    containers: list[Node] = []
    for anchor in anchors:
        c = find_job_container(anchor)
        if c is not None and not any(c == seen for seen in containers):
            containers.append(c)
    jobs: list[dict] = []
    for idx, container in enumerate(containers[:max_jobs], start=1):
        text = container.get_text()
        title = _extract_title(container)
        description = text.strip()
        if not _is_valid(title, description):
            continue
        jobs.append(
            {
                "job_index": idx,
                "title": title,
                "company": company_from_url(page_url),
                "location": _first_pattern(text, LOCATION_PATTERNS),
                "job_type": _extract_job_type(container),
                "salary": _first_pattern(text, SALARY_PATTERNS),
                "job_link": _extract_job_link(container, page_url),
                "description": description,
            }
        )
    return jobs


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_JOB_SCHEMA = (
    "array<struct<job_index:int,title:string,company:string,location:string,"
    "job_type:string,salary:string,job_link:string,description:string>>"
)


def container_jobs_udf(max_jobs: int = 10):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(html: "pd.Series", url: "pd.Series") -> "pd.Series":
        return pd.Series(
            [
                [
                    (
                        j["job_index"], j["title"], j["company"], j["location"],
                        j["job_type"], j["salary"], j["job_link"], j["description"],
                    )
                    for j in extract_container_jobs(h, u, max_jobs)
                ]
                for h, u in zip(html, url)
            ]
        )

    _run.__annotations__ = {"html": pd.Series, "url": pd.Series, "return": pd.Series}
    return pandas_udf(_run, _JOB_SCHEMA)
