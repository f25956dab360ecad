"""Property-based checks (hypothesis): the Spark expressions against
small INDEPENDENT Python implementations of the same documented rules —
random inputs sweep shapes the fixed fixtures don't.

Alphabet is constrained to ASCII + Vietnamese letters (no exotic unicode
whitespace): the Python-vs-Java \\s dialect boundary is documented in
jobcards.py and out of contract."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# W3 — robots.txt star-group parsing (regex vs an independent line scanner)
# --------------------------------------------------------------------------

_AGENTS = ["*", "Googlebot", "Bingbot", "Yandex"]
_PATHS = ["/a", "/login", "/x/y", "/news/", "/"]


def _robots_reference(body: str) -> list[str]:
    """RFC-9309 subset, implemented as a line scanner (not regex): groups
    of consecutive User-agent lines share the rule block that follows;
    return the union of the * groups' non-empty Disallow values."""
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    agents: list[str] = []
    rules: list[str] = []
    in_header = True
    for line in body.split("\n"):
        s = line.strip()
        low = s.lower()
        if low.startswith("user-agent:"):
            if not in_header:
                groups.append((agents, rules))
                agents, rules = [], []
                in_header = True
            agents.append(s.split(":", 1)[1].strip())
        elif low.startswith("disallow:"):
            in_header = False
            v = s.split(":", 1)[1].strip()
            if v:
                rules.append(v)
        elif s:
            in_header = False  # any other directive ends the header
    groups.append((agents, rules))
    out: set[str] = set()
    for ag, ru in groups:
        if "*" in ag:
            out.update(ru)
    return sorted(out)


@st.composite
def robots_body(draw):
    lines = []
    for _ in range(draw(st.integers(0, 8))):
        kind = draw(st.sampled_from(["ua", "dis", "dis_empty"]))
        if kind == "ua":
            lines.append(f"User-agent: {draw(st.sampled_from(_AGENTS))}")
        elif kind == "dis":
            lines.append(f"Disallow: {draw(st.sampled_from(_PATHS))}")
        else:
            lines.append("Disallow:")
    return "\n".join(lines)


@settings(max_examples=8, deadline=None)
@given(st.lists(robots_body(), min_size=1, max_size=24))
def test_robots_star_group_property(spark, bodies):
    from crawler_ai_spark.sources.robots import parse_robots

    # a leading UA line is required for rules to belong to a group; bodies
    # that START with dangling rules have no preceding header — the
    # reference scanner treats them as belonging to no group, and so does
    # the regex (it only matches after a star UA line). Both sides agree
    # by construction; no filtering needed.
    df = spark.createDataFrame(
        [(f"h{i}", b) for i, b in enumerate(bodies)], "host STRING, body STRING"
    )
    got = {
        r.host: sorted(r.disallow_prefixes)
        for r in parse_robots(df).collect()
    }
    want = {f"h{i}": _robots_reference(b) for i, b in enumerate(bodies)}
    assert got == want, {
        k: (got[k], want[k], bodies[int(k[1:])]) for k in got if got[k] != want[k]
    }


# --------------------------------------------------------------------------
# P12 — summarize expr vs the pure-Python twin
# --------------------------------------------------------------------------

_WORDS = ["lorem", "kỹ sư", "data", "x" * 40, "a.b", "end.", " ", "\t", "\n\n"]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=60), min_size=1, max_size=30))
def test_summarize_property(spark, docs):
    from crawler_ai_spark.functions.jobs import summarize_description_expr
    from crawler_ai_spark.functions.textnorm import summarize_description

    texts = ["".join(ws) for ws in docs]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r.i: r.s
        for r in df.select("i", summarize_description_expr(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == summarize_description(t), (repr(t), got[i])


# --------------------------------------------------------------------------
# S1 — fetch-error classifier vs an independent Python chain
# --------------------------------------------------------------------------

_MARKERS = [
    "timeout", "connection timeout", "dns", "name or service not known",
    "connection refused", "unreachable", "403", "forbidden", "blocked",
    "429", "rate limited", "404", "not found", "410", "gone",
    "boom", "ssl", " ", "HTTP", "error:",
]


def _classify_reference(msg):
    if msg is None:
        return None
    low = msg.lower()
    for cls, markers in [
        ("timeout", ("timeout", "connection timeout")),
        ("dns", ("dns", "name or service not known")),
        ("connection", ("connection refused", "unreachable")),
        ("blocked", ("403", "forbidden", "blocked")),
        ("rate_limited", ("429", "rate limited")),
        ("not_found", ("404", "not found", "410", "gone")),
    ]:
        if any(m in low for m in markers):
            return cls
    return "other"


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(st.sampled_from(_MARKERS), min_size=0, max_size=5)), min_size=1, max_size=40))
def test_error_classifier_property(spark, msgs):
    from crawler_ai_spark.functions.errors import fetch_error_class_expr

    texts = [None if m is None else " ".join(m).upper() for m in msgs]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i INT, t STRING")
    got = {
        r.i: r.c
        for r in df.select("i", fetch_error_class_expr(F.col("t")).alias("c")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _classify_reference(t), (t, got[i])


# --------------------------------------------------------------------------
# P9b — job-card extraction vs the REFERENCE EXECUTED on random pages
# --------------------------------------------------------------------------

_CARD_WORDS = [
    "Java Developer", "Solution Delivery Engineer", "Intern", "Thực tập sinh",
    "Business Analyst", "BD Manager", "Nhân viên kế toán", "Quản lý nhân sự",
    "Singapore Only", "Fully Remote", "Remote", "See Details", "See", "Apply",
    "View", "[Remote-HN]", "[Remote]", "Tuyển dụng", "12/05/2024:", "01/02/2025:",
    "mức lương: 2000 USD", "nơi làm việc: Hà Nội", "salary: $90k", "full-time",
    "parttime", "hợp đồng", "thực tập", "com", "và", "-", "một đoạn văn thường",
    "the quick brown fox", "Giám đốc", "kinh doanh", "Chuyên viên",
]


@st.composite
def card_page(draw):
    lines = []
    for _ in range(draw(st.integers(1, 7))):
        words = draw(st.lists(st.sampled_from(_CARD_WORDS), min_size=0, max_size=6))
        sep = draw(st.sampled_from([" ", "  "]))
        lines.append(sep.join(words))
    return "\n".join(lines)


@settings(max_examples=6, deadline=None)
@given(st.lists(card_page(), min_size=1, max_size=12))
def test_job_cards_random_reference_parity(spark, pages):
    """Random job-ish pages through BOTH the reference's
    _extract_jobs_from_cards (executed) and the Spark pipeline."""
    import sys
    import types

    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    for n in ("ClientSession", "ClientTimeout", "TCPConnector"):
        setattr(sys.modules["aiohttp"], n, object)
    sys.path.insert(0, "/root/reference")
    import logging

    logging.disable(logging.CRITICAL)
    from app.services.job_extraction_service import JobExtractionService

    from crawler_ai_spark.functions import jobcards as JC

    class Soup:
        def __init__(self, t):
            self._t = t

        def get_text(self):
            return self._t

    jes = JobExtractionService()
    fields = ("job_index", "title", "location", "job_type", "salary", "description")
    want = {
        i: [tuple(j.get(f) for f in fields) for j in jes._extract_jobs_from_cards(Soup(t), "https://x.vn/c")]
        for i, t in enumerate(pages)
    }
    df = spark.createDataFrame(list(enumerate(pages)), "doc_id INT, text STRING")
    rows = JC.dedup_job_cards(JC.extract_job_cards(df)).orderBy("doc_id", "job_index").collect()
    got: dict[int, list[tuple]] = {i: [] for i, _ in enumerate(pages)}
    for r in rows:
        got[r.doc_id].append(tuple(r[f] for f in fields))
    assert got == want, {
        i: {"got": got[i], "want": want[i], "page": pages[i]}
        for i in got
        if got[i] != want[i]
    }


# --------------------------------------------------------------------------
# F7b — element check vs the REFERENCE EXECUTED on random elements
# --------------------------------------------------------------------------

_EL_WORDS = [
    "job", "career", "hiring", "tuyển dụng", "việc làm", "developer",
    "full-time", "remote", "salary", "apply", "work", "experience",
    "mưa rơi trên phố", "sản phẩm", "the", "of", "x",
]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from(_EL_WORDS), min_size=0, max_size=12),
            st.booleans(),
            st.sampled_from(["", "job-card", "menu item", "career list"]),
            st.sampled_from(["", "career-1", "main"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_element_check_random_reference_parity(spark, cases):
    import sys
    import types

    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    for n in ("ClientSession", "ClientTimeout", "TCPConnector"):
        setattr(sys.modules["aiohttp"], n, object)
    sys.path.insert(0, "/root/reference")
    from app.services.element_checker import check_element_for_job

    from crawler_ai_spark.functions import elements as EL

    class El:
        def __init__(self, text, has_data, cls, id_):
            self._t = text
            self._a = {}
            if has_data:
                self._a["data-job"] = "1"
            if cls:
                self._a["class"] = cls.split()
            if id_:
                self._a["id"] = id_

        def get_text(self, strip=False):
            return self._t.strip() if strip else self._t

        def get(self, k, d=None):
            return self._a.get(k, d)

    texts = [(" ".join(ws), hd, cls, id_) for ws, hd, cls, id_ in cases]
    want = []
    for t, hd, cls, id_ in texts:
        r = check_element_for_job(El(t, hd, cls, id_), "https://x.vn/c")
        want.append((round(r["confidence"], 9), r["is_likely_job"], r["reason"]))
    df = spark.createDataFrame(
        [(i, t, hd, cls, id_) for i, (t, hd, cls, id_) in enumerate(texts)],
        "i INT, text STRING, hd BOOLEAN, cls STRING, idt STRING",
    )
    rows = (
        df.withColumn(
            "c",
            EL.element_job_check_expr(F.col("text"), F.col("hd"), F.col("cls"), F.col("idt")),
        )
        .select("i", "c.confidence", "c.is_likely_job", "c.reason")
        .orderBy("i")
        .collect()
    )
    for i, r in enumerate(rows):
        assert (round(r.confidence, 9), r.is_likely_job, r.reason) == want[i], (
            texts[i], (r.confidence, r.is_likely_job, r.reason), want[i],
        )


def test_lsh_signature_impls_agree(spark):
    """The BLAS-matmul signature (scale path) and the JVM expression
    signature (cross-check) must land every vector in the same buckets."""
    from pyspark.sql import functions as F

    from crawler_ai_spark.pipeline import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = SIM.with_lsh_signature(emb, 64, 8, 6, impl="jvm").select("vec_id", "sig")
    b = SIM.with_lsh_signature(emb, 64, 8, 6, impl="pandas").select(
        "vec_id", F.col("sig").alias("sig2")
    )
    assert a.join(b, "vec_id").where(F.col("sig") != F.col("sig2")).count() == 0
