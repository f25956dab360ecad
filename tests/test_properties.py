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
