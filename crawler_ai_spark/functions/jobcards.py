"""P9b — embedded job-card extraction: the reference's pattern-based path
for career pages WITHOUT per-job URLs (`_extract_jobs_from_cards` +
`_extract_jobs_by_patterns` + `_parse_job_text`,
reference job_extraction_service.py:2192-2380), plus the greedy
title-similarity dedup it finishes with (`_deduplicate_jobs_by_title`,
:2116-2161).

Re-expression notes (Spark-first, no Python on the hot path):

- the 26 ordered patterns (18 exact titles + 8 generic shapes — ORDER
  MATTERS, :2199-2228) become one ``regexp_extract_all`` per pattern,
  concatenated in order; ``posexplode`` turns (pattern order, match order)
  into a sortable ``pos`` so "first occurrence wins" dedup is a window,
  not a loop.
- the one lookahead (`(Solution Delivery Engineer)(?!\\s+Intern)`,
  :2203) runs natively in Java regex; the RE2/DuckDB oracle emulates it
  as `Solution Delivery Engineer(\\s+Intern)?` + keep-iff-no-suffix
  (equivalent: the optional greedy suffix captures exactly the texts the
  lookahead rejects).
- title extraction (:2352-2380) is line logic → split + filter +
  element_at; clean-title, job type, location, salary, description
  (:2400-2466) are regexp/when chains.
- the greedy similarity dedup (kept-set grows as the list is scanned,
  non-transitive rule, :2139-2161) is per-page sequential by nature —
  expressed as a JVM ``aggregate`` over the page's (small) collected job
  array, NOT a UDF and NOT a driver loop: each page folds independently,
  so the operator stays partition-parallel at any corpus size.

Flag dialects: Python compiles with DOTALL|IGNORECASE (unicode folding,
unicode \\s); Java gets ``(?siu)`` (unicode folding, ASCII \\s); RE2 gets
``(?si)`` (unicode folding, ASCII \\s). Divergence is confined to exotic
whitespace, which the fixtures exclude (documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# the ordered pattern list (job_extraction_service.py:2199-2228, verbatim —
# the patterns ARE the extractor's semantics, like constants.py's keyword
# lists). Index 3 carries the negative lookahead.
# --------------------------------------------------------------------------

CARD_PATTERNS: list[str] = [
    r"(Thực tập sinh Business Analyst)",
    r"(Technical Solution Manager)",
    r"(Solution Delivery Engineer Intern)",
    r"(Solution Delivery Engineer)(?!\s+Intern)",
    r"(BiPlus Intern)",
    r"(BD Manager)",
    r"(Business Development Assistant)",
    r"(Java Developer \(định hướng lead team\))",
    r"(Java Developer)",
    r"(Flutter Developer)",
    r"(Quản lý nhân sự)",
    r"(Thực tập sinh Hành chính nhân sự)",
    r"(AM - Account Management)",
    r"(BiPlus Internship Program \d{4})",
    r"(BD Manager - Quản lý nhóm phát triển kinh doanh)",
    r"(Project Management)",
    r"(Nhân viên kế toán)",
    r"(Trợ lý kinh doanh)",
    r"([A-Z][a-zA-Z\s]+(?:Developer|Engineer|Manager|Analyst|Specialist|Assistant|Designer))"
    r"[^.\n]*?(?:Singapore Only|Fully Remote|Remote)[^.\n]*?(?:See Details|See|Apply|View)",
    r"\[Remote-HN\]\s+([^-\n]+)",
    r"\[Remote\]\s+([^-\n]+)",
    r"Tuyển dụng.*?(\d{2}/\d{2}/\d{4}):\s*([^-\n]+)",
    r"(\d{2}/\d{2}/\d{4}):\s*([^-\n]+)",
    r"([A-Z][^-\n]*(?:Developer|Engineer|Manager|Analyst|Specialist|Marketing|Test|Freelancer|Assistant|Intern))",
    r"(Chuyên viên|Nhân viên|Quản lý|Trưởng phòng|Giám đốc|Phó giám đốc)\s+[A-Za-zÀ-ỹ\s]+",
    r"(Thực tập sinh|Intern|Trainee|Apprentice)\s+[A-Za-zÀ-ỹ\s]+",
]

_LOOKAHEAD_IDX = 3
_LOOKAHEAD_RE2 = r"Solution Delivery Engineer(\s+Intern)?"
_LOOKAHEAD_KEEP = "solution delivery engineer"  # lower(match) must equal this

# Cheap pre-gates, aligned with CARD_PATTERNS: a pattern's regex runs only
# when lower(text) CONTAINS one of these literals. Each gate is IMPLIED by
# any match of its pattern ((?iu) simple folding == lower() for this
# alphabet), so gating is a pure optimization — the generic patterns
# backtrack O(len²) per row, and on keyword-free text the gate skips them.
# None = ungated (no safe cheap literal, e.g. the bare date pattern).
CARD_PATTERN_GATES: list[tuple[str, ...] | None] = [
    ("thực tập sinh business analyst",),
    ("technical solution manager",),
    ("solution delivery engineer intern",),
    ("solution delivery engineer",),
    ("biplus intern",),
    ("bd manager",),
    ("business development assistant",),
    ("java developer (định hướng lead team)",),
    ("java developer",),
    ("flutter developer",),
    ("quản lý nhân sự",),
    ("thực tập sinh hành chính nhân sự",),
    ("am - account management",),
    ("biplus internship program",),
    ("bd manager - quản lý nhóm phát triển kinh doanh",),
    ("project management",),
    ("nhân viên kế toán",),
    ("trợ lý kinh doanh",),
    ("singapore only", "fully remote", "remote"),
    ("[remote-hn]",),
    ("[remote]",),
    ("tuyển dụng",),
    None,
    ("developer", "engineer", "manager", "analyst", "specialist",
     "marketing", "test", "freelancer", "assistant", "intern"),
    ("chuyên viên", "nhân viên", "quản lý", "trưởng phòng",
     "giám đốc", "phó giám đốc"),
    ("thực tập sinh", "intern", "trainee", "apprentice"),
]

TITLE_KEYWORDS = (
    "developer", "engineer", "manager", "analyst",
    "specialist", "assistant", "designer",
)  # :2365
TITLE_SHAPE_RX = (
    r"^[A-Z][a-zA-Z\s]+"
    r"(?:Assistant|Designer|Engineer|Developer|Manager|Analyst|Specialist)"
)  # :2368

LOCATION_PATTERNS = (
    r"nơi làm việc[:\s]+([^\n]+)",
    r"location[:\s]+([^\n]+)",
    r"địa điểm[:\s]+([^\n]+)",
    r"work location[:\s]+([^\n]+)",
)  # :2413-2418
LOCATION_CLEAN_RX = (
    r"(Download JD|Apply now|Xem Thêm|Số lượng tuyển|Junior|Senior|Tuyển gấp).*$"
)  # :2424

SALARY_PATTERNS = (
    r"mức lương[:\s]+([^\n]+)",
    r"salary[:\s]+([^\n]+)",
    r"lương[:\s]+([^\n]+)",
)  # :2437-2440

DESCRIPTION_SKIP_WORDS = (
    "năng lực phù hợp", "địa điểm phù hợp", "search", "filter", "navigation",
)  # :2455


# --------------------------------------------------------------------------
# deterministic card-blob fixtures (appended to document text by doc_id % 5)
# — chosen to exercise: the lookahead (variant 1), the reference's own
# "(định hướng lead team)" non-dup example (0), ^com + Singapore Only strip
# (0), multi-line DOTALL matches carrying location/salary lines (3),
# overlapping generic-pattern dups (1, 2), and a no-blob control (4).
# --------------------------------------------------------------------------

CARD_FIXTURE_BLOBS: list[str] = [
    # "Mức lương: 25-35" sits right above the card line ON PURPOSE — its
    # digits/colon stop pattern 19's newline-crossing [a-zA-Z\s]+ class, so
    # the match's title line stays the card line and keeps 'Singapore Only'
    "Java Developer (định hướng lead team)\nfull-time\nJava Developer\n"
    "See Details\nMức lương: 25-35 triệu\n"
    "com Senior QA Engineer Singapore Only roles See Details",
    "Solution Delivery Engineer Intern\nSolution Delivery Engineer\nhợp đồng 12 tháng",
    "Tuyển dụng kỹ sư tháng năm 12/05/2024: Kế toán trưởng khối văn phòng\n"
    "[Remote-HN] Golang Backend Developer - upto 3000 USD\n"
    "Nhân viên kế toán tổng hợp\nparttime",
    "Tuyển dụng gấp\nmức lương: 2000 USD\nnơi làm việc: Đà Nẵng Xem Thêm nhé\n"
    "hạn 01/02/2025: Senior Data Engineer",
    "",
]


# --------------------------------------------------------------------------
# column builders
# --------------------------------------------------------------------------


def card_matches_expr(text: Column) -> Column:
    """ARRAY<STRING> of full-match (group 0) job_texts, in (pattern order,
    match order) — exactly finditer order across the ordered pattern list
    (:2247-2251). Pure JVM: one regexp_extract_all per pattern, each behind
    its contains-gate (see CARD_PATTERN_GATES — identical output, ~8× less
    regex work on natural text)."""
    low = F.lower(text)
    empty = F.array().cast("array<string>")
    arrs = []
    for p, gates in zip(CARD_PATTERNS, CARD_PATTERN_GATES):
        extract = F.regexp_extract_all(text, F.lit("(?siu)" + p), F.lit(0))
        if gates is None:
            arrs.append(extract)
            continue
        hit = F.lit(False)
        for g in gates:
            hit = hit | low.contains(g)
        arrs.append(F.when(hit, extract).otherwise(empty))
    return F.concat(*arrs)


def _sized(line: Column) -> Column:
    return (F.length(line) > 5) & (F.length(line) < 100)


def title_from_text_expr(job_text: Column) -> Column:
    """_extract_title_from_text (:2352-2380): first 5<len<100 line with a
    job keyword or the title shape; else the first 5<len<100 line; else ''."""
    lines = F.transform(F.split(job_text, "\n"), lambda l: F.trim(l))

    def _kw(line: Column) -> Column:
        low = F.lower(line)
        hit = F.lit(False)
        for k in TITLE_KEYWORDS:
            hit = hit | low.contains(k)
        return hit

    good = F.filter(lines, lambda l: _sized(l) & (_kw(l) | l.rlike(TITLE_SHAPE_RX)))
    fallback = F.filter(lines, _sized)
    # try_element_at: NULL (not ANSI error) when the filtered list is empty
    return F.coalesce(
        F.try_element_at(good, F.lit(1)), F.try_element_at(fallback, F.lit(1)), F.lit("")
    )


def clean_title_expr(title: Column) -> Column:
    """The :2260-2266 clean chain: strip trailing location/action words
    (NOT bare 'Remote' — reference quirk), leading 'com', collapse ws."""
    t = F.trim(F.regexp_replace(title, r"(Singapore Only|Fully Remote|See Details|See)$", ""))
    t = F.trim(F.regexp_replace(t, r"^com\s*", ""))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def card_location_expr(title: Column, job_text: Column) -> Column:
    """Location: the card path overrides from the ORIGINAL title
    (:2276-2281, case-sensitive substring checks) and otherwise keeps
    _extract_location_from_text's first valid pattern hit (:2406-2430)."""
    chain = None
    for p in LOCATION_PATTERNS:
        raw = F.trim(F.regexp_extract(job_text, "(?iu)" + p, 1))
        cleaned = F.trim(F.regexp_replace(raw, "(?iu)" + LOCATION_CLEAN_RX, ""))
        cand = F.when((F.length(cleaned) > 0) & (F.length(cleaned) < 100), cleaned)
        chain = cand if chain is None else F.coalesce(chain, cand)
    from_text = F.coalesce(chain, F.lit(""))
    return (
        F.when(title.contains("Singapore Only"), F.lit("Singapore Only"))
        .when(title.contains("Fully Remote"), F.lit("Fully Remote"))
        .when(title.contains("Remote"), F.lit("Remote"))
        .otherwise(from_text)
    )


def job_type_expr(job_text: Column) -> Column:
    """_extract_job_type_from_text (:2383-2404), first hit in order."""
    t = F.lower(job_text)
    return (
        F.when(
            t.contains("fulltime") | t.contains("full-time") | t.contains("toàn thời gian"),
            F.lit("Full-time"),
        )
        .when(
            t.contains("part-time") | t.contains("parttime") | t.contains("bán thời gian"),
            F.lit("Part-time"),
        )
        .when(t.contains("contract") | t.contains("hợp đồng"), F.lit("Contract"))
        .when(t.contains("intern") | t.contains("thực tập"), F.lit("Internship"))
        .otherwise(F.lit("Full-time"))
    )


def card_salary_expr(job_text: Column) -> Column:
    """_extract_salary_from_text (:2433-2449), first valid hit wins."""
    chain = None
    for p in SALARY_PATTERNS:
        raw = F.trim(F.regexp_extract(job_text, "(?iu)" + p, 1))
        cand = F.when((F.length(raw) > 0) & (F.length(raw) < 100), raw)
        chain = cand if chain is None else F.coalesce(chain, cand)
    return F.coalesce(chain, F.lit(""))


def clean_description_expr(job_text: Column) -> Column:
    """_clean_job_description (:2451-2466): drop empty lines and lines
    containing a nav/filter skip word; rejoin."""
    lines = F.transform(F.split(job_text, "\n"), lambda l: F.trim(l))

    def _keep(line: Column) -> Column:
        low = F.lower(line)
        skip = F.lit(False)
        for w in DESCRIPTION_SKIP_WORDS:
            skip = skip | low.contains(w)
        return (line != "") & ~skip

    return F.trim(F.array_join(F.filter(lines, _keep), "\n"))


# --------------------------------------------------------------------------
# the operator: page text -> unique job rows
# --------------------------------------------------------------------------


def extract_job_cards(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """_extract_jobs_by_patterns (:2245-2290) as a DataFrame op: ordered
    pattern matches → parse each job_text → drop empty titles → first
    occurrence per (page, clean_title) wins → 1-based job_index in match
    order. One posexplode + one window shuffle on (page, clean_title) —
    text never joins anything, so the op scales as a linear scan."""
    # The pattern scan is CPU-bound (~5-10 ms/page), not IO-bound; hashing
    # on the page id means HashPartitioning(id) satisfies both downstream
    # windows' clustering ((id, title) and (id)) — sorts only, no exchange
    from crawler_ai_spark.session import spread_to_cores

    pages = spread_to_cores(pages, id_col)
    matched = pages.select(
        F.col(id_col),
        F.posexplode(card_matches_expr(F.col(text_col))).alias("pos", "job_text"),
    )
    parsed = matched.withColumn("raw_title", title_from_text_expr(F.col("job_text"))).where(
        F.col("raw_title") != ""
    )
    parsed = parsed.withColumn("title", clean_title_expr(F.col("raw_title")))
    w_dup = Window.partitionBy(id_col, "title").orderBy("pos")
    w_idx = Window.partitionBy(id_col).orderBy("pos")
    return (
        parsed.withColumn("_rn", F.row_number().over(w_dup))
        .where(F.col("_rn") == 1)
        .withColumn("job_index", F.row_number().over(w_idx))
        .select(
            F.col(id_col),
            "job_index",
            "title",
            card_location_expr(F.col("raw_title"), F.col("job_text")).alias("location"),
            job_type_expr(F.col("job_text")).alias("job_type"),
            card_salary_expr(F.col("job_text")).alias("salary"),
            clean_description_expr(F.col("job_text")).alias("description"),
        )
    )


# --------------------------------------------------------------------------
# greedy title-similarity dedup (_deduplicate_jobs_by_title, :2116-2161)
# --------------------------------------------------------------------------

GENERIC_SINGLE_TITLES = (
    "engineer", "developer", "manager", "analyst", "assistant", "specialist",
)  # :2123


def dedup_job_cards(jobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The sequential kept-set dedup: scan the page's jobs in order; keep a
    job iff its lowered title is not equal OR similar (_are_titles_similar,
    :2163-2190) to any PREVIOUSLY KEPT title. Non-transitive, so it cannot
    be a pairwise window — it is a JVM ``aggregate`` fold over each page's
    collected job array (pages fold independently → partition-parallel;
    per-page job lists are small by construction)."""
    from crawler_ai_spark.functions.jobs import _sig_tokens

    pre = jobs.withColumn("_norm", F.lower(F.trim(F.col("title")))).where(
        ~(
            (F.size(F.split(F.col("_norm"), r"\s+")) <= 1)
            & F.col("_norm").isin(*GENERIC_SINGLE_TITLES)
        )
        & (F.length("_norm") >= 5)
    )
    pre = pre.withColumn("_toks", _sig_tokens(F.col("title")))
    payload = F.struct(
        F.col("job_index"), F.col("title"), F.col("location"),
        F.col("job_type"), F.col("salary"), F.col("description"),
        F.col("_norm").alias("norm"), F.col("_toks").alias("toks"),
    )
    per_page = pre.groupBy(id_col).agg(
        F.array_sort(F.collect_list(payload)).alias("_jobs")
    )

    def _similar(k, j) -> Column:
        inter = F.size(F.array_intersect(k["toks"], j["toks"]))
        ksz, jsz = F.size(k["toks"]), F.size(j["toks"])
        sym_diff = (ksz - inter) + (jsz - inter)
        subset = (inter == ksz) | (inter == jsz)
        return (
            F.when(k["norm"] == j["norm"], F.lit(True))
            .when(subset, sym_diff <= 1)
            .otherwise(inter >= 3)
        )

    acc0 = F.expr(
        "CAST(array() AS array<struct<job_index:int,title:string,location:string,"
        "job_type:string,salary:string,description:string,norm:string,toks:array<string>>>)"
    )
    kept = F.aggregate(
        F.col("_jobs"),
        acc0,
        lambda acc, j: F.when(
            F.exists(acc, lambda k: _similar(k, j)), acc
        ).otherwise(F.concat(acc, F.array(j))),
    )
    out = per_page.select(F.col(id_col), F.posexplode(kept).alias("_p", "j"))
    return out.select(
        id_col,
        # the reference keeps each job's ORIGINAL index (gaps where dups
        # were dropped) — unique_jobs.append(job) copies the dict as-is
        F.col("j.job_index").alias("job_index"),
        F.col("j.title").alias("title"),
        F.col("j.location").alias("location"),
        F.col("j.job_type").alias("job_type"),
        F.col("j.salary").alias("salary"),
        F.col("j.description").alias("description"),
    )
