"""Job-record operators — field extraction, cleaning, dedup, quality.

Re-expresses the reference's job pipeline as JVM column expressions
(regexp_extract / CASE / window / array ops — whole-stage codegen, no
Python):

- P9  field extraction: job_type (job_extraction_service.py:1746-1757 and
      :2393-2402), location (:2413-2424), salary (:2437-2439, :633-646)
- P10 title clean (:2297-2299) + company-from-URL lives in filters.py (P11)
- P12 description summarize (:1102-1118) — byte-parity form in
      textnorm.summarize_description; the column form here mirrors it
- P14 multi-format date parse (:536-577): try each format in order
- F6  job-title predicate (:2523-2566)
- D3  exact job dedup by lower(title)|lower(company), first wins (:658-673)
- D4  fuzzy title dedup (:2116-2190): generic/short drop, then pairs are
      duplicates when normalized-equal, subset-with-≤1-word-diff, or
      sharing ≥3 non-stopword words; blocked on the first significant word
      (implied by the ≥3-shared rule, so blocking is lossless for it)
- C6  quality scores (job_analyzer.py:390-498; weights job_constants.py:
      252-259): completeness (required 0.8 / optional 0.2), relevance
      (keyword hits), freshness (days-ago buckets), overall 0.4/0.4/0.2
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K

# ---------------------------------------------------------------------------
# P9 — field extraction
# ---------------------------------------------------------------------------


def job_type_expr(text: Column, card: bool = False) -> Column:
    """First-match keyword cascade; card rules default to Full-time."""
    rules = K.JOB_TYPE_CARD_RULES if card else K.JOB_TYPE_DETAIL_RULES
    low = F.lower(text)
    # reference checks rules top-down, first match wins — fold from the
    # bottom so the topmost WHEN ends up outermost
    out = F.lit("Full-time") if card else F.lit(None).cast("string")
    for label, keywords in reversed(rules):
        hit = F.lit(False)
        for kw in keywords:
            hit = hit | low.contains(kw)
        out = F.when(hit, F.lit(label)).otherwise(out)
    return out


def _first_pattern(text: Column, patterns, flags: str = "i") -> Column:
    """coalesce of case-insensitive regexp_extract over an ordered pattern
    list — the reference's first-match-wins loop."""
    outs = []
    for p in patterns:
        rx = f"(?{flags})" + p if flags else p
        got = F.regexp_extract(text, rx, 1)
        outs.append(F.when(got != "", got))
    return F.coalesce(*outs, F.lit(None).cast("string"))


def location_expr(text: Column) -> Column:
    raw = _first_pattern(text, K.LOCATION_LINE_PATTERNS)
    cleaned = F.trim(F.regexp_replace(raw, K.LOCATION_CLEANUP_PATTERN, ""))
    return F.when(cleaned == "", F.lit(None)).otherwise(cleaned)


def salary_expr(text: Column) -> Column:
    line = _first_pattern(text, K.SALARY_LINE_PATTERNS)
    desc = _first_pattern(text, K.SALARY_DESC_PATTERNS)
    return F.trim(F.coalesce(line, desc))


def clean_title_expr(title: Column) -> Column:
    """P10 — suffix/prefix cleanup + ws collapse (:2297-2299, :709-720)."""
    t = F.regexp_replace(title, r"<[^>]+>", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    t = F.regexp_replace(t, "(?i)" + K.TITLE_SUFFIX_CLEANUP, "")
    t = F.regexp_replace(t, "(?i)" + K.TITLE_PREFIX_CLEANUP, "")
    return F.trim(t)


def posted_date_expr(raw: Column) -> Column:
    """P14 — try the 7 reference formats in order; returns DATE or null.
    Relative "N days ago" is surfaced separately (days_ago_expr) because
    resolving it needs a reference 'today' (determinism)."""
    candidates = [F.try_to_timestamp(F.trim(raw), F.lit(fmt)) for fmt in K.DATE_FORMATS_SPARK]
    return F.coalesce(*candidates).cast("date")


def days_ago_expr(raw: Column) -> Column:
    got = F.regexp_extract(F.lower(raw), r"(\d+)\s*days?\s*ago", 1)
    return F.when(got != "", got.cast("int")).otherwise(F.lit(None).cast("int"))


def summarize_description_expr(desc: Column, limit: int = K.DESCRIPTION_SUMMARY_LIMIT) -> Column:
    """P12 — collapse ws; ≤limit keep; else cut at the last '.' past 60%
    of the limit, else the last space, then append ' ...' (:1102-1118)."""
    d = F.trim(F.regexp_replace(F.coalesce(desc, F.lit("")), r"\s+", " "))
    head = F.substring(d, 1, limit)
    # regexp lengths are 1-based (include the matched '.'/' '), the
    # reference compares 0-based rfind() indices — hence the +1s
    dot = F.length(F.regexp_extract(head, r"^(.*\.)", 1))    # rfind('.') + 1
    space = F.length(F.regexp_extract(head, r"^(.* )", 1))   # rfind(' ') + 1
    cut = F.when(dot >= int(limit * 0.6) + 1, dot).otherwise(
        F.when(space > 1, space).otherwise(F.lit(limit))
    )
    return F.when(F.length(d) <= limit, d).otherwise(
        F.concat(F.trim(F.substring(d, 1, cut)), F.lit(" ..."))
    )


# ---------------------------------------------------------------------------
# F6 — job-title predicate
# ---------------------------------------------------------------------------


def is_real_job_title_expr(title: Column) -> Column:
    from crawler_ai_spark.functions.filters import any_substr

    low = F.lower(title)
    return (
        title.isNotNull()
        & (F.length(F.trim(title)) >= 5)
        & any_substr(low, K.JOB_TITLE_INDICATORS)
        & ~any_substr(low, K.NON_JOB_TITLE_INDICATORS)
    )


# ---------------------------------------------------------------------------
# D3 / D4 — dedup
# ---------------------------------------------------------------------------


def dedup_jobs_exact(jobs: DataFrame, order_col: str = "discovered_seq") -> DataFrame:
    """First job wins per lower(title)|lower(company) (:658-673)."""
    w = Window.partitionBy(
        F.lower(F.col("title")), F.lower(F.col("company"))
    ).orderBy(order_col)
    return jobs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def _sig_tokens(title: Column) -> Column:
    """Non-stopword token SET of the lowered title (:2164-2167 uses
    ``set(title.split()) - set(common_words)`` — sets, not lists)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(title, r"\s+", " "))), " ")
    stop = F.array(*[F.lit(s) for s in K.TITLE_COMMON_WORDS])
    return F.array_distinct(
        F.filter(toks, lambda t: (~F.array_contains(stop, t)) & (t != ""))
    )


def fuzzy_title_pairs(jobs: DataFrame, id_col: str = "job_id") -> DataFrame:
    """D4 — similar-title pairs (a < b). Rule (:2116-2190): after dropping
    generic one-word and <5-char titles, two titles are similar iff equal
    normalized, or one's token set ⊆ other's with ≤1 word difference, or
    ≥3 shared non-stopword tokens. Blocking key = first significant token
    (any pair matching the rules shares it or shares ≥3 tokens — blocked
    self-join on EVERY significant token keeps those, dedup after)."""
    base = (
        jobs.select(F.col(id_col).alias("id"), "title")
        .where(F.col("title").isNotNull() & (F.length(F.trim("title")) >= 5))
        .withColumn("norm", F.lower(F.trim(F.regexp_replace("title", r"\s+", " "))))
        .where(
            ~(
                (F.size(F.split(F.col("norm"), " ")) == 1)
                & F.col("norm").isin(*K.GENERIC_SINGLE_TITLES)
            )
        )
        .withColumn("toks", _sig_tokens(F.col("title")))
    )
    # block on every significant token PLUS the normalized title itself —
    # the latter catches equal all-stopword titles whose token set is empty
    blocked = base.select(
        "id", "norm", "toks", F.explode("toks").alias("block")
    ).unionByName(base.select("id", "norm", "toks", F.col("norm").alias("block")))
    a = blocked.select(
        F.col("id").alias("a_id"), F.col("norm").alias("a_norm"),
        F.col("toks").alias("a_toks"), "block",
    )
    b = blocked.select(
        F.col("id").alias("b_id"), F.col("norm").alias("b_norm"),
        F.col("toks").alias("b_toks"), "block",
    )
    cand = (
        a.join(b, "block")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_norm", "b_norm", "a_toks", "b_toks")
        .distinct()
    )
    return (
        cand.where(titles_similar_expr(
            F.col("a_norm"), F.col("b_norm"), F.col("a_toks"), F.col("b_toks")
        ))
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    )


def titles_similar_expr(a_norm, b_norm, a_toks, b_toks) -> Column:
    """_are_titles_similar (:2163-2190), exactly: equal strings → similar;
    set-subset → similar IFF symmetric difference ≤ 1 (and NO fall-through
    to the shared-words rule on a failed subset — the reference returns
    False right there); otherwise ≥ 3 shared significant words."""
    inter = F.size(F.array_intersect(a_toks, b_toks))
    asz, bsz = F.size(a_toks), F.size(b_toks)
    sym_diff = (asz - inter) + (bsz - inter)
    subset = (inter == asz) | (inter == bsz)
    return (
        F.when(a_norm == b_norm, F.lit(True))
        .when(subset, sym_diff <= 1)
        .otherwise(inter >= 3)
    )


# ---------------------------------------------------------------------------
# C6 — quality scores
# ---------------------------------------------------------------------------

REQUIRED_FIELDS = ("title", "description", "url")     # job_constants.py:252-255
OPTIONAL_FIELDS = ("company", "location", "job_type", "salary", "posted_date")


def completeness_expr(df_cols: dict[str, Column]) -> Column:
    present = lambda c: F.when(  # noqa: E731
        c.isNotNull() & (F.trim(c.cast("string")) != ""), 1.0
    ).otherwise(0.0)
    req = sum((present(df_cols[f]) for f in REQUIRED_FIELDS), F.lit(0.0)) / len(REQUIRED_FIELDS)
    opt = sum((present(df_cols[f]) for f in OPTIONAL_FIELDS), F.lit(0.0)) / len(OPTIONAL_FIELDS)
    return F.round(req * 0.8 + opt * 0.2, 6)


def relevance_expr(title: Column, description: Column) -> Column:
    """Keyword-hit fraction (job_analyzer.py:444-474, capped at 1)."""
    from crawler_ai_spark.functions.filters import count_hits

    text = F.lower(F.concat_ws(" ", title, description))
    hits = count_hits(text, K.JOB_TITLE_INDICATORS)
    return F.round(F.least(hits / F.lit(8.0), F.lit(1.0)), 6)


def freshness_expr(days_ago: Column) -> Column:
    """Bucketed freshness (job_analyzer.py:476-498, job_constants.py:277-283)."""
    return (
        F.when(days_ago.isNull(), F.lit(0.5))
        .when(days_ago <= 7, F.lit(1.0))
        .when(days_ago <= 30, F.lit(0.7))
        .when(days_ago <= 90, F.lit(0.4))
        .otherwise(F.lit(0.1))
    )


def overall_quality_expr(completeness: Column, relevance: Column, freshness: Column) -> Column:
    return F.round(completeness * 0.4 + relevance * 0.4 + freshness * 0.2, 6)
