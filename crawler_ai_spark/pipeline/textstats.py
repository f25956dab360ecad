"""Text analysis for training-data curation: language ID, quality scoring,
token counting, fingerprinting. All JVM built-ins (no Python) so every
expression stays inside whole-stage codegen and is oracle-expressible in
ANSI SQL.

These generalize the reference's text heuristics — keyword-hit scoring
(career_detector.py:156-267), length gates (job_extraction_service.py:1150),
ws-collapse normalization (app/utils/text.py:44-46) — into corpus-level
curation columns."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram-free heuristic language ID;
# deliberately tiny + deterministic (a real deployment swaps in fastText —
# gated behind the same column contract)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "los", "las", "una", "es"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "la", "les", "des", "une", "est", "et"),
    "vi": ("của", "và", "các", "là", "cho", "với", "này"),
}

STOPWORDS_EN = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
)


def norm_text(text: Column) -> Column:
    """Whitespace-collapse + trim + lower — the canonical normalization
    every downstream hash/fingerprint keys on (text.py:44-46 semantics)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(F.regexp_replace(text, r"\s+", " "))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries the
    way BPE pre-tokenizers do (letters runs, digit runs, single punct)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|\d+|[^A-Za-z\d\s]"), F.lit(0))
    )


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.split(norm_text(text), " ")
    return {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts, ties → lexicographically first lang,
    zero hits → 'und'.

    Implemented as array_max over (score, -rank) structs: struct ordering
    picks the highest score, then the lowest rank (= lexicographically
    first language) on ties — identical semantics to a CASE cascade, but
    each marker-score expression appears ONCE in the plan. The previous
    nested when-chain re-embedded every prior score inside each branch,
    doubling the expression tree per language (~2^n_langs tokenizations
    after codegen); this form is linear."""
    scores = lang_scores(text)
    langs = sorted(scores)  # tie-break order = lexicographic
    entries = [
        F.struct(scores[lang].alias("s"), F.lit(-i).alias("nr"))
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    name = F.lit(langs[0])
    for i, lang in enumerate(langs[1:], start=1):
        name = F.when(best["nr"] == -i, F.lit(lang)).otherwise(name)
    return F.when(best["s"] > 0, name).otherwise(F.lit("und"))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature columns (all round(…, 6) doubles):

    - n_chars / n_tokens: raw sizes
    - mean_token_len: chars per token
    - stopword_ratio: EN stopword fraction (garbage text → ~0; natural
      prose → 0.2-0.5)
    - punct_ratio / digit_ratio / upper_ratio: character-class fractions
    - repetition_ratio: 1 - distinct_tokens/tokens (boilerplate detector)
    """
    t = F.trim(F.regexp_replace(text, r"\s+", " "))
    toks = F.split(F.lower(t), " ")
    n_chars = F.length(t)
    n_tokens = F.when(n_chars == 0, F.lit(0)).otherwise(F.size(toks))
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.round(n_chars / safe_tokens, 6),
        "stopword_ratio": F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))) / safe_tokens, 6
        ),
        "punct_ratio": F.round(
            F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))) / safe_chars, 6
        ),
        "digit_ratio": F.round(
            F.size(F.regexp_extract_all(t, F.lit(r"\d"), F.lit(0))) / safe_chars, 6
        ),
        "repetition_ratio": F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / safe_tokens, 6
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] keep-score: length window + stopword presence −
    repetition penalty (weights mirror the reference's completeness/
    relevance blend shape, job_analyzer.py:390-412)."""
    q = quality_columns(text)
    len_ok = (
        F.when(q["n_tokens"] < 5, F.lit(0.0))
        .when(q["n_tokens"] > 5000, F.lit(0.2))
        .otherwise(F.lit(0.4))
    )
    stop_part = F.least(q["stopword_ratio"] * 2, F.lit(0.3))
    rep_penalty = F.greatest(q["repetition_ratio"] - 0.5, F.lit(0.0)) * 0.6
    return F.round(F.greatest(len_ok + stop_part + F.lit(0.3) - rep_penalty, F.lit(0.0)), 6)


# the Gopher rules' stop-word set (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A —
# MassiveWeb quality filtering); a document must contain ≥ 2 of these
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_columns(text: Column) -> dict[str, Column]:
    """The published Gopher/MassiveWeb document-quality rules (Rae et al.
    2021, App. A1.1) as pure-JVM columns. Every PASS predicate compares
    INTEGER counts cross-multiplied by the rule's threshold (n_alpha*10 >=
    n_words*8, not a float ratio >= 0.8), so the verdict is bit-identical
    across engines; the float ratios are round(…, 6) display columns.

    Rules: 50 ≤ words ≤ 100k; 3 ≤ mean word length ≤ 10; symbol-to-word
    ratio (#, … or ...) ≤ 0.1; ≤ 90% of lines start with a bullet; ≤ 30%
    of lines end with an ellipsis; ≥ 80% of words contain an alphabetic
    character; ≥ 2 distinct Gopher stop words present."""
    collapsed = F.trim(F.regexp_replace(text, r"\s+", " "))
    toks = F.split(F.lower(collapsed), " ")
    n_words = F.when(F.length(collapsed) == 0, F.lit(0)).otherwise(F.size(toks)).cast(
        "long"
    )
    # Σ len(word) == len(collapsed) − (n_words − 1) separator spaces
    n_word_chars = (
        F.length(collapsed) - F.greatest(n_words - 1, F.lit(0))
    ).cast("long")
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    n_symbols = F.size(
        F.regexp_extract_all(collapsed, F.lit(r"#|\.\.\.|…"), F.lit(0))
    ).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).rlike("^[-*•]"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike("(\\.\\.\\.|…)$"))
    ).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop_types = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(toks, s))
    ).cast("long")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (n_word_chars >= 3 * n_words)
        & (n_word_chars <= 10 * n_words)
        & (n_symbols * 10 <= n_words)
        & (n_bullet * 10 <= n_lines * 9)
        & (n_ellipsis * 10 <= n_lines * 3)
        & (n_alpha_words * 10 >= n_words * 8)
        & (n_stop_types >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(n_word_chars / safe_words, 6),
        "symbol_ratio": F.round(n_symbols / safe_words, 6),
        "bullet_line_ratio": F.round(n_bullet / safe_lines, 6),
        "ellipsis_line_ratio": F.round(n_ellipsis / safe_lines, 6),
        "alpha_word_ratio": F.round(n_alpha_words / safe_words, 6),
        "n_stop_types": n_stop_types,
        "gopher_pass": gopher_pass,
    }


def fingerprint(text: Column) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex) — the
    exact-dedup / lineage key."""
    return F.md5(norm_text(text))


def with_textstats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All curation columns in one select (single pass over the corpus)."""
    t = F.col(text_col)
    cols = quality_columns(t)
    out = docs
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return (
        out.withColumn("lang_pred", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint(t))
        .withColumn("n_tokens_bpe", bpe_ish_token_count(t).cast("long"))
    )


def readability_columns(text: Column) -> dict[str, Column]:
    """Flesch reading-ease inputs + score — the classic readability
    quality signal (Flesch 1948, public formula). Heuristics are the
    standard cheap ones: syllables = vowel-group runs ([aeiouy]+, which
    sums per-word because whitespace breaks runs), sentences =
    [.!?]+ runs floored at 1. Integer counts → one rounded ratio double
    (repo parity rule). NULL text → NULL score; empty/blank → NULL
    (no words to score)."""
    n_words = token_count(text)
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), F.lit(0))
    )
    flesch = F.when(
        n_words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * n_words / n_sentences
            - F.lit(84.6) * n_syllables / n_words,
            6,
        ),
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_syllables": n_syllables,
        "flesch": flesch,
    }


# ---------------------------------------------------------------------------
# Unicode script detection — the signal the n-gram language heuristic
# is blind to: 'ру́сский' vs 'english' is decidable from the script
# alone, and production langid stacks gate on script before any model
# runs (wrong-script text short-circuits). Counts per Unicode script
# property via JVM regexp_count (\p{script=X}; RE2 spells it \p{X} —
# the oracle uses its own dialect), ratios over total non-space chars.
# ---------------------------------------------------------------------------

SCRIPTS = (
    "Latin", "Cyrillic", "Han", "Arabic", "Devanagari",
    "Hangul", "Hiragana", "Katakana", "Greek", "Hebrew", "Thai",
)


def script_columns(text: Column) -> dict[str, Column]:
    """{script_latin: ratio, ..., script_chars: n, dominant_script: s}.
    Ratios are exact integer-count divisions over the non-space total
    (0.0 when the text has none); dominant = argmax ratio with
    alphabetical tie-break, 'none' for empty text."""
    nonspace = F.regexp_count(text, F.lit(r"\S"))
    counts = {
        s: F.regexp_count(text, F.lit(rf"\p{{script={s}}}")) for s in SCRIPTS
    }
    cols: dict[str, Column] = {
        f"script_{s.lower()}": F.when(nonspace > 0, counts[s] / nonspace)
        .otherwise(F.lit(0.0))
        .cast("double")
        for s in SCRIPTS
    }
    cols["script_chars"] = nonspace.cast("long")
    best = F.greatest(*[counts[s] for s in SCRIPTS])
    # alphabetical tie-break: build the chain in reverse-sorted order so
    # the alphabetically FIRST tied script ends up as the outermost WHEN
    dom = F.lit("none")
    for s in sorted(SCRIPTS, reverse=True):
        dom = F.when((counts[s] == best) & (best > 0), F.lit(s.lower())).otherwise(dom)
    cols["dominant_script"] = dom
    return cols
