"""Corpus pipeline over the documents table: dedup, text stats, curation, packing.

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark.pipeline import corpus as CP
from crawler_ai_spark.pipeline import dedup as DD
from crawler_ai_spark.pipeline import textstats as TS

from crawler_ai_spark.queries._shared import (
    _register,
    _sql_quote,
    _t,
)


# ===========================================================================
# 4. corpus pipeline: documents
# ===========================================================================


@_register(
    "doc_exact_dups",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN 'synthetic duplicate template #' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM aug GROUP BY md5(text) HAVING count(*) > 1
ORDER BY text_hash
""",
)
def q_doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over deterministically-seeded duplicates: 30% of
    docs are rewritten onto one of 7 templates so the sf0.01 oracle compares
    NON-empty sets (natural dups first appear at sf0.1 — the round-1 gate
    was degenerate-green on an empty agreement)."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit("synthetic duplicate template #"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return DD.exact_dup_groups(aug).orderBy("text_hash")


_CHUNK_LEN = 400
_CHUNK_STRIDE = 350  # 50-char overlap between consecutive chunks


def _chunk_array(t):
    """Overlapping char windows as a pure-JVM array expression. Guard:
    Spark's sequence(0, -1) DESCENDS, so empty text must short-circuit."""
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.floor((F.length(t) - 1) / _CHUNK_STRIDE) + 1
    )
    idx = F.when(n >= 1, F.sequence(F.lit(0), (n - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: t.substr(i * _CHUNK_STRIDE + 1, F.lit(_CHUNK_LEN)))


@_register(
    "doc_chunks",
    oracle=f"""
WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
         substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_LEN}) AS chunk_text
  FROM t, unnest(range(0,
    CAST(CASE WHEN n = 0 THEN 0 ELSE floor((n - 1) / {_CHUNK_STRIDE}) + 1 END AS BIGINT)
  )) AS u(i)
)
SELECT doc_id, chunk_id, chunk_text, length(chunk_text) AS n_chars
FROM c ORDER BY doc_id, chunk_id
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: fixed-size character windows with overlap
    ({chunk} chars, stride {stride}) — the step between curation and
    tokenization. Pure JVM (sequence + transform + posexplode), linear
    scan, no shuffle; char semantics match DuckDB's substr so the oracle
    is exact on unicode text. Token-aware chunking would swap the window
    arithmetic for the token counter in pipeline/textstats.py."""
    docs = _t(spark, sf_dir, "documents")
    chunks = _chunk_array(F.col("text"))
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
            F.length("chunk_text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id", "chunk_id")
    )


q_doc_chunks.__doc__ = q_doc_chunks.__doc__.format(
    chunk=_CHUNK_LEN, stride=_CHUNK_STRIDE
)


# ---------------------------------------------------------------------------
# corpus-level curation (pipeline/corpus.py): boilerplate line dedup,
# benchmark decontamination, repetition metrics, stratified sampling
# ---------------------------------------------------------------------------

# guarded normalized tokenizer: DuckDB's string_split('') returns ['']
# (1 phantom token / 1 phantom line) while the Spark operators guard
# empty/whitespace text to 0 tokens — the CASE keeps both engines at []
_TOKS_SPLIT = (
    "CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0"
    " THEN CAST([] AS VARCHAR[])"
    " ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') END"
)

# normalized-token CTE shared by the corpus oracles
_TOKS_CTE = f"""
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM documents
)"""

# exactly LINE_TOKENS (8) tokens — prepended so seeded docs share their
# first synthesized line verbatim (mid-text insertion would shift window
# boundaries and break the cross-doc identity the dedup keys on)
_BOILER_LINE = "subscribe to our newsletter follow us on twitter"
if len(_BOILER_LINE.split()) != CP.LINE_TOKENS:  # survives python -O
    raise AssertionError("_BOILER_LINE must be exactly one LINE_TOKENS window")

_LINES_EXPR = (
    "list_transform(range(0, CAST(floor((len(toks)-1)/{n})+1 AS BIGINT)), "
    "i -> array_to_string(toks[CAST(i*{n}+1 AS BIGINT):CAST(i*{n}+{n} AS BIGINT)], ' '))"
).format(n=CP.LINE_TOKENS)


@_register(
    "doc_line_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '{_BOILER_LINE} ' || text ELSE text END AS text
  FROM documents
),
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM base
),
w AS (SELECT doc_id, {_LINES_EXPR} AS lines FROM toksed),
ex AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_idx, lines[CAST(i + 1 AS BIGINT)] AS line
  FROM w, unnest(range(0, len(lines))) AS u(i)
),
boiler AS (SELECT line FROM ex GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT * FROM ex WHERE line NOT IN (SELECT line FROM boiler)),
reb AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(reb.clean_text, '') AS clean_text,
       CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(tot.n_lines, 0) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN reb ON d.doc_id = reb.doc_id
ORDER BY d.doc_id
""",
)
def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (RefinedWeb-style): drop
    every occurrence of any synthesized 8-token line appearing in >= 2
    distinct docs, reassemble survivors in order. Docs with doc_id%7==0
    get a shared boilerplate line PREPENDED so the gate compares
    non-empty removal sets at sf0.01 (the doc_exact_dups seeding
    pattern). Plan: df-count shuffle on short rows -> broadcast anti-join
    probe -> one per-doc regroup; see pipeline/corpus.py scale notes."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(_BOILER_LINE + " "), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return CP.line_dedup(docs, min_df=2).orderBy("doc_id")


@_register(
    "doc_decontaminate",
    oracle=f"""
WITH {_TOKS_CTE},
bench AS (
  SELECT DISTINCT array_to_string(toks[3:10], ' ') AS gram
  FROM toksed WHERE doc_id % 29 = 0 AND len(toks) >= 10
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - {CP.DECONTAM_N} + 2),
           i -> array_to_string(
             toks[CAST(i AS BIGINT):CAST(i + {CP.DECONTAM_N} - 1 AS BIGINT)], ' '))) AS grams
  FROM toksed WHERE len(toks) >= {CP.DECONTAM_N}
  UNION ALL
  SELECT doc_id, [array_to_string(toks, ' ')] AS grams
  FROM toksed WHERE len(toks) < {CP.DECONTAM_N} AND len(toks) > 0
),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
hits AS (
  SELECT ex.doc_id, count(*) AS n_hits FROM ex JOIN bench ON ex.gram = bench.gram
  GROUP BY ex.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
""",
)
def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any 8-token gram with
    the synthesized benchmark set (tokens 3..10 of every doc_id%29==0
    doc — the contributing docs self-hit, so the gate is non-degenerate
    by construction, and cross-doc hits exercise the join). Benchmark is
    broadcast; the only shuffle is the short-row per-doc hit count."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(TS.norm_text(F.col("text")), " ")
    bench = docs.filter((F.col("doc_id") % 29 == 0) & (F.size(toks) >= 10)).select(
        F.array_join(F.slice(toks, 3, 8), " ").alias("gram")
    )
    return CP.decontaminate(docs, bench, n=CP.DECONTAM_N).orderBy("doc_id")


@_register(
    "doc_repetition",
    oracle=f"""
WITH toks0 AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM documents
),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN trim(repeat(array_to_string(toks[1:8], ' ') || ' ', 6))
              ELSE array_to_string(toks, ' ') END AS text
  FROM toks0
),
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM base
),
w AS (
  SELECT doc_id,
         {_LINES_EXPR} AS lines,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM toksed
),
m AS (
  SELECT doc_id,
         len(lines) AS n_lines, len(bigrams) AS n_bg,
         CASE WHEN len(lines) > 0
              THEN round(1.0 - len(list_distinct(lines)) / greatest(len(lines), 1), 6)
              ELSE 0.0 END AS dup_line_ratio,
         CASE WHEN len(bigrams) > 0
              THEN round(1.0 - len(list_distinct(bigrams)) / greatest(len(bigrams), 1), 6)
              ELSE 0.0 END AS dup_bigram_ratio,
         CASE WHEN len(bigrams) > 0
              THEN round(list_max(list_transform(list_distinct(bigrams),
                   b -> len(list_filter(bigrams, x -> x = b))))
                   / greatest(len(bigrams), 1), 6)
              ELSE 0.0 END AS top_bigram_ratio
  FROM w
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_bg AS BIGINT) AS n_bigrams,
       dup_line_ratio, dup_bigram_ratio, top_bigram_ratio,
       (dup_line_ratio > 0.30 OR top_bigram_ratio > 0.18) AS repetitive
FROM m ORDER BY doc_id
""",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition metrics: duplicate-line and
    duplicate-bigram fractions, top-bigram share, and the repetitive
    gate. Docs with doc_id%13==0 are rewritten to an 8-token phrase
    repeated 6x so the gate boolean actually fires at sf0.01 (the
    seeding pattern of doc_exact_dups / doc_line_dedup). Line metrics
    map-side; bigram top/distinct via explode + pre-combined short-row
    count shuffle keyed on doc_id (see pipeline/corpus.py on why this
    beats the per-row HOF alternatives ~50x)."""
    toks0 = F.split(TS.norm_text(F.col("text")), " ")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.trim(
                F.repeat(F.concat(F.array_join(F.slice(toks0, 1, 8), " "), F.lit(" ")), 6)
            ),
        )
        .otherwise(F.array_join(toks0, " "))
        .alias("text"),
    )
    return CP.repetition_metrics(docs).orderBy("doc_id")


@_register(
    "doc_sample_stratified",
    oracle=f"""
WITH {_TOKS_CTE},
s AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) >= {CP.SAMPLE_BUCKETS[0][1]} THEN 'long'
              WHEN len(toks) >= {CP.SAMPLE_BUCKETS[1][1]} THEN 'mid'
              ELSE 'short' END AS bucket,
         substr(md5(doc_id || ':{CP.SAMPLE_SALT}'), 1, 4) AS sample_key
  FROM toksed
)
SELECT doc_id, bucket, sample_key, CAST(n_tokens AS BIGINT) AS n_tokens
FROM s
WHERE bucket = 'long'
   OR (bucket = 'mid' AND sample_key < '{CP.SAMPLE_BUCKETS[1][2]}')
   OR (bucket = 'short' AND sample_key < '{CP.SAMPLE_BUCKETS[2][2]}')
ORDER BY doc_id
""",
)
def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling by size band (long 1.0 /
    mid 0.5 / short 0.125) keyed on a content-independent md5 — the
    reproducible data-mixing move before tokenization. Map-only, RNG-free;
    identical keyspace arithmetic on both engines (exact binary-fraction
    thresholds over lowercase hex)."""
    docs = _t(spark, sf_dir, "documents")
    return CP.stratified_sample(docs).orderBy("doc_id")


@_register(
    "corpus_mix",
    oracle=f"""
WITH {_TOKS_CTE},
s AS (
  SELECT d.doc_id, d.lang, len(t.toks) AS n_tokens,
         CASE WHEN len(t.toks) >= {CP.SAMPLE_BUCKETS[0][1]} THEN 'long'
              WHEN len(t.toks) >= {CP.SAMPLE_BUCKETS[1][1]} THEN 'mid'
              ELSE 'short' END AS bucket
  FROM documents d JOIN toksed t ON d.doc_id = t.doc_id
)
SELECT lang, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       round(sum(n_tokens) / sum(sum(n_tokens)) OVER (), 6) AS token_share
FROM s GROUP BY lang, bucket
ORDER BY lang, bucket
""",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing report: doc and token counts per (lang, size-band)
    with share-of-corpus — what a recipe pipeline reads before choosing
    per-stratum sampling rates (doc_sample_stratified consumes the same
    banding). One partial-agg shuffle on a tiny key space plus a
    single-row total broadcast."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(TS.norm_text(F.col("text")), " ")
    n_tok = F.size(toks)
    bucket = (
        F.when(n_tok >= CP.SAMPLE_BUCKETS[0][1], F.lit("long"))
        .when(n_tok >= CP.SAMPLE_BUCKETS[1][1], F.lit("mid"))
        .otherwise(F.lit("short"))
    )
    per = docs.select(F.col("lang"), bucket.alias("bucket"), n_tok.alias("n_tokens"))
    agg = per.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
    )
    total = Window.partitionBy()
    return agg.select(
        "lang",
        "bucket",
        "n_docs",
        "tokens_total",
        F.round(F.col("tokens_total") / F.sum("tokens_total").over(total), 6).alias(
            "token_share"
        ),
    ).orderBy("lang", "bucket")


@_register(
    "doc_stats",
    oracle="""
WITH t AS (
  SELECT doc_id, text, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS tx FROM documents
)
SELECT doc_id,
       length(tx) AS n_chars,
       CASE WHEN length(tx) = 0 THEN 0 ELSE len(string_split(tx, ' ')) END AS n_tokens,
       round(length(tx) / greatest(CASE WHEN length(tx) = 0 THEN 0
             ELSE len(string_split(tx, ' ')) END, 1), 6) AS mean_token_len,
       round(1.0 - len(list_distinct(string_split(lower(tx), ' '))) /
             greatest(CASE WHEN length(tx) = 0 THEN 0
             ELSE len(string_split(tx, ' ')) END, 1), 6) AS repetition_ratio,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM t ORDER BY doc_id
""",
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char stats + repetition + content fingerprint, one pass."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    q = TS.quality_columns(t)
    return docs.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["repetition_ratio"].alias("repetition_ratio"),
        TS.fingerprint(t).alias("fingerprint"),
    ).orderBy("doc_id")


def _lang_oracle(src: str = "documents") -> str:
    # argmax with lexicographic tie-break, as a greatest-of-structs trick
    score_exprs = []
    for lang in sorted(TS.LANG_MARKERS):
        markers = ", ".join(_sql_quote(m) for m in TS.LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{markers}], t))) AS s_{lang}"
        )
    langs = sorted(TS.LANG_MARKERS)
    # fold left: keep first max
    best = f"'{langs[0]}'"
    best_s = f"s_{langs[0]}"
    for lang in langs[1:]:
        best = f"CASE WHEN s_{lang} > {best_s} THEN '{lang}' ELSE {best} END"
        best_s = f"CASE WHEN s_{lang} > {best_s} THEN s_{lang} ELSE {best_s} END"
    return f"""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM {src}
),
scored AS (
  SELECT doc_id, {', '.join(score_exprs)} FROM toksed
)
SELECT doc_id,
       CASE WHEN {best_s} > 0 THEN {best} ELSE 'und' END AS lang_pred
FROM scored ORDER BY doc_id
"""


@_register("doc_lang_id", oracle=_lang_oracle())
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TS.lang_id(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )


def _jaccard_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM toksed
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS set_size FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id,
       round(CAST(i.n_common AS DOUBLE) /
             (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.set_size + sb.set_size - i.n_common)
      >= {threshold}
ORDER BY a_id, b_id
"""


@_register("doc_jaccard_pairs", oracle=_jaccard_oracle(0.5))
def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.5)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.jaccard_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


@_register("doc_minhash_dups", oracle=_jaccard_oracle(0.5))
def q_doc_minhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (64 hashes, 32×2 bands) + exact verify — must equal the
    brute-force Jaccard oracle up to ~1e-6 band-miss recall."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


@_register("doc_simhash_pairs")  # no SQL oracle: signature needs blake2b
def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (hamming ≤ 3, pigeonhole-banded).
    Rows-only driver check by design (the 64-bit signature needs blake2b,
    which SQL lacks); the oracle-green companions are ``doc_minhash_dups``
    and ``doc_jaccard_pairs`` over the same corpus, and pytest
    (test_pipeline.py) pins SimHash candidate recall against the exact
    jaccard pairs."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(docs, max_hamming=3).orderBy("a_id", "b_id")


@_register(
    "ngram_top_df",
    oracle="""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM toksed
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
SELECT shingle, count(*) AS df
FROM ex GROUP BY shingle
ORDER BY df DESC, shingle LIMIT 20
""",
)
def q_ngram_top_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 shape — top-k n-grams by document frequency (dedup blocking-key
    hot-list; also the max_df skew-guard diagnostic)."""
    docs = _t(spark, sf_dir, "documents")
    sh = DD.with_shingles(docs.select("doc_id", "text"))
    return (
        sh.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


# ===========================================================================
