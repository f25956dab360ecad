"""Second-wave coverage added after the first green sweep (mixed families, kept in registration order).

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark.pipeline import corpus as CP
from crawler_ai_spark.pipeline import textstats as TS

from crawler_ai_spark.queries._shared import (
    SYNTH_URLS_CTE,
    _register,
    _sql_quote,
    _t,
    synth_urls,
)
from crawler_ai_spark.queries.crawl import _PII_EMAIL_RX, _PII_PHONE_RX
from crawler_ai_spark.queries.corpusdocs import _CHUNK_LEN, _CHUNK_STRIDE, _chunk_array, _lang_oracle


# ===========================================================================
# 6. second-wave coverage (added after the first green sweep)
# ===========================================================================


@_register(
    "part_supplier_stats",
    oracle="""
SELECT p.p_brand,
       count(DISTINCT l.l_suppkey) AS n_suppliers,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
""",
)
def q_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with exact distinct-count per brand (J2/A6 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("revenue_c"),
        )
        .orderBy("p_brand")
    )


@_register(
    "order_priority_histogram",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
""",
)
def q_order_priority_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 histogram shape (reference: per-type count folds)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority", "o_orderstatus")
    )


@_register(
    "events_type_share",
    oracle="""
SELECT event_type, count(*) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 summary-share shape: per-type fraction of total via window-over-
    aggregate (integer inputs → identical doubles both engines)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return (
        counts.withColumn("share", F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6))
        .orderBy("event_type")
    )


@_register(
    "pagination_urls",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
career AS (
  SELECT doc_id, url FROM synth_urls WHERE (doc_id % 12) = 0
)
SELECT doc_id, url || '?page=' || n AS page_url
FROM career, unnest(generate_series(2, 10)) AS t(n)
ORDER BY doc_id, page_url
""",
)
def q_pagination_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — pagination candidate generator: career roots × pages 2-10
    (job_extraction_service.py:267-321) as explode(sequence())."""
    urls = synth_urls(spark, sf_dir).where(F.col("doc_id") % 12 == 0)
    return (
        urls.withColumn("n", F.explode(F.sequence(F.lit(2), F.lit(10))))
        .select(
            "doc_id",
            F.concat(F.col("url"), F.lit("?page="), F.col("n").cast("string")).alias(
                "page_url"
            ),
        )
        .orderBy("doc_id", "page_url")
    )


def _doc_quality_oracle(src: str = "documents") -> str:
    stop = ", ".join(_sql_quote(s) for s in TS.STOPWORDS_EN)
    return f"""
WITH t AS (
  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS tx FROM {src}
),
feat AS (
  SELECT doc_id,
         length(tx) AS n_chars,
         CASE WHEN length(tx) = 0 THEN 0 ELSE len(string_split(tx, ' ')) END AS n_tokens,
         len(list_filter(string_split(lower(tx), ' '),
             x -> list_contains([{stop}], x))) AS n_stop,
         len(regexp_extract_all(tx, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(tx, '\\d')) AS n_digit,
         len(list_distinct(string_split(lower(tx), ' '))) AS n_distinct
  FROM t
)
SELECT doc_id,
  round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
  round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
  round(n_digit / greatest(n_chars, 1), 6) AS digit_ratio,
  round(greatest(
    (CASE WHEN n_tokens < 5 THEN 0.0 WHEN n_tokens > 5000 THEN 0.2 ELSE 0.4 END)
    + least(round(n_stop / greatest(n_tokens, 1), 6) * 2, 0.3) + 0.3
    - greatest(round(1.0 - n_distinct / greatest(n_tokens, 1), 6) - 0.5, 0.0) * 0.6,
    0.0), 6) AS quality
FROM feat ORDER BY doc_id
"""


@_register("doc_quality", oracle=_doc_quality_oracle())
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation quality score + its feature ratios."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    q = TS.quality_columns(t)
    return docs.select(
        "doc_id",
        q["stopword_ratio"].alias("stopword_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
        TS.quality_score(t).alias("quality"),
    ).orderBy("doc_id")


# seeding CTE shared by the source-curation oracles: every 3rd source is
# degraded deterministically so all three tiers exist at the sf0.01 gate
# (natural data is uniformly high-quality / dup-free there)
_SRC_AUG_CTE = """
aug AS (
  SELECT doc_id, source,
         CASE WHEN (CAST(substr(source, 4) AS INT) % 3) = 1
                   AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
              THEN 'shared corporate boilerplate announcement for ' || source
              WHEN (CAST(substr(source, 4) AS INT) % 3) = 2
              THEN 'zz qq ' || doc_id
              ELSE text END AS text
  FROM documents
)"""

_SRC_ROLLUP_SQL = f"""
qual AS (SELECT * FROM ({{qual_oracle}}) t),
j AS (
  SELECT a.source, q.quality,
         md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g')))) AS fp,
         CASE WHEN length(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(trim(regexp_replace(a.text, '\\s+', ' ', 'g')), ' '))
         END AS n_tokens
  FROM aug a JOIN qual q USING (doc_id)
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(n_tokens) AS tokens_total,
         round(avg(quality), 4) AS mean_quality,
         count(*) - count(DISTINCT fp) AS n_dup
  FROM j GROUP BY source
),
rolled AS (
  SELECT source,
         CAST(n_docs AS BIGINT) AS n_docs,
         CAST(tokens_total AS BIGINT) AS tokens_total,
         mean_quality,
         round(n_dup / greatest(n_docs, 1), 6) AS dup_rate,
         CASE WHEN mean_quality >= 0.55
                   AND round(n_dup / greatest(n_docs, 1), 6) <= 0.20 THEN 'full'
              WHEN mean_quality >= 0.40
                   AND round(n_dup / greatest(n_docs, 1), 6) <= 0.50 THEN 'half'
              ELSE 'eighth' END AS tier
  FROM agg
)"""


def _src_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SRC_AUG_CTE."""
    docs = _t(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).cast("int")
    return docs.select(
        "doc_id",
        "source",
        F.when(
            (srcnum % 3 == 1)
            & (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"),
            F.concat(
                F.lit("shared corporate boilerplate announcement for "),
                F.col("source"),
            ),
        )
        .when(
            srcnum % 3 == 2,
            F.concat(F.lit("zz qq "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


@_register(
    "source_quality_rollup",
    oracle=f"""
WITH {_SRC_AUG_CTE},
{_SRC_ROLLUP_SQL.format(qual_oracle=_doc_quality_oracle("aug"))}
SELECT * FROM rolled ORDER BY source
""",
)
def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation rollup (FineWeb/CCNet-style: judge the
    SOURCE): per-source doc/token counts, mean quality, within-source
    exact-dup rate, and the derived sampling tier. Every 3rd source is
    seeded degenerate (dup templates / short garbage) so all three tiers
    are exercised at the sf0.01 gate. One partial-agg shuffle on the
    source key; see pipeline/corpus.py for the skew notes."""
    return CP.source_rollup(_src_aug(spark, sf_dir)).orderBy("source")


@_register(
    "doc_source_filter",
    oracle=f"""
WITH {_SRC_AUG_CTE},
{_SRC_ROLLUP_SQL.format(qual_oracle=_doc_quality_oracle("aug"))},
k AS (
  SELECT doc_id, source,
         substr(md5(doc_id || ':{CP.SAMPLE_SALT}'), 1, 4) AS sample_key
  FROM documents
)
SELECT k.doc_id, k.source, r.tier, k.sample_key
FROM k JOIN rolled r USING (source)
WHERE r.tier = 'full'
   OR (r.tier = 'half' AND k.sample_key < '8000')
   OR (r.tier = 'eighth' AND k.sample_key < '2000')
ORDER BY k.doc_id
""",
)
def q_doc_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the per-source tier back to documents: deterministic md5-key
    downsampling at the source's rate (full 1.0 / half 0.5 / eighth
    0.125). The rollup broadcasts (one row per source), so the apply pass
    shuffles nothing of the corpus."""
    aug = _src_aug(spark, sf_dir)
    rollup = CP.source_rollup(aug)
    return CP.source_filter(aug, rollup).orderBy("doc_id")


@_register(
    "corpus_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
         END + 1 AS BIGINT) AS doc_len
  FROM documents
),
o AS (
  SELECT source, doc_id, doc_len,
         coalesce(sum(doc_len) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT source, doc_id, doc_len, global_offset, CAST(w AS BIGINT) AS window_id
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {CP.PACK_WINDOW}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {CP.PACK_WINDOW}) AS BIGINT))) AS u(w)
)
SELECT source, window_id, doc_id,
       CAST(greatest(0, window_id * {CP.PACK_WINDOW} - global_offset) AS BIGINT) AS doc_from,
       CAST(least(doc_len, (window_id + 1) * {CP.PACK_WINDOW} - global_offset) AS BIGINT) AS doc_to,
       CAST(global_offset AS BIGINT) AS global_offset
FROM e ORDER BY source, window_id, doc_id
""",
)
def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: concat-and-chunk each source shard's
    token stream (one EOD separator per doc) into fixed 128-token
    training windows; one row per (doc x window overlapped) with the
    doc's token subrange. Runs the hot-shard pre-split path (contiguous
    100-doc sub-shards per source, offsets stitched by a tiny window
    over sub-shard totals — see pipeline/corpus.py _pack_spans) so the
    skew-safe arithmetic is what the oracle's single-window re-derivation
    gates: identical offsets, bounded per-task stream length."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_sequences(docs, sub_shard_docs=100).orderBy(
        "source", "window_id", "doc_id"
    )


@_register(
    "corpus_pack_windows",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN ['{CP.EOD_TOKEN}']
              ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
                   || ['{CP.EOD_TOKEN}']
         END AS stream
  FROM documents
),
o AS (
  SELECT source, doc_id, stream, CAST(len(stream) AS BIGINT) AS doc_len,
         coalesce(sum(CAST(len(stream) AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT source, doc_id, stream, CAST(w AS BIGINT) AS window_id,
         greatest(0, CAST(w AS BIGINT) * {CP.PACK_WINDOW} - global_offset) AS a,
         least(doc_len, (CAST(w AS BIGINT) + 1) * {CP.PACK_WINDOW} - global_offset) AS b
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {CP.PACK_WINDOW}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {CP.PACK_WINDOW}) AS BIGINT))) AS u(w)
)
SELECT source, window_id,
       string_agg(array_to_string(list_slice(stream, a + 1, b), ' '), ' ' ORDER BY doc_id) AS window_text,
       CAST(sum(b - a) AS BIGINT) AS n_tokens
FROM e GROUP BY source, window_id ORDER BY source, window_id
""",
)
def q_corpus_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed training windows: the actual fixed-width token
    examples the pack_sequences manifest describes — per (source shard,
    window) the concatenated token text and count. Two corpus-sized
    exchanges total (offset window + partial-aggregatable regroup); runs
    the hot-shard pre-split path like corpus_pack_sequences."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_windows(docs, sub_shard_docs=100).orderBy("source", "window_id")


@_register(
    "corpus_shuffle_shards",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         md5(concat(CAST(doc_id AS VARCHAR), ':{CP.SHUFFLE_SALT}')) AS shuffle_key
  FROM documents
),
s AS (
  SELECT doc_id, shuffle_key,
         CAST(concat('0x', substr(shuffle_key, 1, 4)) AS BIGINT) % {CP.SHUFFLE_SHARDS} AS shard_id
  FROM k
)
SELECT shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY shuffle_key, doc_id) AS BIGINT) AS position,
       doc_id, shuffle_key
FROM s ORDER BY shard_id, position
""",
)
def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: content-independent md5 keys
    assign each doc an output shard (first 4 hex digits mod n) and a
    within-shard order (full key) — the RNG-free decorrelation pass
    before training. One uniform shuffle on shard_id; see
    pipeline/corpus.py shuffle_shards for the writer form at scale."""
    docs = _t(spark, sf_dir, "documents")
    return CP.shuffle_shards(docs).orderBy("shard_id", "position")


@_register(
    "corpus_incremental_ingest",
    oracle="""
WITH odd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
src AS (SELECT doc_id AS src_id, text AS src_text FROM documents),
inc AS (
  SELECT o.doc_id, coalesce(s.src_text, o.text) AS text
  FROM odd o LEFT JOIN src s
    ON s.src_id = CASE WHEN o.doc_id % 9 = 1 THEN o.doc_id - 1
                       WHEN o.doc_id % 42 = 3 THEN o.doc_id - 2 END
),
ex AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents WHERE doc_id % 2 = 0
),
f AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM inc
),
w AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn,
         fingerprint IN (SELECT fp FROM ex) AS known
  FROM f
)
SELECT doc_id, fingerprint, (NOT known AND rn = 1) AS is_new
FROM w ORDER BY doc_id
""",
)
def q_corpus_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ingestion gate: even doc_ids are the existing
    corpus, odd ones the incoming batch; seeded copies (doc_id%9==1 takes
    its predecessor's text -> known duplicate; odd doc_id%42==3 takes
    doc_id-2's text -> within-batch duplicate) make both rejection paths
    non-degenerate. Fingerprint-keyed anti-join + first-wins window, both
    on the uniform md5 key; see pipeline/corpus.py incremental_ingest."""
    docs = _t(spark, sf_dir, "documents")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    src_id = F.when(F.col("doc_id") % 9 == 1, F.col("doc_id") - 1).when(
        F.col("doc_id") % 42 == 3, F.col("doc_id") - 2
    )
    incoming = (
        odd.withColumn("src_id", src_id)
        .join(
            docs.select(F.col("doc_id").alias("src_id"), F.col("text").alias("src_text")),
            "src_id",
            "left",
        )
        .select("doc_id", F.coalesce("src_text", "text").alias("text"))
    )
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    return CP.incremental_ingest(incoming, existing).orderBy("doc_id")


@_register("vn_phone_extract")  # rows-only: lookbehind is Java-regex-only
def q_vn_phone_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — strict VN phone pipeline (lookaround regex, unicode separator
    class) over deterministically augmented text. RE2/DuckDB cannot express
    the lookbehind, so this is rows-only here; byte-parity vs the pure-
    Python reference pipeline is pinned in tests/test_contacts-style
    fixtures (functions/textnorm.py twins). Output is exploded to scalar
    (doc_id, idx, phone) rows — array columns break the driver's pandas
    canonicalizer (CORRECTNESS_r01 vn_phone_extract err)."""
    from crawler_ai_spark.functions.contacts import phones_strict_expr

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' Hotline: 0' || CAST(90 + doc_id % 10 AS STRING) || "
            "' ' || CAST(1000000 + doc_id AS STRING)"
        ).alias("text"),
    )
    return (
        aug.select(
            "doc_id",
            F.posexplode(phones_strict_expr(F.col("text"))).alias("idx", "phone"),
        )
        .orderBy("doc_id", "idx")
    )


# the flagship training-data composition: every curation stage in ONE
# declarative plan. Duplicate templates are seeded so the dedup stage is
# non-degenerate at the gate SF (0 natural dups there) and are written to
# PASS the lang/quality gates (stopword-rich English, low repetition) and
# to EXERCISE the scrub (an email + a phone inside).
_CURATION_DUP_TEMPLATE = (
    "the quick brown fox and the lazy dog are in the house with a cat and "
    "they all see the sun in the day while the rain is far away call "
    "0912345678 or write user@ex.example now template #"
)
_CURATION_MIN_QUALITY = 0.75


def _curation_oracle() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN {_sql_quote(_CURATION_DUP_TEMPLATE)} || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
lang AS (SELECT * FROM ({_lang_oracle("aug")}) t),
qual AS (SELECT * FROM ({_doc_quality_oracle("aug")}) t),
kept AS (
  SELECT a.doc_id, a.text, l.lang_pred, q.quality
  FROM aug a JOIN lang l USING (doc_id) JOIN qual q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.quality >= {_CURATION_MIN_QUALITY}
  QUALIFY row_number() OVER (
    PARTITION BY md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))))
    ORDER BY a.doc_id) = 1
),
scrubbed AS (
  SELECT doc_id, lang_pred, quality,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_RX}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RX}', '<PHONE>', 'g') AS tx
  FROM kept
),
chunks AS (
  SELECT doc_id, lang_pred, quality, CAST(i AS BIGINT) AS chunk_id,
         substr(tx, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_LEN}) AS chunk_text
  FROM scrubbed, unnest(range(0,
    CAST(CASE WHEN length(tx) = 0 THEN 0
         ELSE floor((length(tx) - 1) / {_CHUNK_STRIDE}) + 1 END AS BIGINT))) AS u(i)
)
SELECT doc_id, lang_pred, quality, chunk_id, chunk_text
FROM chunks ORDER BY doc_id, chunk_id
"""


@_register("doc_curation_pipeline", oracle=_curation_oracle())
def q_doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE declarative plan: language gate
    → quality gate → exact dedup (first doc per fingerprint) → PII scrub
    → overlapping chunking. Catalyst sees every stage at once — the
    filters run before the window, the scrub/chunk projections fuse into
    the post-dedup stage, and the only shuffle is the fingerprint window.
    This is the composition a 100 TB corpus build would submit per
    partition of the crawl output."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit(_CURATION_DUP_TEMPLATE), (F.col("doc_id") % 5).cast("string")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # the gate expressions tokenize every document (CPU-bound JVM work);
    # a one-partition parquet source would serialize them — spread first
    from crawler_ai_spark.session import spread_to_cores

    aug = spread_to_cores(aug, "doc_id")
    t = F.col("text")
    staged = aug.select(
        "doc_id",
        "text",
        TS.lang_id(t).alias("lang_pred"),
        TS.quality_score(t).alias("quality"),
        TS.fingerprint(t).alias("fingerprint"),
    )
    kept = staged.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= _CURATION_MIN_QUALITY)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    scrubbed = kept.withColumn(
        "tx",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL_RX, "<EMAIL>"),
            _PII_PHONE_RX,
            "<PHONE>",
        ),
    )
    return (
        scrubbed.select(
            "doc_id",
            "lang_pred",
            "quality",
            F.posexplode(_chunk_array(F.col("tx"))).alias("chunk_id", "chunk_text"),
        )
        .select(
            "doc_id",
            "lang_pred",
            "quality",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
        )
        .orderBy("doc_id", "chunk_id")
    )


def _training_manifest_oracle() -> str:
    w = CP.PACK_WINDOW
    shard = (
        f"CAST(concat('0x', substr(k, 1, 4)) AS BIGINT) % {CP.SHUFFLE_SHARDS}"
    )
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN {_sql_quote(_CURATION_DUP_TEMPLATE)} || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
lang AS (SELECT * FROM ({_lang_oracle("aug")}) t),
qual AS (SELECT * FROM ({_doc_quality_oracle("aug")}) t),
kept AS (
  SELECT a.doc_id, a.text
  FROM aug a JOIN lang l USING (doc_id) JOIN qual q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.quality >= {_CURATION_MIN_QUALITY}
  QUALIFY row_number() OVER (
    PARTITION BY md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))))
    ORDER BY a.doc_id) = 1
),
keyed AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_RX}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RX}', '<PHONE>', 'g') AS tx,
         md5(concat(CAST(doc_id AS VARCHAR), ':{CP.SHUFFLE_SALT}')) AS k
  FROM kept
),
pos AS (
  SELECT {shard} AS shard_id,
         row_number() OVER (PARTITION BY {shard} ORDER BY k, doc_id) AS position,
         tx
  FROM keyed
),
t AS (
  SELECT shard_id, position,
         CASE WHEN length(trim(regexp_replace(tx, '\\s+', ' ', 'g'))) = 0
              THEN ['{CP.EOD_TOKEN}']
              ELSE string_split(lower(trim(regexp_replace(tx, '\\s+', ' ', 'g'))), ' ')
                   || ['{CP.EOD_TOKEN}']
         END AS stream
  FROM pos
),
o AS (
  SELECT shard_id, position, stream, CAST(len(stream) AS BIGINT) AS doc_len,
         coalesce(sum(CAST(len(stream) AS BIGINT)) OVER (PARTITION BY shard_id ORDER BY position
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT shard_id, position, stream, CAST(w AS BIGINT) AS window_id,
         greatest(0, CAST(w AS BIGINT) * {w} - global_offset) AS a,
         least(doc_len, (CAST(w AS BIGINT) + 1) * {w} - global_offset) AS b
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {w}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {w}) AS BIGINT))) AS u(w)
)
SELECT shard_id, window_id,
       string_agg(array_to_string(list_slice(stream, a + 1, b), ' '), ' ' ORDER BY position) AS window_text,
       CAST(sum(b - a) AS BIGINT) AS n_tokens
FROM e GROUP BY shard_id, window_id ORDER BY shard_id, window_id
"""


@_register("corpus_training_manifest", oracle=_training_manifest_oracle())
def q_corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data capstone as ONE declarative plan:
    lang gate → quality gate → exact dedup → PII scrub → deterministic
    global shuffle → fixed-width sequence packing. Raw crawl text in,
    decorrelated packed training windows out. Three shuffles total at
    any corpus size: the dedup fingerprint window, the shard window
    (whose partitioning the packing offset window REUSES — same key, so
    Catalyst inserts a sort, not a second exchange), and the packing
    regroup. Gates filter before every exchange; the seeded duplicate
    templates keep the dedup stage non-degenerate at the gate SF."""
    from crawler_ai_spark.session import spread_to_cores

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit(_CURATION_DUP_TEMPLATE), (F.col("doc_id") % 5).cast("string")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    aug = spread_to_cores(aug, "doc_id")
    t = F.col("text")
    staged = aug.select(
        "doc_id",
        "text",
        TS.lang_id(t).alias("lang_pred"),
        TS.quality_score(t).alias("quality"),
        TS.fingerprint(t).alias("fingerprint"),
    )
    kept = staged.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= _CURATION_MIN_QUALITY)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    key = F.md5(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(CP.SHUFFLE_SALT))
    )
    # the shard column is named `source` from the start: if the position
    # window partitioned on a differently-named column, the rename below
    # would prune the attribute carrying the partitioning and Catalyst
    # would re-exchange before the packing offset window.
    keyed = kept.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL_RX, "<EMAIL>"),
            _PII_PHONE_RX,
            "<PHONE>",
        ).alias("tx"),
        key.alias("k"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % CP.SHUFFLE_SHARDS)
        .alias("source"),
    )
    pos = F.row_number().over(
        Window.partitionBy("source").orderBy("k", "doc_id")
    )
    shuffled = keyed.select(
        "source",
        pos.cast("long").alias("doc_id"),
        F.col("tx").alias("text"),
    )
    packed = CP.pack_windows(shuffled)
    return packed.select(
        F.col("source").alias("shard_id"), "window_id", "window_text", "n_tokens"
    ).orderBy("shard_id", "window_id")


@_register(
    "doc_dedup_pipeline",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                            ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM ranked WHERE rn = 1
GROUP BY lang ORDER BY lang
""",
)
def q_doc_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation step: normalize → fingerprint-dedup (keep min
    doc_id) → per-language corpus stats. The composed form of D1+A1."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(TS.fingerprint(F.col("text"))).orderBy("doc_id")
    kept = docs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


# ===========================================================================
