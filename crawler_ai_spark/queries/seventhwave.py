"""Seventh-wave catalog queries (round 4, continued): archive-product
and link-graph derivations layered on the WARC source and the parse
pipeline.

Every query synthesizes its input deterministically from the driver
tables (no external data) and carries a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _scratch_dir, _t

# ---------------------------------------------------------------------------
# WAT derivation (sources/warc.warc_to_wat): WARC response records →
# per-record JSON metadata (the third Common Crawl derivative next to
# WET and CDX). The synthesized html is built by construction — title,
# meta description, and doc_id%4 body anchors are all arithmetic in
# doc_id — so DuckDB re-derives every extracted field from first
# principles while Spark must round-trip the page through WARC framing,
# the real structural parse, to_json, and from_json to reproduce them.
# ---------------------------------------------------------------------------

_WAT_MICROS = "1704067200000000 + doc_id * 1000000"

_WAT_ORACLE = f"""
WITH pages AS (
  SELECT doc_id,
         'https://wat' || (doc_id % 13) || '.example.com/p/' || doc_id AS url,
         make_timestamp({_WAT_MICROS}) AS warc_ts,
         doc_id % 4 AS k
  FROM documents
)
SELECT url,
       strftime(warc_ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts_str,
       'response' AS rec_type,
       CAST(CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS INT) AS status,
       'Page ' || doc_id AS title,
       'Summary ' || (doc_id % 7) AS meta_description,
       CAST(k AS BIGINT) AS n_links,
       CASE k WHEN 0 THEN ''
              WHEN 1 THEN '/p/' || doc_id || '-0'
              WHEN 2 THEN '/p/' || doc_id || '-0|/p/' || doc_id || '-1'
              ELSE '/p/' || doc_id || '-0|/p/' || doc_id || '-1|/p/'
                   || doc_id || '-2' END AS hrefs,
       CASE k WHEN 0 THEN '' WHEN 1 THEN 'go 0' WHEN 2 THEN 'go 0|go 1'
              ELSE 'go 0|go 1|go 2' END AS anchors,
       CASE k WHEN 0 THEN '' WHEN 1 THEN 'body' WHEN 2 THEN 'body|body'
              ELSE 'body|body|body' END AS slots
FROM pages ORDER BY url
"""

_WAT_ANCHOR_SQL = (
    "CASE WHEN doc_id % 4 > {i} THEN"
    " '<a href=\"/p/' || CAST(doc_id AS STRING) || '-{i}\">go {i}</a>'"
    " ELSE '' END"
)

_WAT_HTML_SQL = (
    "'<html><head><title>Page ' || CAST(doc_id AS STRING) || '</title>"
    '<meta name="description" content="Summary \' || CAST(doc_id % 7 AS STRING)'
    " || '\"></head><body>' || "
    + " || ".join(_WAT_ANCHOR_SQL.format(i=i) for i in range(3))
    + " || '</body></html>'"
)


@_register("warc_wat_extract", oracle=_WAT_ORACLE)
def q_warc_wat_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WAT product, end to end: synthesized pages → WARC
    files (per-record gzip) → read back → warc_to_wat JSON metadata →
    from_json(WAT_SCHEMA) → scalar fields. Unlike WET, non-200 records
    keep their metadata. The oracle predicts every field by
    construction, so WARC framing, the structural parse (title / meta
    description / anchor slots+texts), and the JSON round-trip must
    compose to an exact identity."""
    from crawler_ai_spark.sources.warc import (
        WAT_SCHEMA,
        read_warc,
        warc_to_wat,
        write_warc,
    )

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.expr(
            "'https://wat' || CAST(doc_id % 13 AS STRING) || '.example.com/p/'"
            " || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(f"timestamp_micros({_WAT_MICROS})").alias("warc_ts"),
        F.expr(f"CAST(({_WAT_HTML_SQL}) AS BINARY)").alias("html"),
        F.expr("CAST(CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS INT)").alias(
            "status"
        ),
    )
    out = _scratch_dir("warc_wat_")
    write_warc(pages.repartition(8, "url"), out, gzip_records=True).collect()
    wat = warc_to_wat(read_warc(spark, out))
    w = F.from_json(F.col("wat_json"), WAT_SCHEMA)["envelope"]
    meta = w["payload"]["html_meta"]
    return wat.select(
        "url",
        w["warc_header"]["date"].alias("ts_str"),
        w["warc_header"]["type"].alias("rec_type"),
        w["payload"]["status"].alias("status"),
        meta["title"].alias("title"),
        meta["meta_description"].alias("meta_description"),
        F.size(meta["links"]).cast("long").alias("n_links"),
        F.array_join(
            F.transform(meta["links"], lambda l: l["href"]), "|"
        ).alias("hrefs"),
        F.array_join(
            F.transform(meta["links"], lambda l: l["text"]), "|"
        ).alias("anchors"),
        F.array_join(
            F.transform(meta["links"], lambda l: l["slot"]), "|"
        ).alias("slots"),
    ).orderBy("url")


# ---------------------------------------------------------------------------
# MinHash near-dup CLUSTERS over documents (pipeline/dedup.py:
# minhash_lsh_pairs → connected_components): the doc-side twin of
# emb_dup_clusters — pairs say "these two match"; dedup keeps one per
# TRANSITIVE component. Spark: iterative min-label propagation (O(diameter)
# key-join rounds, no collect); DuckDB: recursive-CTE closure over the
# same edge set — independent algorithms, same fixpoint. A seeded 6-node
# chain guarantees multi-hop transitivity is exercised even when the
# natural corpus pairs are disjoint edges.
# ---------------------------------------------------------------------------


def _jaccard_pairs_sql() -> str:
    from crawler_ai_spark.queries.corpusdocs import _jaccard_oracle

    return _jaccard_oracle(0.5)


_DOC_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({_jaccard_pairs_sql()}) t
  UNION ALL
  SELECT doc_id AS a_id, doc_id + 1 AS b_id FROM documents WHERE doc_id < 5
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster_id,
       node = min(label) AS is_keeper
FROM walk GROUP BY node ORDER BY doc_id
"""


@_register("doc_dup_clusters", oracle=_DOC_CLUSTERS_ORACLE)
def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs closed into components, with the
    keep-one-per-cluster decision (keeper = min doc_id — deterministic,
    no tie-break ambiguity). Output covers nodes that appear in at least
    one edge; singletons need no dedup decision."""
    from crawler_ai_spark.pipeline import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_pairs(docs, threshold=0.5).select("a_id", "b_id")
    chain = docs.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id")
    )
    cc = DD.connected_components(pairs.unionByName(chain))
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Open Graph / Twitter-card metadata (functions/ogmeta.py): the synth html
# varies attribute order, quote style, tag presence, and og:type by doc_id
# arithmetic, so DuckDB predicts every value by construction while Spark
# must extract them from the markup with the real regexes.
# ---------------------------------------------------------------------------

_OG_ORACLE = """
WITH pages AS (SELECT doc_id FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 11 = 0 THEN '' ELSE 'OG Title ' || doc_id END AS og_title,
       CASE WHEN doc_id % 11 = 0 THEN ''
            WHEN doc_id % 3 = 0 THEN 'Desc A ' || (doc_id % 7)
            ELSE 'Desc B ' || (doc_id % 7) END AS og_description,
       CASE WHEN doc_id % 11 = 0 THEN ''
            WHEN doc_id % 5 = 0 THEN 'article' ELSE 'website' END AS og_type,
       CASE WHEN doc_id % 11 = 0 OR doc_id % 2 = 0 THEN ''
            ELSE 'https://img.example/i/' || doc_id || '.png' END AS og_image,
       CASE WHEN doc_id % 11 = 0 THEN ''
            WHEN doc_id % 4 = 0 THEN 'summary_large_image'
            ELSE 'summary' END AS twitter_card
FROM pages ORDER BY doc_id
"""


@_register("og_metadata", oracle=_OG_ORACLE)
def q_og_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open Graph + Twitter-card extraction: title (attr order prop-first),
    description (doc_id%3 picks content-FIRST vs prop-first attribute
    order), type (single-quoted), conditional image, twitter:card via
    name=. doc_id%11 pages carry no social meta at all ('' extraction)."""
    from crawler_ai_spark.functions import ogmeta as OG

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = d.cast("string")
    title_tag = F.concat(
        F.lit('<meta property="og:title" content="OG Title '), s, F.lit('">')
    )
    desc_tag = F.when(
        d % 3 == 0,
        F.concat(
            F.lit('<meta content="Desc A '),
            (d % 7).cast("string"),
            F.lit('" property="og:description">'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<meta property="og:description" content="Desc B '),
            (d % 7).cast("string"),
            F.lit('">'),
        )
    )
    type_tag = F.when(
        d % 5 == 0, F.lit("<meta property='og:type' content='article'>")
    ).otherwise(F.lit("<meta property='og:type' content='website'>"))
    img_tag = F.when(d % 2 == 0, F.lit("")).otherwise(
        F.concat(
            F.lit('<meta property="og:image" content="https://img.example/i/'),
            s,
            F.lit('.png">'),
        )
    )
    card_tag = F.when(
        d % 4 == 0,
        F.lit('<meta name="twitter:card" content="summary_large_image">'),
    ).otherwise(F.lit('<meta name="twitter:card" content="summary">'))
    head = F.when(d % 11 == 0, F.lit("")).otherwise(
        F.concat(title_tag, desc_tag, type_tag, img_tag, card_tag)
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")
        ).alias("html"),
    )
    out = OG.with_og_metadata(pages, html_col="html")
    return out.select(
        "doc_id", "og_title", "og_description", "og_type", "og_image", "twitter_card"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Ranked retrieval (pipeline/retrieval.py): the inverted-index postings
# build and BM25 top-k — the query-side capability over the curated
# corpus. DuckDB re-derives postings, document frequencies, and the
# Okapi formula from first principles on the same tokenizer.
# ---------------------------------------------------------------------------

_TOKS_CTE = """
toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
ex AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS ord
  FROM toksed
)
"""

_POSTINGS_ORACLE = f"""
WITH {_TOKS_CTE}
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       CAST(min(ord) - 1 AS INT) AS first_pos
FROM ex GROUP BY doc_id, term ORDER BY doc_id, term
"""


@_register("term_postings", oracle=_POSTINGS_ORACLE)
def q_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index postings rows: (doc_id, term, tf, first_pos) under
    the corpus tokenizer (lowercase whitespace, '' dropped)."""
    from crawler_ai_spark.pipeline import retrieval as R

    docs = _t(spark, sf_dir, "documents")
    return R.postings(docs).orderBy("doc_id", "term")


_BM25_TERMS = ("spark", "window", "join")

_BM25_ORACLE = f"""
WITH {_TOKS_CTE},
dl AS (SELECT doc_id, len(toks) AS dl FROM toksed),
post AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
q AS (SELECT unnest({list(_BM25_TERMS)!r}) AS term),
m AS (SELECT p.doc_id, p.term, p.tf FROM post p JOIN q USING (term)),
dft AS (SELECT term, count(*) AS df FROM m GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl)
SELECT m.doc_id,
       round(sum(
         ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         * CAST(tf AS DOUBLE) * 2.2
         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
       ), 6) AS score,
       CAST(count(*) AS BIGINT) AS n_matched
FROM m JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY m.doc_id ORDER BY score DESC, m.doc_id LIMIT 20
"""


@_register("bm25_topk", oracle=_BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the bag-of-terms query 'spark window join'
    (k1=1.2, b=0.75, Lucene-style non-negative idf). Ties on the
    rounded score break by doc_id — deterministic in both engines."""
    from crawler_ai_spark.pipeline import retrieval as R

    docs = _t(spark, sf_dir, "documents")
    return R.bm25_topk(docs, list(_BM25_TERMS), k=20)


_PROX_ORACLE = f"""
WITH {_TOKS_CTE},
pa AS (SELECT doc_id, list(ord - 1 ORDER BY ord) AS pa FROM ex
       WHERE term = 'spark' GROUP BY doc_id),
pb AS (SELECT doc_id, list(ord - 1 ORDER BY ord) AS pb FROM ex
       WHERE term = 'window' GROUP BY doc_id),
d AS (
  SELECT pa.doc_id,
         CAST(list_min(flatten(list_transform(pa,
              x -> list_transform(pb, y -> abs(x - y))))) AS INT) AS distance
  FROM pa JOIN pb USING (doc_id)
)
SELECT doc_id, distance FROM d WHERE distance <= 5 ORDER BY doc_id
"""


@_register("proximity_match", oracle=_PROX_ORACLE)
def q_proximity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index proximity query: docs where 'spark' and 'window'
    co-occur within 5 tokens, plus the closest pair distance."""
    from crawler_ai_spark.pipeline import retrieval as R

    docs = _t(spark, sf_dir, "documents")
    return R.proximity_match(docs, "spark", "window", window=5).orderBy("doc_id")


_KWIC_ORACLE = """
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
hit AS (
  SELECT doc_id, toks, list_position(toks, 'spark') AS first
  FROM toksed
)
SELECT doc_id,
       CAST(first - 1 AS BIGINT) AS match_pos,
       array_to_string(
         list_slice(toks, greatest(first - 5, 1), least(first + 5, len(toks))),
         ' ') AS snippet
FROM hit WHERE first IS NOT NULL AND first > 0 ORDER BY doc_id
"""


@_register("kwic_snippets", oracle=_KWIC_ORACLE)
def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippets around the first 'spark' occurrence
    (5 tokens each side) — the search-result rendering step over the
    same tokenizer as the index. Map-only."""
    from crawler_ai_spark.pipeline import retrieval as R

    docs = _t(spark, sf_dir, "documents")
    return R.kwic_snippets(docs, "spark", radius=5).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HTML <table> extraction (functions/tables.py): markup tables →
# relational cell rows. The synth page varies header presence (doc_id%2),
# data-row count (doc_id%3 + 1), inner-markup cells, cell attributes, and
# a second table (doc_id%7) — all arithmetic, so DuckDB enumerates the
# expected cells by construction while Spark extracts them from markup.
# ---------------------------------------------------------------------------

_TBL_HEADER = "'<tr><th>Name</th><th class=\"w\">Value</th></tr>'"
_TBL_ROW = (
    "CASE WHEN doc_id % 3 >= {i} THEN"
    " '<tr><td class=\"k\">k' || CAST(doc_id AS STRING) || '-{i}</td>"
    "<td><b>v</b>  {i}</td></tr>' ELSE '' END"
)

_TBL_HTML_SQL = (
    "'<html><body><p>pre</p><table id=\"t0\">'"
    f" || CASE WHEN doc_id % 2 = 0 THEN {_TBL_HEADER} ELSE '' END || "
    + " || ".join(_TBL_ROW.format(i=i) for i in range(3))
    + " || '</table>'"
    " || CASE WHEN doc_id % 7 = 0 THEN '<table><tr><td>solo</td></tr></table>'"
    " ELSE '' END || '</body></html>'"
)

_TBL_ORACLE = """
WITH d AS (SELECT doc_id, doc_id % 2 = 0 AS hdr FROM documents),
hdr_cells AS (
  SELECT doc_id, 0 AS table_idx, 0 AS row_idx, c.col_idx,
         CASE c.col_idx WHEN 0 THEN 'Name' ELSE 'Value' END AS cell,
         TRUE AS is_header
  FROM d, (SELECT unnest([0, 1]) AS col_idx) c WHERE hdr
),
data_cells AS (
  SELECT doc_id,
         0 AS table_idx,
         i + CASE WHEN hdr THEN 1 ELSE 0 END AS row_idx,
         c.col_idx,
         CASE c.col_idx WHEN 0 THEN 'k' || doc_id || '-' || i
              ELSE 'v ' || i END AS cell,
         FALSE AS is_header
  FROM d, (SELECT unnest([0, 1, 2]) AS i) r, (SELECT unnest([0, 1]) AS col_idx) c
  WHERE doc_id % 3 >= i
),
solo AS (
  SELECT doc_id, 1 AS table_idx, 0 AS row_idx, 0 AS col_idx,
         'solo' AS cell, FALSE AS is_header
  FROM d WHERE doc_id % 7 = 0
)
SELECT doc_id, CAST(table_idx AS INT) AS table_idx,
       CAST(row_idx AS INT) AS row_idx, CAST(col_idx AS INT) AS col_idx,
       cell, is_header
FROM (SELECT * FROM hdr_cells UNION ALL SELECT * FROM data_cells
      UNION ALL SELECT * FROM solo)
ORDER BY doc_id, table_idx, row_idx, col_idx
"""


@_register("html_table_cells", oracle=_TBL_ORACLE)
def q_html_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup tables → relational cells: header th detection, inner-tag
    stripping + whitespace collapse, attribute-carrying cells, multiple
    tables per page. Pure-JVM nested regexp + posexplode — map-side."""
    from crawler_ai_spark.functions import tables as TB

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select("doc_id", F.expr(_TBL_HTML_SQL).alias("html"))
    return TB.extract_tables(pages).orderBy(
        "doc_id", "table_idx", "row_idx", "col_idx"
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-vocabulary learning (pipeline/bpe.py): the published
# byte-pair-encoding algorithm at distinct-word grain. The oracle
# re-runs the SAME algorithm in SQL — an unrolled CTE chain of
# pair-count → argmax → replace rounds over the spaced segmentation
# string (replace() is left-to-right non-overlapping in both engines,
# which is what makes the rounds bit-identical).
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 4

_WORDS_CTE = """
toksed AS (
  SELECT list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
words AS (SELECT t.w AS word, count(*) AS cnt FROM toksed, unnest(toks) AS t(w) GROUP BY t.w),
seg0 AS (
  SELECT word, cnt,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS seg
  FROM words)
"""


def _bpe_round_sql(i: int) -> str:
    """ex{i}/p{i}/b{i}/seg{i+1} CTEs: pair counts over seg{i}, the argmax
    pair, and the merged segmentation."""
    return f"""
ex{i} AS (
  SELECT word, cnt,
         unnest(string_split(trim(seg), ' ')) AS sym,
         generate_subscripts(string_split(trim(seg), ' '), 1) AS i
  FROM seg{i}),
p{i} AS (
  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.cnt) AS BIGINT) AS cnt
  FROM ex{i} a JOIN ex{i} b ON a.word = b.word AND b.i = a.i + 1
  GROUP BY a.sym, b.sym),
b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
seg{i + 1} AS (
  SELECT w.word, w.cnt,
         replace(w.seg, ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS seg
  FROM seg{i} w, b{i} b)
"""


_BPE_CHAIN = _WORDS_CTE + "," + ",".join(
    _bpe_round_sql(i) for i in range(_BPE_ROUNDS)
)

_BPE_PAIRS_ORACLE = f"""
WITH {_WORDS_CTE},
ex0 AS (
  SELECT word, cnt,
         unnest(string_split(trim(seg), ' ')) AS sym,
         generate_subscripts(string_split(trim(seg), ' '), 1) AS i
  FROM seg0)
SELECT a.sym AS "left", b.sym AS "right", CAST(sum(a.cnt) AS BIGINT) AS cnt
FROM ex0 a JOIN ex0 b ON a.word = b.word AND b.i = a.i + 1
GROUP BY a.sym, b.sym
ORDER BY cnt DESC, "left", "right" LIMIT 20
"""


@_register("bpe_pair_counts", oracle=_BPE_PAIRS_ORACLE)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 adjacent-symbol pair frequencies over the character
    segmentation (word-count weighted), top 20."""
    from crawler_ai_spark.pipeline import bpe as B

    docs = _t(spark, sf_dir, "documents")
    seg = B.initial_segmentation(B.word_counts(docs))
    return (
        B.pair_counts(seg)
        .select("left", "right", "cnt")
        .orderBy(F.desc("cnt"), "left", "right")
        .limit(20)
    )


_BPE_MERGES_ORACLE = f"""
WITH {_BPE_CHAIN}
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT CAST({i} AS INT) AS merge_idx, l AS left, r AS right, cnt FROM b{i}"
      for i in range(_BPE_ROUNDS)
  )}
) ORDER BY merge_idx
"""


@_register("bpe_merges", oracle=_BPE_MERGES_ORACLE)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 4 learned BPE merges (left, right, pair count at merge
    time) — cnt DESC, lexicographic tie-break, exactly the published
    algorithm's selection rule."""
    from crawler_ai_spark.pipeline import bpe as B

    docs = _t(spark, sf_dir, "documents")
    merges, _ = B.learn_merges(docs, _BPE_ROUNDS)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "merge_idx int, left string, right string, cnt long",
    ).orderBy("merge_idx")


_BPE_SEG_ORACLE = f"""
WITH {_BPE_CHAIN},
top_words AS (SELECT word, cnt FROM words ORDER BY cnt DESC, word LIMIT 30)
SELECT t.word, trim(s.seg) AS segmentation,
       CAST(len(string_split(trim(s.seg), ' ')) AS INT) AS n_pieces
FROM top_words t JOIN seg{_BPE_ROUNDS} s ON t.word = s.word
ORDER BY t.cnt DESC, t.word
"""


@_register("bpe_segment", oracle=_BPE_SEG_ORACLE)
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation of the 30 most frequent corpus words after the 4
    learned merges — what apply-side tokenization produces."""
    from crawler_ai_spark.pipeline import bpe as B

    docs = _t(spark, sf_dir, "documents")
    _, segged = B.learn_merges(docs, _BPE_ROUNDS)
    return (
        segged.orderBy(F.desc("cnt"), "word")
        .limit(30)
        .select(
            "word",
            F.trim("seg").alias("segmentation"),
            F.size(F.split(F.trim("seg"), " ")).alias("n_pieces"),
        )
        .orderBy(F.desc("cnt"), "word")
        .drop("cnt")
    )


# ---------------------------------------------------------------------------
# Flesch readability (pipeline/textstats.readability_columns): the
# augmented text adds a deterministic sentence tail (doc_id%3) so the
# sentence-count path is exercised; DuckDB re-derives words, sentence
# runs, vowel-group syllables, and the published formula.
# ---------------------------------------------------------------------------

_READ_ORACLE = """
WITH aug AS (
  SELECT doc_id,
         text || CASE doc_id % 3 WHEN 0 THEN ''
                 WHEN 1 THEN ' the end.' ELSE ' the end. more to come!' END AS text
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '),
                         t -> t <> '')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM aug
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       CAST(n_sentences AS INT) AS n_sentences,
       CAST(n_syllables AS INT) AS n_syllables,
       CASE WHEN n_words > 0 THEN
         round(206.835 - 1.015 * n_words / n_sentences
               - 84.6 * n_syllables / n_words, 6) END AS flesch
FROM c ORDER BY doc_id
"""


@_register("doc_readability", oracle=_READ_ORACLE)
def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease over the corpus (sentence tail synthesized by
    doc_id%3 so the [.!?] path is live). Map-only, pure JVM."""
    from crawler_ai_spark.pipeline import textstats as TS

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || CASE doc_id % 3 WHEN 0 THEN ''"
            " WHEN 1 THEN ' the end.' ELSE ' the end. more to come!' END"
        ).alias("text"),
    )
    cols = TS.readability_columns(F.col("text"))
    return aug.select(
        "doc_id", *[c.alias(k) for k, c in cols.items()]
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Perceptual image hashing (pipeline/multimodal.image_dhash): the same
# deterministic RGB gradient images as media_decode_features (PNG even /
# BMP odd ids), dHashed after REAL pixel decode + grayscale + 9×8
# nearest-resize. Every step is integer arithmetic on doc_id, so DuckDB
# re-derives the 64 bits from the formula alone — the decode, resample,
# and hash must compose to an exact identity. dup_group_size counts
# hash-identical images (the visual-dedup decision).
# ---------------------------------------------------------------------------

_DHASH_ORACLE = """
WITH g AS (
  SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h FROM documents
),
grid AS (
  SELECT g.doc_id, g.w, g.h, ux.x, uy.y,
         ((((ux.x * g.w) // 9) * 7 + ((uy.y * g.h) // 8) * 13 + g.doc_id) % 256
          + (((ux.x * g.w) // 9) * 7 + ((uy.y * g.h) // 8) * 13 + 29 + g.doc_id) % 256
          + (((ux.x * g.w) // 9) * 7 + ((uy.y * g.h) // 8) * 13 + 58 + g.doc_id) % 256
         ) // 3 AS gray
  FROM g,
       unnest(generate_series(0, 8)) AS ux(x),
       unnest(generate_series(0, 7)) AS uy(y)
),
bits AS (
  SELECT a.doc_id, a.w, a.h, a.y, a.x,
         CASE WHEN a.gray > b.gray THEN '1' ELSE '0' END AS bit
  FROM grid a JOIN grid b
    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
  WHERE a.x < 8
),
hashed AS (
  SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         string_agg(bit, '' ORDER BY y, x) AS dhash_bits
  FROM bits GROUP BY doc_id, w, h
)
SELECT doc_id, width, height, dhash_bits,
       CAST(count(*) OVER (PARTITION BY dhash_bits) AS BIGINT) AS dup_group_size
FROM hashed ORDER BY doc_id
"""


@_register("media_dhash", oracle=_DHASH_ORACLE)
def q_media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash over really-decoded images (PNG even ids / BMP odd), with
    hash-identical group sizes — visual exact-dup detection."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.pipeline.multimodal import (
        encode_bmp,
        encode_png,
        image_dhash,
    )

    def _blob(s):
        out = []
        for d in s:
            d = int(d)
            w, h = 8 + d % 16, 6 + d % 12
            px = bytes(
                ((x * 7 + y * 13 + c * 29 + d) % 256)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_png if d % 2 == 0 else encode_bmp
            out.append(enc(w, h, px, channels=3))
        return pd.Series(out)

    _blob.__annotations__ = {"s": pd.Series, "return": pd.Series}
    blob_udf = pandas_udf(_blob, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), blob_udf(F.col("doc_id")).alias("content")
    )
    hashed = image_dhash(media)
    return hashed.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "dhash_bits",
        F.count("*").over(Window.partitionBy("dhash_bits")).alias("dup_group_size"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# HITS hubs/authorities (operators/hostrank.hits): link-analysis
# complement to host_rank's PageRank, same synthesized host graph, same
# determinism discipline — per-node inflows fold neighbor-sorted, the
# global L2 norm folds host-sorted, every float literal scientific
# notation, so the doubles are bit-identical across engines.
# ---------------------------------------------------------------------------

_HITS_ITERS = 2


def _hits_oracle() -> str:
    from crawler_ai_spark.queries.crawl import _HR_N

    zero = f"{0.0:.17e}"
    one = f"{1.0:.17e}"
    steps = []
    for k in range(1, _HITS_ITERS + 1):
        steps.append(f"""
rawa{k} AS (
  SELECT e.dst AS host,
         list_reduce(list(h.hub ORDER BY e.src), (x, y) -> x + y) AS raw
  FROM edges e JOIN h{k - 1} h ON e.src = h.host GROUP BY e.dst),
za{k} AS (SELECT hosts.host, COALESCE(rawa{k}.raw, {zero}) AS v
          FROM hosts LEFT JOIN rawa{k} USING (host)),
na{k} AS (SELECT sqrt(list_reduce(list(v * v ORDER BY host), (x, y) -> x + y)) AS nrm
          FROM za{k}),
a{k} AS (SELECT host, v / nrm AS auth FROM za{k}, na{k}),
rawh{k} AS (
  SELECT e.src AS host,
         list_reduce(list(a.auth ORDER BY e.dst), (x, y) -> x + y) AS raw
  FROM edges e JOIN a{k} a ON e.dst = a.host GROUP BY e.src),
zh{k} AS (SELECT hosts.host, COALESCE(rawh{k}.raw, {zero}) AS v
          FROM hosts LEFT JOIN rawh{k} USING (host)),
nh{k} AS (SELECT sqrt(list_reduce(list(v * v ORDER BY host), (x, y) -> x + y)) AS nrm
          FROM zh{k}),
h{k} AS (SELECT host, v / nrm AS hub FROM zh{k}, nh{k})""")
    return f"""
WITH hosts AS (SELECT range AS host FROM range({_HR_N})),
synth AS (
  SELECT DISTINCT doc_id % {_HR_N} AS src, (doc_id // {_HR_N}) % {_HR_N} AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % {_HR_N}) != ((doc_id // {_HR_N}) % {_HR_N})),
ring AS (SELECT host AS src, (host + 1) % {_HR_N} AS dst FROM hosts),
edges AS (SELECT DISTINCT src, dst
          FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
h0 AS (SELECT host, {one} AS hub FROM hosts),{",".join(steps)}
SELECT a{_HITS_ITERS}.host, a{_HITS_ITERS}.auth, h{_HITS_ITERS}.hub
FROM a{_HITS_ITERS} JOIN h{_HITS_ITERS} USING (host) ORDER BY host
"""


@_register("host_hits", oracle=_hits_oracle())
def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the synthesized host graph (2 iterations): authority =
    content hosts many hubs cite, hub = portal hosts citing many
    authorities — the second crawl-prioritization signal next to
    PageRank (a frontier can budget authorities for content and hubs
    for discovery)."""
    from crawler_ai_spark.operators.hostrank import hits
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    return hits(edges, hosts, iterations=_HITS_ITERS).orderBy("host")


# ---------------------------------------------------------------------------
# Search capstone: BM25 retrieval → host-PageRank boost → KWIC snippets.
# The rerank window is the BM25 top-20; the final score is
# round(bm25 · (1 + rank), 6) — both factors already bit-identical
# cross-engine (rounded BM25, fold-deterministic rank), so the composed
# ordering is too. The oracle composes the same three oracle fragments.
# ---------------------------------------------------------------------------


def _search_oracle() -> str:
    from crawler_ai_spark.queries.crawl import _HR_N, _host_rank_oracle

    return f"""
WITH bm AS (SELECT * FROM ({_BM25_ORACLE}) t1),
pr AS (SELECT * FROM ({_host_rank_oracle()}) t2),
kw AS (SELECT * FROM ({_KWIC_ORACLE}) t3)
SELECT b.doc_id,
       'h' || (b.doc_id % {_HR_N}) || '.example' AS host,
       round(b.score * (1e0 + pr.rank), 6) AS score,
       kw.snippet
FROM bm b
JOIN pr ON pr.host = b.doc_id % {_HR_N}
JOIN kw ON kw.doc_id = b.doc_id
ORDER BY score DESC, b.doc_id LIMIT 10
"""


@_register("search_pipeline", oracle=_search_oracle())
def q_search_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ranked web search over the corpus: BM25 top-20 for
    'spark window join' (pipeline/retrieval.py), authority-boosted by
    the document's host PageRank (operators/hostrank.py, hosts assigned
    doc_id % N like the host-graph fixture), rendered with the KWIC
    snippet around the first 'spark' hit — top 10. The ranked-retrieval
    twin of the curation capstone (corpus_training_manifest): index,
    rank, boost, render, all in one plan."""
    from crawler_ai_spark.operators.hostrank import host_rank
    from crawler_ai_spark.pipeline import retrieval as R
    from crawler_ai_spark.queries.crawl import _HR_DAMP, _HR_ITERS, _HR_N, synth_host_edges

    docs = _t(spark, sf_dir, "documents")
    bm = R.bm25_topk(docs, list(_BM25_TERMS), k=20).withColumn(
        "host_id", F.col("doc_id") % _HR_N
    )
    edges, hosts = synth_host_edges(spark, sf_dir)
    pr = host_rank(edges, hosts, n_hosts=_HR_N, iterations=_HR_ITERS, damping=_HR_DAMP)
    kw = R.kwic_snippets(docs, "spark", radius=5).select("doc_id", "snippet")
    return (
        bm.join(F.broadcast(pr), bm["host_id"] == pr["host"])
        .join(kw, "doc_id")
        .select(
            "doc_id",
            F.concat(
                F.lit("h"), F.col("host_id").cast("string"), F.lit(".example")
            ).alias("host"),
            F.round(F.col("score") * (F.lit(1.0) + F.col("rank")), 6).alias("score"),
            "snippet",
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Fuzzy benchmark decontamination (pipeline/corpus.decontaminate_fuzzy):
# benchmark = every doc_id%29==0 document; a corpus doc is contaminated
# when its 3-shingle Jaccard to ANY benchmark doc ≥ 0.5 (self-copies
# included by construction — an exact benchmark copy in the corpus IS
# the contamination case). DuckDB re-derives the cross-set Jaccard.
# ---------------------------------------------------------------------------

_FUZZY_DECON_ORACLE = """
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents WHERE text IS NOT NULL
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
bex AS (SELECT doc_id AS bench_id, shingle FROM ex WHERE doc_id % 29 = 0),
dsz AS (SELECT doc_id, count(*) AS d_size FROM ex GROUP BY doc_id),
bsz AS (SELECT bench_id, count(*) AS b_size FROM bex GROUP BY bench_id),
inter AS (
  SELECT e.doc_id, b.bench_id, count(*) AS n_common
  FROM ex e JOIN bex b ON e.shingle = b.shingle
  GROUP BY e.doc_id, b.bench_id
),
scored AS (
  SELECT i.doc_id, i.bench_id,
         CAST(i.n_common AS DOUBLE) / (d.d_size + b.b_size - i.n_common) AS jaccard
  FROM inter i JOIN dsz d USING (doc_id) JOIN bsz b USING (bench_id)
  WHERE CAST(i.n_common AS DOUBLE) / (d.d_size + b.b_size - i.n_common) >= 0.5
),
flagged AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged,
         round(max(jaccard), 6) AS max_jaccard
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(f.n_flagged, 0) AS n_flagged,
       f.max_jaccard,
       COALESCE(f.n_flagged, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents) d
LEFT JOIN flagged f USING (doc_id)
ORDER BY d.doc_id
"""


@_register("doc_decontaminate_fuzzy", oracle=_FUZZY_DECON_ORACLE)
def q_doc_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination against the doc_id%29 benchmark subset —
    near-dup eval-set leakage the exact-gram probe misses."""
    from crawler_ai_spark.pipeline.corpus import decontaminate_fuzzy

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 29 = 0").select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return decontaminate_fuzzy(docs, bench, threshold=0.5).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus token accounting under the learned BPE vocabulary: every doc's
# token instances join the (word → segmentation) vocabulary learned by
# the 4 merge rounds; n_pieces is what the doc costs in training tokens.
# The oracle replays the same merge chain and the same per-doc join.
# ---------------------------------------------------------------------------

_BPE_TOKENS_ORACLE = f"""
WITH docs_toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
words AS (SELECT t.w AS word, count(*) AS cnt FROM docs_toks, unnest(toks) AS t(w) GROUP BY t.w),
seg0 AS (
  SELECT word, cnt,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS seg
  FROM words),
{",".join(_bpe_round_sql(i) for i in range(_BPE_ROUNDS))},
vocab AS (
  SELECT word, len(string_split(trim(seg), ' ')) AS pieces
  FROM seg{_BPE_ROUNDS}
),
inst AS (SELECT doc_id, t.w AS word FROM docs_toks, unnest(toks) AS t(w))
SELECT i.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(v.pieces) AS BIGINT) AS n_pieces,
       round(CAST(sum(v.pieces) AS DOUBLE) / count(*), 6) AS pieces_per_word
FROM inst i JOIN vocab v USING (word)
GROUP BY i.doc_id ORDER BY i.doc_id
"""


@_register("bpe_corpus_tokens", oracle=_BPE_TOKENS_ORACLE)
def q_bpe_corpus_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document training-token cost under the 4-merge BPE vocabulary:
    token instances joined to the learned (word → pieces) table — the
    vocabulary side is tiny and broadcasts; the corpus side stays
    map-side until the per-doc count."""
    from crawler_ai_spark.pipeline import bpe as B
    from crawler_ai_spark.pipeline.dedup import tokens_col

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    _, segged = B.learn_merges(docs, _BPE_ROUNDS)
    vocab = segged.select(
        "word", F.size(F.split(F.trim("seg"), " ")).alias("pieces")
    )
    inst = docs.select(
        "doc_id",
        F.explode(F.filter(tokens_col(F.col("text")), lambda t: t != "")).alias(
            "word"
        ),
    )
    return (
        inst.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("pieces").alias("n_pieces"),
            F.round(
                F.sum("pieces").cast("double") / F.count("*"), 6
            ).alias("pieces_per_word"),
        )
        .orderBy("doc_id")
    )
