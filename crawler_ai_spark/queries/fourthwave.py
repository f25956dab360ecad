"""Round-4 fourth wave: persistent incremental MinHash-LSH dedup index
(build → probe → survivors → append), the cross-run generalization of
the in-corpus dedup operators for a continuous crawl.

See catalog.py for the registry contract and parity rules. The corpus /
batch split is derived deterministically from documents.doc_id so both
engines see identical halves. The Spark side goes through the persisted
index (parquet buckets + hashed-shingle table, pipeline/dedup_index.py);
the DuckDB oracle recomputes the semantics as brute-force cross-half
Jaccard — equality holds because LSH candidates are exact-verified
(precision exact) and band-miss recall at 32×2 bands is the same
≥ 1-1e-4 bar the long-green ``doc_minhash_dups`` query already clears
on this fixture's pair population.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.functions import charset as CS
from crawler_ai_spark.operators import anchortext as AT
from crawler_ai_spark.pipeline import dedup_index as DI
from crawler_ai_spark.queries._shared import _register, _scratch_dir, _t

# deterministic split: residue 0 = probe batch B, 4 = first batch A,
# 1-3 = the pre-indexed corpus (documents has 500 rows at sf0.01)
_CORPUS = "doc_id % 5 IN (1, 2, 3)"
_BATCH_A = "doc_id % 5 = 4"
_BATCH_B = "doc_id % 5 = 0"

# brute cross-half Jaccard in DuckDB: pairs (idx side, new side) at the
# same tokenize → distinct-3-gram-shingle semantics as dedup.py
_XHALF_CORE = """
toksed AS (
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
sizes AS (SELECT doc_id, count(*) AS set_size FROM ex GROUP BY doc_id)
"""


def _xhalf_pairs(idx_pred: str, new_pred: str, alias: str) -> str:
    """CTE: near-dup pairs (new_id, idx_id, jaccard ≥ 0.5) between an
    index-side predicate and a batch-side predicate over documents."""
    return f"""
{alias} AS (
  SELECT i.new_id, i.idx_id,
         round(CAST(i.n_common AS DOUBLE) /
               (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
  FROM (
    SELECT b.doc_id AS new_id, a.doc_id AS idx_id, count(*) AS n_common
    FROM ex a JOIN ex b ON a.shingle = b.shingle
    WHERE (a.{idx_pred}) AND (b.{new_pred})
    GROUP BY b.doc_id, a.doc_id
  ) i
  JOIN sizes sa ON sa.doc_id = i.idx_id
  JOIN sizes sb ON sb.doc_id = i.new_id
  WHERE CAST(i.n_common AS DOUBLE)
        / (sa.set_size + sb.set_size - i.n_common) >= 0.5
)
"""


_PROBE_ORACLE = f"""
WITH {_XHALF_CORE},
{_xhalf_pairs(_CORPUS, _BATCH_B, "pairs")}
SELECT new_id, idx_id, jaccard FROM pairs ORDER BY new_id, idx_id
"""


@_register("lsh_index_probe", oracle=_PROBE_ORACLE)
def q_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted LSH index over the corpus split, then probe a
    new batch against it — the incremental-crawl dedup primitive. The
    probe plan touches only the batch's (band_id, band_hash) buckets
    plus candidate shingle rows, never the corpus text."""
    docs = _t(spark, sf_dir, "documents")
    path = _scratch_dir("lsh_index_probe_")
    DI.build_lsh_index(docs.where(_CORPUS), path)
    return DI.probe_lsh_index(docs.where(_BATCH_B), path, threshold=0.5).orderBy(
        "new_id", "idx_id"
    )


_INCR_ORACLE = f"""
WITH {_XHALF_CORE},
{_xhalf_pairs(_CORPUS, _BATCH_A, "pairs_a")},
survivors_a AS (
  SELECT doc_id FROM documents
  WHERE {_BATCH_A} AND doc_id NOT IN (SELECT new_id FROM pairs_a)
),
{_xhalf_pairs(f"doc_id IN (SELECT doc_id FROM documents WHERE {_CORPUS} "
              "UNION ALL SELECT doc_id FROM survivors_a)", _BATCH_B, "pairs_b")}
SELECT new_id, idx_id, jaccard FROM pairs_b ORDER BY new_id, idx_id
"""


@_register("lsh_index_incremental", oracle=_INCR_ORACLE)
def q_lsh_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch incremental round: index the corpus, dedup batch A
    against it, APPEND A's survivors (O(batch) new files, no index
    rewrite), then probe batch B — whose matches now include near-dups
    of A's survivors, proving the appended state is live."""
    docs = _t(spark, sf_dir, "documents")
    path = _scratch_dir("lsh_index_incr_")
    DI.build_lsh_index(docs.where(_CORPUS), path)
    survivors_a = DI.dedup_against_index(docs.where(_BATCH_A), path, threshold=0.5)
    DI.append_to_index(survivors_a, path)
    return DI.probe_lsh_index(docs.where(_BATCH_B), path, threshold=0.5).orderBy(
        "new_id", "idx_id"
    )


# ---------------------------------------------------------------------------
# charset sniffing (functions/charset.py) — synthesized HTTP responses:
# body bytes as their lossless latin-1 string view (byte 0xNN ≡ codepoint
# U+00NN), built with chr() arithmetic so both engines construct
# IDENTICAL codepoint sequences. Six cases cover each precedence rung
# and one alias canonicalization:
#   0: UTF-8 BOM + CONFLICTING header        → utf-8      (BOM wins)
#   1: invalid-UTF-8 body + charset=latin1   → iso-8859-1 (header wins, alias)
#   2: <meta charset="Shift_JIS">, no header → shift_jis
#   3: valid non-ASCII UTF-8, NULL header    → utf-8      (heuristic)
#   4: invalid UTF-8 byte, empty header      → windows-1252 (fallback)
#   5: UTF-16LE BOM                          → utf-16le
# ---------------------------------------------------------------------------

_RESP_BODY_SQL = """CASE doc_id % 6
  WHEN 0 THEN chr(239) || chr(187) || chr(191) || '<html>bom page'
  WHEN 1 THEN 'caf' || chr(233) || ' declared latin one'
  WHEN 2 THEN '<html><head><meta charset="Shift_JIS"></head><body>jp'
  WHEN 3 THEN 'caf' || chr(195) || chr(169) || ' looks like utf eight'
  WHEN 4 THEN 'caf' || chr(233)
  ELSE chr(255) || chr(254) || 'le'
END"""

_RESP_CT_SQL = """CASE doc_id % 6
  WHEN 0 THEN 'text/html; charset=windows-1252'
  WHEN 1 THEN 'text/html; charset=latin1'
  WHEN 2 THEN 'text/html'
  WHEN 3 THEN NULL
  WHEN 4 THEN ''
  ELSE 'application/octet-stream'
END"""

_CANON_SQL = """CASE
  WHEN {c} IN ('utf8', 'unicode-1-1-utf-8') THEN 'utf-8'
  WHEN {c} IN ('latin1', 'latin-1', 'iso8859-1', 'iso_8859-1', 'l1', 'cp819')
    THEN 'iso-8859-1'
  WHEN {c} IN ('cp1252', 'x-cp1252', 'ansi_x3.4-1968', 'ascii', 'us-ascii')
    THEN 'windows-1252'
  WHEN {c} IN ('shift-jis', 'sjis', 'x-sjis') THEN 'shift_jis'
  ELSE {c}
END"""

_CHARSET_ORACLE = f"""
WITH resp AS (
  SELECT doc_id, {_RESP_BODY_SQL} AS body, {_RESP_CT_SQL} AS content_type
  FROM documents
),
extracted AS (
  SELECT doc_id, body, content_type,
    nullif(regexp_extract(coalesce(content_type, ''),
                          '{CS.HDR_CHARSET_RE}', 1), '') AS hdr_label,
    nullif(regexp_extract(substr(body, 1, {CS.SNIFF_BYTES}),
                          '{CS.META_CHARSET_RE}', 1), '') AS meta_label
  FROM resp
)
SELECT doc_id,
  coalesce(
    CASE WHEN body LIKE chr(239) || chr(187) || chr(191) || '%' THEN 'utf-8'
         WHEN body LIKE chr(255) || chr(254) || '%' THEN 'utf-16le'
         WHEN body LIKE chr(254) || chr(255) || '%' THEN 'utf-16be' END,
    {_CANON_SQL.format(c="lower(hdr_label)")},
    {_CANON_SQL.format(c="lower(meta_label)")},
    CASE WHEN regexp_full_match(body, '{CS.UTF8_GRAMMAR}')
         THEN 'utf-8' ELSE 'windows-1252' END
  ) AS charset
FROM extracted ORDER BY doc_id
"""


@_register("charset_sniff", oracle=_CHARSET_ORACLE)
def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHATWG-order charset sniffing (BOM → header → <meta> → UTF-8
    grammar heuristic) as pure codegen expressions over the latin-1
    byte view; see functions/charset.py."""
    docs = _t(spark, sf_dir, "documents")
    resp = docs.select(
        "doc_id",
        F.expr(_RESP_BODY_SQL).alias("body"),
        F.expr(_RESP_CT_SQL).alias("content_type"),
    )
    return resp.select(
        "doc_id",
        CS.sniff_charset(F.col("body"), F.col("content_type")).alias("charset"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# anchor-text rollup (operators/anchortext.py) — synthesized link edges:
# each document emits 3 out-links (j = 0..2) to a 120-page target space
# with engine-portable integer arithmetic; the anchor is a 3-token slice
# of the SOURCE doc's text, so anchor vocabulary correlates with real
# fixture text (stopwords, ties, empty anchors all occur naturally).
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{s}'" for s in AT.STOPWORDS_EN)

_EDGES_SQL_DUCK = """
edges AS (
  SELECT 'h' || CAST(d.doc_id % 50 AS VARCHAR) || '.test' AS src_host,
         'http://site' || CAST(((d.doc_id * (j.j * 2 + 3)) % 120) % 20 AS VARCHAR)
           || '.test/page/' || CAST((d.doc_id * (j.j * 2 + 3)) % 120 AS VARCHAR)
           AS dst_url,
         array_to_string(
           (string_split(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))), ' '))
             [(1 + (d.doc_id + j.j) % 5):(3 + (d.doc_id + j.j) % 5)], ' ') AS anchor
  FROM documents d, (SELECT unnest(range(0, 3)) AS j) j
)
"""

_ANCHOR_ORACLE = f"""
WITH {_EDGES_SQL_DUCK},
terms AS (
  SELECT dst_url,
         unnest(list_filter(
           list_distinct(string_split(
             lower(trim(regexp_replace(anchor, '\\s+', ' ', 'g'))), ' ')),
           t -> t != '' AND NOT list_contains([{_STOP_SQL}], t))) AS term
  FROM edges
),
tc AS (SELECT dst_url, term, count(*) AS cnt FROM terms GROUP BY dst_url, term),
ranked AS (
  SELECT dst_url, term,
         row_number() OVER (PARTITION BY dst_url ORDER BY cnt DESC, term ASC) AS rk
  FROM tc
),
top AS (
  SELECT dst_url, array_to_string(list(term ORDER BY rk), '|') AS top_terms
  FROM ranked WHERE rk <= 3 GROUP BY dst_url
),
deg AS (
  SELECT dst_url, count(*) AS in_degree,
         count(DISTINCT src_host) AS n_src_hosts
  FROM edges GROUP BY dst_url
)
SELECT d.dst_url, d.in_degree, d.n_src_hosts,
       coalesce(t.top_terms, '') AS top_terms
FROM deg d LEFT JOIN top t USING (dst_url)
ORDER BY dst_url
"""


def _synth_anchor_edges(docs: DataFrame) -> DataFrame:
    toks = "split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' ')"
    return docs.select(
        "doc_id", "text", F.explode(F.expr("sequence(0, 2)")).alias("j")
    ).select(
        F.expr("concat('h', CAST(doc_id % 50 AS STRING), '.test')").alias("src_host"),
        F.expr(
            "concat('http://site', CAST(((doc_id * (j * 2 + 3)) % 120) % 20 AS STRING),"
            " '.test/page/', CAST((doc_id * (j * 2 + 3)) % 120 AS STRING))"
        ).alias("dst_url"),
        F.expr(
            f"array_join(slice({toks}, CAST(1 + (doc_id + j) % 5 AS INT), 3), ' ')"
        ).alias("anchor"),
    )


@_register("anchor_text_rollup", oracle=_ANCHOR_ORACLE)
def q_anchor_text_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per link target: in-degree, distinct linking hosts, top-3 anchor
    terms — the web-graph relevance signal; see operators/anchortext.py
    for the 100 TB shuffle shape."""
    docs = _t(spark, sf_dir, "documents")
    return AT.anchor_text_rollup(_synth_anchor_edges(docs)).orderBy("dst_url")
