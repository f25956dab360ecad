"""Round-4 third wave: redirect-chain resolution, crawl-trap detection,
mirror-host detection (crawl-scale frontier hygiene operators).

See catalog.py for the registry contract and parity rules. Inputs are
synthesized deterministically from documents.doc_id with engine-portable
integer arithmetic (same convention as SYNTH_URLS_CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _t

# ---------------------------------------------------------------------------
# synthesized redirect edges: one edge per document.
#   pos = doc_id % 8, g = doc_id // 8  →  8-link chains;
#   pos < 7         : hop to doc_id+1 (next link in the chain)
#   pos = 7, g%5==0 : hop BACK to the chain head (an 8-cycle)
#   pos = 7, else   : land on the group's terminal page (no out-edge)
# Covers: resolved-at-exactly-max_hops (pos 0 of a full non-cyclic group),
# short chains (pos 6→7), cycles (g%5==0), and ragged chain tails (the
# last group, whose doc_id+1 target has no out-edge and absorbs early).
# ---------------------------------------------------------------------------

_REDIRECT_HOPS = 8


def _u_sql(i: str) -> str:
    return f"'http://h' || CAST(({i}) % 50 AS VARCHAR) || '.test/r/' || CAST({i} AS VARCHAR)"


_REDIRECT_EDGES_CTE = f"""
redirect_edges AS (
  SELECT {_u_sql('doc_id')} AS src,
         CASE WHEN doc_id % 8 < 7 THEN {_u_sql('doc_id + 1')}
              WHEN (doc_id // 8) % 5 = 0 THEN {_u_sql('(doc_id // 8) * 8')}
              ELSE 'http://h' || CAST((doc_id // 8) % 50 AS VARCHAR)
                   || '.test/final/' || CAST(doc_id // 8 AS VARCHAR)
         END AS dst
  FROM documents
)"""


def _u_col(i):
    return F.concat(
        F.lit("http://h"),
        (i % 50).cast("string"),
        F.lit(".test/r/"),
        i.cast("string"),
    )


def synth_redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    g = F.floor(d / 8).cast("long")
    dst = (
        F.when(d % 8 < 7, _u_col(d + 1))
        .when(g % 5 == 0, _u_col(g * 8))
        .otherwise(
            F.concat(
                F.lit("http://h"),
                (g % 50).cast("string"),
                F.lit(".test/final/"),
                g.cast("string"),
            )
        )
    )
    return (
        _t(spark, sf_dir, "documents")
        .select(_u_col(d).alias("src"), dst.alias("dst"))
    )


@_register(
    "redirect_resolve",
    # Independent re-derivation: a step-at-a-time recursive walk with
    # terminal absorption (the join fails at a URL with no out-edge),
    # capped at 8 hops — per url the deepest row is the landing state,
    # exactly what 3 pointer-doubling rounds compute (min(L, 8) hops).
    oracle=f"""
WITH RECURSIVE {_REDIRECT_EDGES_CTE},
walk(url, cur, hops) AS (
  SELECT src, dst, 1 FROM redirect_edges
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1
  FROM walk w JOIN redirect_edges e ON e.src = w.cur
  WHERE w.hops < {_REDIRECT_HOPS}
),
last AS (SELECT url, max(hops) AS hops FROM walk GROUP BY url)
SELECT w.url AS url, w.cur AS final_url, CAST(w.hops AS INT) AS hops,
       w.cur NOT IN (SELECT src FROM redirect_edges) AS resolved
FROM walk w JOIN last l ON l.url = w.url AND l.hops = w.hops
ORDER BY url
""",
)
def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-alias chains collapsed by pointer doubling — ceil(log2(8))=3
    self-joins resolve every chain up to 8 hops; cycles come back
    resolved=false (reference follows redirects one URL at a time inside
    requests; at frontier scale the alias map is a table)."""
    from crawler_ai_spark.operators.redirects import resolve_redirects

    edges = synth_redirect_edges(spark, sf_dir)
    return resolve_redirects(edges, max_hops=_REDIRECT_HOPS).orderBy("url")
