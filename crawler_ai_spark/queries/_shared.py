"""Shared registry + helpers for the query-catalog family modules.

Registry contract (consumed via crawler_ai_spark.catalog):
  QUERIES[name] -> callable(spark, sf_dir) -> DataFrame
  ORACLES[name] -> DuckDB SQL over the driver-registered views, or
                   absent for non-SQL-expressible ops (rows-only check).
Registration order across family modules IS the catalog order —
catalog.py imports the modules in the canonical sequence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.pipeline import corpus as CP
from crawler_ai_spark.pipeline import dedup as DD
from crawler_ai_spark.pipeline import similarity as SIM
from crawler_ai_spark.pipeline import textstats as TS

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


_SCRATCH_ROOT: str | None = None


def _scratch_dir(prefix: str) -> str:
    """Session-lifetime scratch dir for queries that write an artifact
    (WARC files, LSH index, IVF shards) and then read it back.

    Unlike a per-call mkdtemp that the query must delete in a `finally`
    (which forces a full-result collect() + createDataFrame to survive
    the deletion), dirs created here live until interpreter exit, so the
    returned DataFrame stays a LAZY read of the files — it scales with
    SF like every other catalog query and its scan participates in
    pushdown/pruning. The root is removed once, atexit."""
    import atexit
    import shutil
    import tempfile

    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="crawler_ai_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


# ---------------------------------------------------------------------------
# shared synthesized crawl inputs (documents → urls/links/html)
# ---------------------------------------------------------------------------

_PATH_CASES = [
    "'/careers'",
    "'/careers/senior-engineer-' || doc_id",
    "'/jobs/view/' || doc_id",
    "'/tuyen-dung'",
    "'/blog/post-' || doc_id",
    "'/products/item-' || doc_id",
    "'/about-us'",
    "'/login'",
    "'/job/' || doc_id || '?id=' || doc_id",
    "'/'",
    "'/news/2024/01/story-' || doc_id",
    "'/careers/apply/' || doc_id",
]

# identical CASE in DuckDB syntax (|| auto-casts ints) and Spark SQL
_PATH_CASE_SQL = (
    "CASE (doc_id % 12) "
    + " ".join(f"WHEN {i} THEN {expr}" for i, expr in enumerate(_PATH_CASES))
    + " END"
)
_PATH_CASE_SPARK = (
    "CASE CAST(doc_id % 12 AS INT) "
    + " ".join(
        f"WHEN {i} THEN {expr.replace('doc_id', 'CAST(doc_id AS STRING)')}"
        for i, expr in enumerate(_PATH_CASES)
    )
    + " END"
)

SYNTH_URLS_CTE = f"""
synth_urls AS (
  SELECT doc_id,
         'site' || (doc_id % 37) || '.example.com' AS host,
         {_PATH_CASE_SQL} AS path,
         'https://site' || (doc_id % 37) || '.example.com' || {_PATH_CASE_SQL} AS url
  FROM documents
)"""


def synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("'site' || CAST(doc_id % 37 AS STRING) || '.example.com'").alias("host"),
        F.expr(_PATH_CASE_SPARK).alias("path"),
        F.expr(
            "'https://site' || CAST(doc_id % 37 AS STRING) || '.example.com' || "
            + _PATH_CASE_SPARK
        ).alias("url"),
    )


def _rx_quote(lit: str) -> str:
    """\\Q…\\E literal-quoting — valid in both Java regex and RE2."""
    return "\\Q" + lit.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _any_substr_rx(substrings) -> str:
    return "|".join(_rx_quote(s) for s in substrings)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ===========================================================================
