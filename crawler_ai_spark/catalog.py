"""The engine's query catalog — every operator exposed as a named query
plus (where ANSI-SQL-expressible) an independently-written DuckDB oracle.

Registry contract (consumed by __spark_entry__.py / the driver):
  QUERIES[name] -> callable(spark, sf_dir) -> DataFrame
  ORACLES[name] -> SQL string over the driver's pre-registered views
                   (region nation customer supplier part orders lineitem
                    events documents embeddings), or absent for ops that
                   are not SQL-expressible (driver then does a weaker
                   rows-only check).

Parity rules that keep the cross-engine value-hash honest:
- every computed column is aliased identically on both sides;
- money/quantity sums are integer-scaled (cents) BIGINTs — float sums are
  accumulation-order-dependent and would hash-differ;
- ratio doubles come from identical integer inputs with identical
  expression shape, rounded to 6;
- keyword/classifier constants are shared (the oracle SQL is *generated*
  from the same Python tuples the Spark expressions use — same data,
  independently-written logic per engine);
- synthesized crawl inputs (urls, links, html) derive deterministically
  from documents.doc_id with engine-portable arithmetic, no randomness.
"""

from __future__ import annotations

# Shared registry + helpers (the authoritative QUERIES/ORACLES dicts and
# the synthesized-input helpers live here; re-exported for compatibility)
from crawler_ai_spark.queries._shared import (  # noqa: F401
    ORACLES,
    QUERIES,
    SYNTH_URLS_CTE,
    _any_substr_rx,
    _register,
    _rx_quote,
    _sql_quote,
    _t,
    synth_urls,
)

# Family modules register their queries on import — THIS ORDER IS THE
# CATALOG ORDER (the driver contract returns it verbatim; keep stable).
from crawler_ai_spark.queries import crawl as _crawl  # noqa: E402,F401
from crawler_ai_spark.queries import relational as _relational  # noqa: E402,F401
from crawler_ai_spark.queries import corpusdocs as _corpusdocs  # noqa: E402,F401
from crawler_ai_spark.queries import embeddings as _embeddings  # noqa: E402,F401
from crawler_ai_spark.queries import secondwave as _secondwave  # noqa: E402,F401
from crawler_ai_spark.queries import jobs as _jobs  # noqa: E402,F401
from crawler_ai_spark.queries import scoring as _scoring  # noqa: E402,F401
from crawler_ai_spark.queries import extended as _extended  # noqa: E402,F401
from crawler_ai_spark.queries import thirdwave as _thirdwave  # noqa: E402,F401
from crawler_ai_spark.queries import fourthwave as _fourthwave  # noqa: E402,F401
from crawler_ai_spark.queries import fifthwave as _fifthwave  # noqa: E402,F401
from crawler_ai_spark.queries import sixthwave as _sixthwave  # noqa: E402,F401
from crawler_ai_spark.queries import seventhwave as _seventhwave  # noqa: E402,F401
from crawler_ai_spark.queries import eighthwave as _eighthwave  # noqa: E402,F401
from crawler_ai_spark.queries import ninthwave as _ninthwave  # noqa: E402,F401

# test_container_parity drives the template fixtures directly
from crawler_ai_spark.queries.extended import _CONTAINER_TEMPLATES  # noqa: E402,F401
