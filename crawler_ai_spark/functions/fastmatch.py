"""Arrow/RE2 vectorized priority classifier — the scheduler's fast path
for frontier-scale URL scans (O1 at 10^10 URLs).

Why this exists: the pure-JVM twin (``filters.priority_expr``, the O1
rule of scrapy_career_spider.py:327-415) evaluates three trie-compressed
regex alternations with java.util.regex — an NFA that re-tries the
alternation at every string position. Measured on 10M candidate URLs at
local[8], that scan is ~18 s and dominates the whole scheduling pipeline
(windows + bloom dedup together are <6 s). Arrow's
``match_substring_regex`` compiles the SAME pattern with RE2 — a DFA
that scans each string once — and runs it C++-side over Arrow batches:
3.1 s for the identical 10M rows (5.8×, identical result sum), turning
the frontier's dominant stage into a minor one.

Semantics are pinned equal to ``priority_expr``:

- lowering stays in the JVM (callers hand this module ``F.lower(col)``
  output, exactly the case mapping the JVM twin applies), so RE2 only
  ever sees lowercase text and lowercase literal patterns — no
  cross-engine case-folding edge can diverge;
- the patterns are the same ``trie_regex`` strings (plain quoted-literal
  alternation — no backreferences/lookaround, the RE2-unsupported
  features);
- NULL input → priority 10, matching the JVM CASE falling through to
  ``otherwise`` on a NULL condition.

tests/test_fastmatch.py asserts element-wise equality on every keyword,
adversarial unicode/boundary strings, and a 5k random-URL sweep.

This is an ArrowEvalPython stage, deliberately: the "UDFs are the slow
path" doctrine is a default, not a law — it falls to measurement when a
vectorized C++ kernel beats JVM codegen 5.8× on the engine's single
hottest expression. Catalog queries keep the pure-JVM expression (their
oracle SQL mirrors it and their plan pins stay codegen-only); the crawl
loop and the frontier benchmark use this fast path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions.filters import trie_regex

_CAREER_RE = trie_regex(K.CAREER_KEYWORDS)
_NAV_RE = trie_regex(K.NAV_KEYWORDS)
_CONTENT_RE = trie_regex(K.CONTENT_KEYWORDS)

# The session's Arrow batch size (2048, sized for the HTML-parse UDF whose
# rows are whole pages) is far below the sweet spot for this scan of tiny
# URL strings — per-batch Python/conversion overhead was ~40% of the stage
# at 40M rows. The iterator form re-chunks input batches to ~32k rows
# before invoking the RE2 kernels (9.6 s → 6.0 s at 40M×local[8],
# measured), without touching the global batch config that protects the
# big-row UDFs.
_RECHUNK_ROWS = 32768


def _classify(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    def hit(pattern: str) -> np.ndarray:
        m = pc.match_substring_regex(arr, pattern)
        return pc.fill_null(m, False).to_numpy(zero_copy_only=False)

    return np.select(
        [hit(_CAREER_RE), hit(_NAV_RE), hit(_CONTENT_RE)], [100, 80, 50], default=10
    ).astype("int32")


@F.pandas_udf(IntegerType())
def _priority_re2(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    buf: list[pa.Array] = []
    n = 0

    def flush() -> pd.Series:
        arr = pa.chunked_array(buf).combine_chunks()
        return pd.Series(_classify(arr))

    for low in it:
        # force string type: an all-NULL batch would otherwise infer
        # Arrow's null type, which match_substring_regex has no kernel for
        buf.append(pa.Array.from_pandas(low, type=pa.string()))
        n += len(low)
        if n >= _RECHUNK_ROWS:
            yield flush()
            buf, n = [], 0
    if buf:
        yield flush()


def priority_fast(href: Column) -> Column:
    """Drop-in twin of ``filters.priority_expr`` (identical values, 5.8×
    faster at 10M rows): JVM lowering → RE2 trie match → int priority."""
    return _priority_re2(F.lower(href))
