"""Catalog-wide output-schema hygiene.

The external correctness driver canonicalizes result rows with a pandas
sort over every column's cells before hashing; ARRAY/MAP/STRUCT cells are
unhashable there (`TypeError: unhashable type: 'list'`), so a query whose
TOP-LEVEL schema contains a non-scalar column ships red even when its
values are byte-for-byte correct — exactly what happened to
`job_analyzers` (technologies ARRAY<STRING>) and `robots_parse`
(disallow_prefixes ARRAY<STRING>) in round 3. Catalog projections must
therefore serialize composite values ('|'-joined text, JSON, etc.);
the underlying operator functions are free to keep their array shapes.

This sweep only needs plan analysis (df.schema), not execution, so it is
cheap enough to run over all queries at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from crawler_ai_spark import catalog as C

SF_DIR = "/root/testdata/sf0.001"

_SCALAR = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
    T.NullType,
)


@pytest.mark.parametrize("name", sorted(C.QUERIES))
def test_catalog_query_returns_only_scalar_columns(spark, name):
    df = C.QUERIES[name](spark, SF_DIR)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, _SCALAR)
    ]
    assert not bad, (
        f"{name} exposes non-scalar top-level column(s) {bad}; the external "
        "driver's hash canonicalizer cannot sort such cells — serialize in "
        "the catalog projection (concat_ws / to_json) and mirror it in the "
        "oracle SQL"
    )
