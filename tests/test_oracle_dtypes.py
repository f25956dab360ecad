"""Catalog-wide oracle output-dtype hygiene (round-4 verdict item 1).

The external correctness driver hashes raw cell values, so an oracle
column that materializes in pandas as float64 while the Spark side is
BIGINT ships red even when the numbers agree (`1833.0` vs `1833`) —
exactly what happened to `autothrottle_delays` in round 4: DuckDB emits
SUM()-derived HUGEINT, and HUGEINT lands in pandas as float64. Round 3's
array-column reds were the same disease class in a different organ
(caught by test_catalog_schema.py). This sweep closes the numeric class:

For every oracle, run the DuckDB side at sf0.001 (cheap — tiny data) and
take the Spark side's PLAN schema (analysis only, no execution). Any
column Spark types as integer/boolean whose oracle dtype is float — with
no NULLs to excuse it (a nullable int column becomes float64 in pandas on
BOTH engines, so nulls keep the hash consistent) — is a gate red waiting
for the right sample draw. Oracles must CAST such columns to BIGINT.

The value-level twin of this check is tools/check_oracle.py's
dtype_mismatches(), which compares executed results on both engines at
the gate SF.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from crawler_ai_spark import catalog as C

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_INTEGERISH = (T.BooleanType, T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(C.ORACLES))
def test_oracle_integer_columns_stay_integer(spark, duck, name):
    spark_types = {
        f.name: f.dataType for f in C.QUERIES[name](spark, SF_DIR).schema.fields
    }
    odf = duck.sql(C.ORACLES[name]).df()
    bad = []
    for col, dt in spark_types.items():
        if not isinstance(dt, _INTEGERISH) or col not in odf.columns:
            continue
        if odf[col].dtype.kind == "f" and not odf[col].isna().any():
            bad.append(f"{col} (spark {dt.simpleString()}, oracle float64)")
    assert not bad, (
        f"{name}: oracle emits float for Spark-integer column(s) {bad}; the "
        "driver's value-hash is dtype-sensitive (1833.0 != 1833) — CAST the "
        "oracle column(s) to BIGINT (DuckDB SUM() yields HUGEINT → float64)"
    )
