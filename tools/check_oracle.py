"""Driver-mimicking oracle checker: runs every catalog query on Spark AND
its DuckDB oracle on the same sf dir, compares row count + sorted column
names + order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Exit 0 iff every checked query matches."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def df_to_multiset(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(row[c]) for c in cols) for _, row in pdf.iterrows()]
    return cols, sorted(rows)


def col_kind(pdf, col):
    """Coarse value kind for dtype-strict comparison: 'bool'/'int'/'float'/
    'other'. The driver's value-hash stringifies raw cells, so Spark BIGINT
    1833 vs oracle float64 1833.0 hash-mismatches even when %.9g
    canonicalization (above) would hide it — a kind mismatch is a failure."""
    k = pdf[col].dtype.kind
    if k == "b":
        return "bool"
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "O":
        for v in pdf[col]:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "other"
    return "other"


def dtype_mismatches(sdf, odf):
    """Columns where one engine yields numeric-int/bool and the other float
    (or bool vs int) — the exact class that shipped red in rounds 3 and 4."""
    bad = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        sk, ok_ = col_kind(sdf, c), col_kind(odf, c)
        if sk != ok_ and {sk, ok_} <= {"bool", "int", "float"}:
            bad.append((c, sk, ok_))
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from crawler_ai_spark.catalog import ORACLES, QUERIES
    from crawler_ai_spark.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"~ {name}: rows-only ({len(sdf)} rows, cols={sorted(sdf.columns)})")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {e}")
            continue
        scols, srows = df_to_multiset(sdf)
        ocols, orows = df_to_multiset(odf)
        if scols != ocols:
            failures.append(name)
            print(f"✗ {name}: COLS spark={scols} oracle={ocols}")
            continue
        dmis = dtype_mismatches(sdf, odf)
        if dmis:
            failures.append(name)
            print(f"✗ {name}: DTYPE {dmis} (driver hash is dtype-sensitive)")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"✗ {name}: ROWS spark={len(srows)} oracle={len(orows)}")
            _show_diff(srows, orows)
            continue
        if srows != orows:
            failures.append(name)
            print(f"✗ {name}: VALUES differ (n={len(srows)})")
            _show_diff(srows, orows)
            continue
        print(f"✓ {name}: {len(srows)} rows match")

    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nall checked queries match")


def _show_diff(srows, orows, k=3):
    s, o = set(srows), set(orows)
    for r in list(s - o)[:k]:
        print(f"    spark-only:  {r}")
    for r in list(o - s)[:k]:
        print(f"    oracle-only: {r}")


if __name__ == "__main__":
    main()
