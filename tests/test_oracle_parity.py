"""Pytest gate for the driver contract: every queries() entry matches its
DuckDB oracle at sf0.001 (fast tier; the driver runs sf0.01)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _entries():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from harvester_spark.operators import ALL_QUERIES

    return ALL_QUERIES


@pytest.mark.parametrize("name", list(_entries().keys()))
def test_oracle_parity(spark, duck, name):
    fn, sql = _entries()[name]
    sdf = fn(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(s_rows) >= 0
        return
    cur = duck.execute(sql)
    o_cols = [d[0].lower() for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows), f"{name}: {len(s_rows)} vs {len(o_rows)}"
    assert _multiset(s_cols, s_rows) == _multiset(o_cols, o_rows)


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"rank", "doc_id", "score"}
    assert set(mod.oracle_sql().keys()) <= set(mod.queries().keys())
