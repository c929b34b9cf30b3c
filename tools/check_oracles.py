"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, sorts columns by name, canonicalizes values, and
compares row counts + multiset of rows. Usage::

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    """TYPED canonicalization: int vs Decimal vs float must NOT collapse.

    The driver hashes typed values (Arrow-side), so a DuckDB HUGEINT
    (decimal128) result of an integer sum() must FAIL against a Spark BIGINT
    even when numerically equal — cast the oracle SQL, not the checker.
    """
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", f"{v:.9g}")
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("x", v.hex())
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from harvester_spark.session import get_spark

    spark = get_spark("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"....  {name}: no oracle (rows-only) — spark rows={len(s_rows)}")
            continue
        try:
            # Fetch via Arrow: fetchall() coerces HUGEINT→int and hides the
            # exact type the driver hashes; Arrow surfaces decimal128 etc.
            tbl = con.execute(sql).arrow()
            o_cols = [c.lower() for c in tbl.column_names]
            o_rows = [tuple(d.values()) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns {sorted(s_cols)} != {sorted(o_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duckdb={len(o_rows)}")
            n_fail += 1
            continue
        sm, om = rows_multiset(s_cols, s_rows), rows_multiset(o_cols, o_rows)
        if sm != om:
            diffs = [i for i, (a, b) in enumerate(zip(sm, om)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diffs}")
            for i in diffs[:2]:
                print(f"   spark : {sm[i]}")
                print(f"   duckdb: {om[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
