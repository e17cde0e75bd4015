"""Local simulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf and compares to
the DuckDB oracle: row count, sorted-column schema, and an
order-insensitive value hash (rows canonicalized, sorted, hashed).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dint_spark.io import TABLES
from dint_spark.session import get_spark


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        if name not in oracles:
            print(f"  {name:<24} rows={len(srows):>7}  (rows-only, no oracle)  {t1-t0:.1f}s")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = value_hash(scols, srows) == value_hash(ocols, orows)
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"  {name:<24} {status} rows={len(srows)}/{len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)}!={sorted(ocols)}'} "
            f"hash={'ok' if ok_hash else 'MISMATCH'}  {t1-t0:.1f}s"
        )
        if not ok_hash and ok_rows and ok_schema:
            # show a diff sample
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = {"|".join(canon(r[i]) for i in order) for r in srows}
            oset = {"|".join(canon(r[i]) for i in oorder) for r in orows}
            print("    spark-only:", sorted(sset - oset)[:3])
            print("    oracle-only:", sorted(oset - sset)[:3])
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
