"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
in DuckDB at sf0.01, then compares row count, sorted column names, and an
order-insensitive value multiset (cells normalized: floats via repr of
round-trip, timestamps to ISO, arrays to tuples). Prints per-query status.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    import datetime as dt
    import math

    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main():
    import __spark_entry__ as entrymod
    from ares_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — spark rows={len(srows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sn = normalize(srows, scols)
        dn = normalize(drows, dcols)
        ok_vals = sn == dn
        if ok_cols and ok_count and ok_vals:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: cols_ok={ok_cols} count {len(srows)} vs {len(drows)}")
            if not ok_cols:
                print(f"     spark cols: {sorted(scols)}\n     duck  cols: {sorted(dcols)}")
            if ok_cols and sn != dn:
                diff_s = [r for r in sn if r not in dn][:3]
                diff_d = [r for r in dn if r not in sn][:3]
                print(f"     spark-only: {diff_s}")
                print(f"     duck-only : {diff_d}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
