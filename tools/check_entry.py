"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on one Spark
session, runs the matching ``oracle_sql()`` through DuckDB on the same
parquet files, and compares row count + column set + an order-insensitive
value hash (columns sorted by name, rows sorted by their canonical repr).

Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "T" if v else "F"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ").replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as entry_mod
    from newsfeeds_crawler_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows ({spark_s:.1f}s) cols={scols}")
            if len(srows) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        t1 = time.time()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        duck_s = time.time() - t1
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = canon_hash(srows, scols), canon_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK   " if (ok_count and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: spark {len(srows)} rows {spark_s:.1f}s | "
            f"duck {len(orows)} rows {duck_s:.1f}s | cols {ok_cols} | hash {ok_hash}"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_cols:
                print(f"  spark cols {sorted(scols)}\n  duck  cols {sorted(ocols)}")
            if ok_cols and not ok_hash:
                sset = {
                    "|".join(canon_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                oset = {
                    "|".join(canon_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                only_s = list(sset - oset)[:3]
                only_o = list(oset - sset)[:3]
                print(f"  only-spark: {only_s}\n  only-duck : {only_o}")
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
