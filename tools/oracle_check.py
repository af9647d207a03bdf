"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive canonical value hash (FIXTURES.md normalization:
canonical CSV, NULL literal, no scientific notation, sha256).

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return f"{v:f}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon_hash(rows, colnames) -> tuple[str, int]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        ",".join(canon_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, len(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from cubefs_hadoop_spark.catalog import FIXTURE_TABLES
    from cubefs_hadoop_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    names = [n for n in qs if not only or n in only]

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        sh, sn = canon_hash(srows, scols)
        dh, dn = canon_hash(drows, dcols)
        ok = sh == dh and sorted(scols) == sorted(dcols) and sn == dn
        if ok:
            print(f"PASS {name}: {sn} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(
                f"FAIL {name}: rows {sn}/{dn} cols {sorted(scols)}/{sorted(dcols)} "
                f"hash {'==' if sh == dh else '!='}"
            )
            if sn == dn and sorted(scols) == sorted(dcols):
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted(",".join(canon_cell(r[i]) for i in order_s) for r in srows)
                ld = sorted(",".join(canon_cell(r[i]) for i in order_d) for r in drows)
                diffs = [(a, b) for a, b in zip(ls, ld) if a != b][:5]
                for a, b in diffs:
                    print(f"   spark: {a}\n   duck : {b}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
