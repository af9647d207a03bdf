"""t2 replica: every registered query hash-matches its DuckDB oracle at the
test scale factor (sf0.001 by default; set SPARK_GRAFT_TEST_SF_DIR=sf0.01
for the driver scale).  Queries without an oracle get a rows-run check."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from oracle_check import canon_hash
from tests.conftest import SF_ORACLE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_registry_shape():
    assert len(QUERIES) >= 55
    # every oracle key must have a query
    assert set(ORACLES) <= set(QUERIES)
    # the large majority of queries must be oracle-checked
    assert len(ORACLES) >= len(QUERIES) - 3


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base",
        "sum_disc", "avg_qty", "cnt",
    ]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    # Both sides canonicalize through pandas — the driver-faithful path
    # (DuckDB .df() renders DECIMAL/HUGEINT as float64; see oracle_check).
    sdf = QUERIES[name](spark, SF_ORACLE)
    spdf = sdf.toPandas()
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only contract
        return
    dpdf = duck.sql(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), "column sets differ"
    sh, sn = canon_hash(spdf)
    dh, dn = canon_hash(dpdf)
    assert sn == dn, f"row counts differ: spark={sn} duck={dn}"
    assert sh == dh, "value hash mismatch"
