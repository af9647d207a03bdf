"""t2 replica: every registered query hash-matches its DuckDB oracle at the
test scale factor (sf0.001 by default; set SPARK_GRAFT_TEST_SF_DIR=sf0.01
for the driver scale).  Queries without an oracle get a rows-run check."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from oracle_check import (
    DriverIncompatibleOutput,
    canon_hash,
    reject_driver_incompatible,
)
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


def test_guard_rejects_nested_cells():
    """The replica must FAIL what the driver fails: top-level list /
    ndarray / dict cells crash the driver's sort_values canonicalizer
    (x43 was sweep-green / driver-red in r08).  Pin the guard on a
    fixture frame per nested type, and pin that scalars pass."""
    import numpy as np
    import pandas as pd

    for bad in ([1, 2], (1, 2), np.array([1, 2]), {"a": 1}, {1, 2}):
        pdf = pd.DataFrame({"id": [1, 2], "payload": [bad, None]})
        with pytest.raises(DriverIncompatibleOutput):
            reject_driver_incompatible(pdf, "spark")
    ok = pd.DataFrame(
        {"id": [1, None], "s": ["a", None], "f": [1.5, float("nan")]}
    )
    reject_driver_incompatible(ok, "spark")  # scalars sail through


def test_guard_scans_past_first_scalar_cell():
    """ADVICE r9: a mixed-type object column whose FIRST non-null value
    is scalar but which holds nested cells later must still trip the
    guard — one cell does not decide an object dtype."""
    import pandas as pd

    pdf = pd.DataFrame({"id": [1, 2, 3], "payload": ["ok", None, [1, 2]]})
    with pytest.raises(DriverIncompatibleOutput):
        reject_driver_incompatible(pdf, "spark")


def test_guard_catches_array_valued_query(spark):
    """An array-valued registry declaration must trip the guard — the
    exact fixture shape the r08 driver rejected for x43."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.semantic import jl_project

    pdf = (
        jl_project(load(spark, SF_ORACLE, "embeddings"))
        .limit(3)
        .toPandas()
    )
    with pytest.raises(DriverIncompatibleOutput):
        reject_driver_incompatible(pdf, "spark")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    # Both sides canonicalize through pandas — the driver-faithful path
    # (DuckDB .df() renders DECIMAL/HUGEINT as float64; see oracle_check).
    sdf = QUERIES[name](spark, SF_ORACLE)
    spdf = sdf.toPandas()
    reject_driver_incompatible(spdf, "spark")
    if name not in ORACLES:
        assert len(spdf) >= 0  # rows-only contract
        return
    dpdf = duck.sql(ORACLES[name]).df()
    reject_driver_incompatible(dpdf, "duckdb")
    assert sorted(spdf.columns) == sorted(dpdf.columns), "column sets differ"
    sh, sn = canon_hash(spdf)
    dh, dn = canon_hash(dpdf)
    assert sn == dn, f"row counts differ: spark={sn} duck={dn}"
    assert sh == dh, "value hash mismatch"
