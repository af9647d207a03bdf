"""Materialized views with incremental maintenance (engine.py): row-local
views over versioned bases refresh from the base's DELTA only; cross-row
views and non-additive base history fall back to full recompute."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import TableAlreadyExistsError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _base(spark, eng, lo, hi, mode="overwrite"):
    df = spark.range(lo, hi).selectExpr("id", "id * 2 AS v")
    eng.write_table_version(df, "b", mode=mode)


def test_row_local_mv_refreshes_incrementally(eng, spark):
    _base(spark, eng, 0, 10)
    eng.create_materialized_view(
        "mv", "SELECT id, v * 10 AS w FROM b WHERE id % 2 = 0", base="b"
    )
    assert eng._mviews()["mv"]["incremental"] is True
    assert sorted(r.id for r in eng.table("mv").collect()) == [0, 2, 4, 6, 8]
    assert eng.mview_staleness("mv") == 0

    _base(spark, eng, 10, 16, mode="append")
    assert eng.mview_staleness("mv") == 1
    res = eng.refresh_materialized_view("mv")
    assert res["mode"] == "incremental"
    got = sorted((r.id, r.w) for r in eng.table("mv").collect())
    assert got == [(i, i * 20) for i in range(0, 16, 2)]
    # the incremental refresh APPENDED a version holding only the delta
    mv_path = eng._table_path("mv")
    delta = versioning.read_changes(spark, mv_path, 1, fs=eng.fs)
    assert sorted(r.id for r in delta.collect()) == [10, 12, 14]
    # no new base commits -> noop
    assert eng.refresh_materialized_view("mv")["mode"] == "noop"


def test_cross_row_mv_refreshes_fully(eng, spark):
    _base(spark, eng, 0, 10)
    eng.execute(
        "CREATE MATERIALIZED VIEW agg AS "
        "SELECT id % 3 AS g, COUNT(*) AS n FROM b GROUP BY id % 3"
    )
    assert eng._mviews()["agg"]["incremental"] is False
    _base(spark, eng, 10, 20, mode="append")
    eng.execute("REFRESH MATERIALIZED VIEW agg")
    got = {(r.g, r.n) for r in eng.table("agg").collect()}
    assert got == {(0, 7), (1, 7), (2, 6)}


def test_nonadditive_base_history_falls_back_to_full(eng, spark):
    _base(spark, eng, 0, 10)
    eng.create_materialized_view(
        "mv", "SELECT id FROM b WHERE id < 100", base="b"
    )
    _base(spark, eng, 0, 4)  # OVERWRITE: read_changes range is non-additive
    res = eng.refresh_materialized_view("mv")
    assert res["mode"] == "full"
    assert sorted(r.id for r in eng.table("mv").collect()) == [0, 1, 2, 3]


def test_mv_name_collisions_and_drop(eng, spark):
    _base(spark, eng, 0, 5)
    eng.create_materialized_view("mv", "SELECT id FROM b", base="b")
    with pytest.raises(TableAlreadyExistsError):
        eng.create_materialized_view("mv", "SELECT id FROM b", base="b")
    with pytest.raises(TableAlreadyExistsError):
        eng.create_view("mv", "SELECT id FROM b")
    eng.execute("DROP MATERIALIZED VIEW mv")
    assert "mv" not in eng._mviews()
    assert not eng.table_exists("mv")


def test_mv_queryable_through_sql(eng, spark):
    _base(spark, eng, 0, 6)
    eng.create_materialized_view(
        "mv", "SELECT id, v FROM b WHERE v >= 6", base="b"
    )
    n = eng.sql("SELECT COUNT(*) AS n FROM mv").first().n
    assert n == 3


def test_explode_view_is_incremental(eng, spark):
    """Generate (explode) is row-local: one base row -> many view rows,
    still maintainable from the delta alone."""
    df = spark.range(0, 3).selectExpr("id", "array(id, id + 100) AS arr")
    eng.write_table_version(df, "b")
    eng.create_materialized_view(
        "ex", "SELECT id, explode(arr) AS e FROM b", base="b"
    )
    assert eng._mviews()["ex"]["incremental"] is True
    eng.write_table_version(
        spark.range(3, 5).selectExpr("id", "array(id, id + 100) AS arr"),
        "b",
        mode="append",
    )
    assert eng.refresh_materialized_view("ex")["mode"] == "incremental"
    got = sorted((r.id, r.e) for r in eng.table("ex").collect())
    want = sorted(
        [(i, i) for i in range(5)] + [(i, i + 100) for i in range(5)]
    )
    assert got == want


def test_refresh_survives_gc_of_base_history(eng, spark):
    """GC (expire_versions) on the base can expire the manifest the MV's
    recorded base_version points at; read_changes then raises
    TableNotFoundError (not EngineIOError).  The refresh must fall back
    to full recompute instead of being permanently stuck (ADVICE r5)."""
    _base(spark, eng, 0, 10)
    eng.create_materialized_view(
        "mv", "SELECT id, v * 10 AS w FROM b WHERE id % 2 = 0", base="b"
    )
    _base(spark, eng, 10, 14, mode="append")
    _base(spark, eng, 14, 16, mode="append")
    # routine GC drops all but the newest base manifest — the MV's
    # recorded base_version (1) is gone
    versioning.expire_versions(
        eng._table_path("b"), keep_last=1, fs=eng.fs, orphan_grace_ms=0
    )
    res = eng.refresh_materialized_view("mv")
    assert res["mode"] == "full"
    got = sorted((r.id, r.w) for r in eng.table("mv").collect())
    assert got == [(i, i * 20) for i in range(0, 16, 2)]
    # and the MV keeps refreshing normally afterwards
    _base(spark, eng, 16, 18, mode="append")
    assert eng.refresh_materialized_view("mv")["mode"] == "incremental"
