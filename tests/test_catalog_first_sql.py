"""Catalog-first Engine.sql() (VERDICT r02 #6): after sync_catalog, a
statement delegates to session-catalog tables and reconciles only entries
dirtied since the last statement — not O(#tables) temp-view
re-registrations per call.  Unsynced engines keep the temp-view bridge
with identical behavior."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse, database="cfsql")
    e.write_table(spark.range(0, 10).selectExpr("id", "id * 2 AS v"), "a")
    e.write_table(spark.range(0, 4).selectExpr("id"), "b")
    yield e
    e.unsync_catalog()
    spark.sql("DROP DATABASE IF EXISTS cfsql CASCADE")


def test_unsynced_engine_uses_temp_view_bridge(eng, monkeypatch):
    calls = {"n": 0}
    orig = Engine.table

    def counting(self, name, **kw):
        calls["n"] += 1
        return orig(self, name, **kw)

    monkeypatch.setattr(Engine, "table", counting)
    assert eng.sql("SELECT count(*) AS n FROM a").first().n == 10
    assert calls["n"] >= 2  # re-registers every table per statement


def test_synced_sql_is_not_o_tables_per_statement(eng, monkeypatch):
    eng.sync_catalog()
    calls = {"tables": 0, "sql": 0}
    orig_table = Engine.table
    orig_sql = type(eng.spark).sql

    def counting_table(self, name, **kw):
        calls["tables"] += 1
        return orig_table(self, name, **kw)

    def counting_sql(self, q, **kw):
        calls["sql"] += 1
        return orig_sql(self, q, **kw)

    monkeypatch.setattr(Engine, "table", counting_table)
    monkeypatch.setattr(type(eng.spark), "sql", counting_sql)
    assert eng.sql("SELECT count(*) AS n FROM a").first().n == 10
    assert calls["tables"] == 0  # no per-table re-registration scans
    assert calls["sql"] == 1  # exactly the user's statement, no DDL


def test_sync_drops_stale_bridge_temp_views(eng, spark):
    """Temp views leaked by the unsynced bridge must not shadow catalog
    tables after syncing — shadowing would silently serve stale data."""
    eng.sql("SELECT 1").collect()  # bridge registers temp views a, b
    eng.append(spark.range(4, 8).selectExpr("id"), "b")
    eng.sync_catalog()
    # catalog-first path must see the append, not the stale temp view
    assert eng.sql("SELECT count(*) AS n FROM b").first().n == 8


def test_synced_sql_sees_engine_writes(eng, spark):
    eng.sync_catalog()
    assert eng.sql("SELECT count(*) AS n FROM a").first().n == 10

    # append -> dirty -> refresh on next statement
    eng.append(spark.range(10, 15).selectExpr("id", "id * 2 AS v"), "a")
    assert eng.sql("SELECT count(*) AS n FROM a").first().n == 15

    # new table -> registered on next statement
    eng.write_table(spark.range(3).selectExpr("id"), "c")
    assert eng.sql("SELECT count(*) AS n FROM c").first().n == 3

    # rename -> old name gone, new name resolves
    eng.rename_table("c", "d")
    assert eng.sql("SELECT count(*) AS n FROM d").first().n == 3
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM c").collect()

    # drop -> unresolvable
    eng.drop_table("d")
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM d").collect()


def test_synced_sql_sees_view_changes(eng):
    eng.sync_catalog()
    eng.create_view("a_big", "SELECT * FROM a WHERE v >= 10")
    assert eng.sql("SELECT count(*) AS n FROM a_big").first().n == 5
    eng.drop_view("a_big")
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM a_big").collect()


def test_synced_sql_restores_current_database(eng):
    prev = eng.spark.catalog.currentDatabase()
    eng.sync_catalog()
    eng.sql("SELECT 1 AS one").collect()
    assert eng.spark.catalog.currentDatabase() == prev


def test_use_other_database_falls_back(eng, spark):
    eng.sync_catalog()
    eng.create_database("other")
    eng.use("other")
    eng.write_table(spark.range(2), "t_other")
    # unsynced database -> temp-view bridge, still correct
    assert eng.sql("SELECT count(*) AS n FROM t_other").first().n == 2


def test_analyze_table_records_cbo_stats(eng, spark):
    """ANALYZE writes size+rowCount (and per-column NDV/min/max) into the
    catalog, and plans then carry the real rowCount — the input CBO needs
    for join reordering at scale."""
    from cubefs_hadoop_spark.errors import EngineIOError

    with pytest.raises(EngineIOError):
        eng.analyze_table("a")  # requires sync_catalog first

    eng.sync_catalog()
    stats = eng.analyze_table("a", columns=["id", "v"])
    assert "10 rows" in stats["summary"]
    assert stats["id"].get("distinct_count") == "10"
    assert stats["v"].get("max") == "18"

    # the optimized plan's statistics now carry the analyzed rowCount
    plan = (
        eng.sql("SELECT * FROM a")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .toString()
    )
    assert "rowCount=10" in plan


def test_synced_sql_sees_other_engines_tables(eng, spark, tmp_warehouse):
    """A SECOND engine writing into the same warehouse: the synced
    engine's per-statement listing pass picks up created and dropped
    tables without a re-sync."""
    eng.sync_catalog()
    other = Engine(spark, tmp_warehouse, database="cfsql")
    other.write_table(spark.range(7).selectExpr("id"), "from_other")
    assert eng.sql("SELECT count(*) AS n FROM from_other").first().n == 7
    other.drop_table("from_other")
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM from_other").collect()


def test_synced_sql_resolves_versioned_tables_to_current_snapshot(eng, spark):
    """A manifest-backed table must never be registered as a raw LOCATION
    catalog table (that would scan every snapshot's files); the
    catalog-first path serves the CURRENT snapshot and tracks commits."""
    eng.write_table_version(spark.range(5).selectExpr("id"), "vt")
    eng.write_table_version(spark.range(3).selectExpr("id"), "vt")  # overwrite
    eng.sync_catalog()
    assert eng.sql("SELECT count(*) AS n FROM vt").first().n == 3  # not 8

    # a new versioned commit is visible on the next statement
    eng.write_table_version(spark.range(7).selectExpr("id"), "vt")
    assert eng.sql("SELECT count(*) AS n FROM vt").first().n == 7

    # DML through the engine too
    eng.delete_from("vt", "id >= 5")
    assert eng.sql("SELECT count(*) AS n FROM vt").first().n == 5


def test_views_over_versioned_tables_track_snapshots(eng, spark):
    """A saved view over a manifest-backed table registers as a temp
    fallback; it must follow new versioned commits, not freeze the
    snapshot captured at sync time."""
    eng.write_table_version(spark.range(4).selectExpr("id"), "vt2")
    eng.create_view("v_big", "SELECT id FROM vt2 WHERE id >= 2")
    eng.sync_catalog()
    assert eng.sql("SELECT count(*) AS n FROM v_big").first().n == 2

    eng.write_table_version(spark.range(10).selectExpr("id"), "vt2")
    assert eng.sql("SELECT count(*) AS n FROM v_big").first().n == 8

    # GC the old snapshot: the refreshed view must not point at dead files
    eng.expire_table_versions("vt2", keep_last=1)
    assert eng.sql("SELECT count(*) AS n FROM v_big").first().n == 8

    eng.drop_view("v_big")
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM v_big").collect()


def test_dropping_versioned_base_prunes_fallback_view(eng, spark):
    """Dropping the base TABLE (not the view) of a temp-fallback view must
    not make unrelated statements fail — the broken view is pruned."""
    eng.write_table_version(spark.range(3).selectExpr("id"), "vt3")
    eng.create_view("v3", "SELECT * FROM vt3")
    eng.sync_catalog()
    assert eng.sql("SELECT count(*) AS n FROM v3").first().n == 3
    eng.drop_table("vt3")
    # unrelated statement still works; the broken view is gone
    assert eng.sql("SELECT 1 AS one").first().one == 1
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM v3").collect()


def test_reconcile_never_drops_user_temp_views(eng, spark, tmp_warehouse):
    """ADVICE r04: the dirty reconcile (and sync_catalog's bridge-view
    sweep) may only dropTempView names THIS engine registered — a
    same-named temp view the user created must survive table churn."""
    eng.sync_catalog()
    # the user's own temp view, named like a table another engine is about
    # to create and drop in the same warehouse
    spark.range(42, 43).selectExpr("id AS user_marker").createOrReplaceTempView(
        "churner"
    )
    other = Engine(spark, tmp_warehouse, database="cfsql")
    other.write_table(spark.range(3).selectExpr("id"), "churner")
    eng.sql("SELECT 1")  # reconcile sees the new table
    other.drop_table("churner")
    eng.sql("SELECT 1")  # reconcile sees the drop — must spare the view
    got = spark.sql("SELECT * FROM churner").collect()
    assert [r.user_marker for r in got] == [42]
    spark.catalog.dropTempView("churner")


def test_sync_catalog_spares_user_temp_view_named_like_table(eng, spark):
    """sync_catalog's pre-registration sweep only clears the engine's own
    bridge views, not a user temp view sharing a table's name."""
    spark.range(7, 8).selectExpr("id AS user_marker").createOrReplaceTempView("a")
    eng.sync_catalog()
    got = spark.sql("SELECT * FROM a").collect()  # temp view still shadows
    assert [r.user_marker for r in got] == [7]
    spark.catalog.dropTempView("a")
    # with the user view gone, the catalog table serves normally
    assert eng.sql("SELECT count(*) AS n FROM a").first().n == 10
