"""Engine.execute — the Hive/FsShell-parity statement surface (SURVEY §3
E3): CTAS, INSERT INTO, DROP TABLE, SHOW TABLES, DESCRIBE routed onto the
storage contract."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError, TableNotFoundError
from tests.conftest import SF_SMOKE


@pytest.fixture()
def eng(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.write_table(
        load(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name"),
        "nation",
    )
    return e


def test_ctas_and_show_tables(eng):
    eng.execute("CREATE TABLE big_nations AS SELECT * FROM nation WHERE n_nationkey >= 10")
    assert eng.table("big_nations").count() == eng.table("nation").filter(
        "n_nationkey >= 10"
    ).count()
    shown = {r.table for r in eng.execute("SHOW TABLES").collect()}
    assert shown == {"nation", "big_nations"}


def test_ctas_if_not_exists_is_idempotent(eng):
    eng.execute("CREATE TABLE t1 AS SELECT * FROM nation")
    eng.execute("CREATE TABLE IF NOT EXISTS t1 AS SELECT * FROM nation")
    from cubefs_hadoop_spark.errors import TableAlreadyExistsError

    with pytest.raises(TableAlreadyExistsError):
        eng.execute("CREATE TABLE t1 AS SELECT * FROM nation")


def test_insert_into_appends_and_validates_schema(eng):
    n = eng.table("nation").count()
    eng.execute("INSERT INTO nation SELECT * FROM nation")
    assert eng.table("nation").count() == 2 * n
    with pytest.raises(EngineIOError, match="column mismatch"):
        eng.execute("INSERT INTO nation SELECT n_nationkey FROM nation")


def test_drop_table_statement(eng):
    eng.execute("CREATE TABLE doomed AS SELECT * FROM nation")
    eng.execute("DROP TABLE doomed")
    assert not eng.table_exists("doomed")
    with pytest.raises(TableNotFoundError):
        eng.execute("DROP TABLE doomed")
    eng.execute("DROP TABLE IF EXISTS doomed")  # no raise


def test_describe_and_query_passthrough(eng):
    d = eng.execute("DESCRIBE nation")
    assert {"file", "size", "mtime_ms", "is_marker"} <= set(d.columns)
    res = eng.execute("SELECT COUNT(*) AS c FROM nation")
    assert res.first().c == eng.table("nation").count()


def test_views_persist_and_track_table_data(eng, spark, tmp_warehouse):
    eng.execute("CREATE VIEW big AS SELECT * FROM nation WHERE n_nationkey >= 10")
    n1 = eng.sql("SELECT COUNT(*) AS c FROM big").first().c
    assert n1 == eng.table("nation").filter("n_nationkey >= 10").count()
    # views are lazy over current data: appending to the base table shows up
    eng.execute("INSERT INTO nation SELECT * FROM nation")
    assert eng.sql("SELECT COUNT(*) AS c FROM big").first().c == 2 * n1
    # persisted as metadata: a fresh Engine over the same warehouse sees it
    from cubefs_hadoop_spark.engine import Engine

    eng2 = Engine(spark, tmp_warehouse)
    assert eng2.list_views() == ["big"]
    assert eng2.sql("SELECT COUNT(*) AS c FROM big").first().c == 2 * n1


def test_view_name_collisions_and_drop(eng):
    from cubefs_hadoop_spark.errors import TableAlreadyExistsError, TableNotFoundError

    eng.execute("CREATE VIEW v1 AS SELECT n_name FROM nation")
    with pytest.raises(TableAlreadyExistsError):
        eng.execute("CREATE VIEW v1 AS SELECT n_name FROM nation")
    eng.execute("CREATE OR REPLACE VIEW v1 AS SELECT n_nationkey FROM nation")
    assert eng.sql("SELECT * FROM v1").columns == ["n_nationkey"]
    with pytest.raises(TableAlreadyExistsError):
        eng.create_view("nation", "SELECT 1")  # collides with a table
    eng.execute("DROP VIEW v1")
    assert eng.list_views() == []
    with pytest.raises(TableNotFoundError):
        eng.execute("DROP VIEW v1")
    eng.execute("DROP VIEW IF EXISTS v1")


def test_sync_catalog_exposes_tables_to_plain_spark_sql(eng, spark):
    """Metastore parity (SURVEY §3 E3): after sync_catalog, the warehouse
    is visible through spark.sql / spark.catalog with NO Engine bridge."""
    eng.create_view("small_nations", "SELECT * FROM nation WHERE n_nationkey < 5")
    try:
        regs = eng.sync_catalog("cat_ddl_db")
        assert "cat_ddl_db.nation" in regs and "cat_ddl_db.small_nations" in regs
        names = {t.name for t in spark.catalog.listTables("cat_ddl_db")}
        assert {"nation", "small_nations"} <= names
        n = spark.sql("SELECT COUNT(*) c FROM cat_ddl_db.nation").collect()[0].c
        assert n == eng.table("nation").count()
        v = spark.sql("SELECT COUNT(*) c FROM cat_ddl_db.small_nations").collect()[0].c
        assert v == 5
        # appends through the Engine become visible after re-sync (refresh)
        eng.append(eng.table("nation").limit(3), "nation")
        eng.sync_catalog("cat_ddl_db")
        n2 = spark.sql("SELECT COUNT(*) c FROM cat_ddl_db.nation").collect()[0].c
        assert n2 == n + 3
    finally:
        eng.unsync_catalog("cat_ddl_db")
    # only session-global TEMP views may remain (other tests' leftovers)
    assert [
        t for t in spark.catalog.listTables("cat_ddl_db") if not t.isTemporary
    ] == []
    # external semantics: dropping catalog entries never deleted data
    assert eng.table("nation").count() == 28


def test_sync_catalog_view_column_named_like_table(spark, tmp_warehouse):
    """A view column that shares a table's name must not be qualified as
    if it were the table (the round-2 regex rewrite would have broken
    this; resolution-based qualification cannot)."""
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, tmp_warehouse, database="cat_colname_db")
    try:
        eng.write_table(
            load(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name"),
            "nation",
        )
        # column alias 'nation' collides with the table name
        eng.create_view("v1", "SELECT n_name AS nation FROM nation")
        eng.create_view(
            "v2", "SELECT nation FROM v1 WHERE nation = 'NATION_1'"
        )
        eng.sync_catalog()
        got = spark.sql(
            "SELECT nation FROM cat_colname_db.v2 ORDER BY nation"
        ).collect()
        assert [r.nation for r in got] == ["NATION_1"]
        assert eng.sql("SELECT count(*) AS n FROM v2").first().n == 1
    finally:
        eng.unsync_catalog()
        spark.sql("DROP DATABASE IF EXISTS cat_colname_db CASCADE")


def test_execute_maintenance_verbs(spark, tmp_warehouse):
    """OPTIMIZE / VACUUM / ANALYZE TABLE route to the maintenance verbs."""
    from cubefs_hadoop_spark.engine import Engine
    from tests.conftest import SF_SMOKE
    from cubefs_hadoop_spark.catalog import load

    eng = Engine(spark, tmp_warehouse, database="maint_db")
    try:
        eng.write_table(load(spark, SF_SMOKE, "orders").repartition(10), "o")
        assert eng.table_stats("o")["files"] == 10
        eng.execute("OPTIMIZE o")
        assert eng.table_stats("o")["files"] == 1
        eng.execute("VACUUM")
        eng.sync_catalog()
        eng.execute("ANALYZE TABLE o FOR COLUMNS o_orderkey")
        plan = (
            eng.sql("SELECT * FROM o")._jdf.queryExecution()
            .optimizedPlan().stats().toString()
        )
        assert "rowCount=" in plan
    finally:
        eng.unsync_catalog()
        spark.sql("DROP DATABASE IF EXISTS maint_db CASCADE")


def test_execute_optimize_zorder(spark, tmp_warehouse):
    """OPTIMIZE t ZORDER BY (a, b) routes to optimize_table: new compact
    version, per-file stats on the Z columns, prunable on both dims."""
    from cubefs_hadoop_spark import versioning
    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, tmp_warehouse, database="zopt_db")
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    eng.write_table_version(docs.repartitionByRange(8, "doc_id"), "d")
    eng.execute("OPTIMIZE d ZORDER BY (doc_id, n_chars)")
    m = versioning.read_manifest(eng._table_path("d"), 2, eng.fs)
    assert m["mode"] == "compact"
    assert set(m["stats"]) == set(m["files"])
    got = eng.read_version(
        "d", predicates=[("n_chars", ">=", 100), ("n_chars", "<", 120)]
    ).collect()
    assert all(100 <= r.n_chars < 120 for r in got)
    assert len(got) == docs.filter(
        "n_chars >= 100 and n_chars < 120"
    ).count()
