"""ALTER TABLE schema evolution: metadata-only on versioned tables
(versioning.alter_schema), copy-on-write on plain tables, router verbs."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_add_column_is_metadata_only(eng, spark):
    eng.write_table_version(_df(spark, 0, 5), "t")
    path = eng._table_path("t")
    files_before = versioning.read_manifest(path, 1, eng.fs)["files"]
    eng.execute("ALTER TABLE t ADD COLUMN note string")
    m = versioning.read_manifest(path, 2, eng.fs)
    assert m["mode"] == "alter"
    assert m["files"] == files_before  # zero data rewritten
    got = eng.read_version("t")
    assert got.columns == ["id", "v", "note"]
    assert all(r.note is None for r in got.collect())
    # time travel: v1 still serves the old shape
    assert eng.read_version("t", 1).columns == ["id", "v"]


def test_append_after_add_merges_generations(eng, spark):
    eng.write_table_version(_df(spark, 0, 3), "t")
    eng.alter_table("t", [{"op": "add", "name": "note", "type": "string"}])
    new = spark.range(3, 5).selectExpr(
        "id", "id * 2 AS v", "concat('n', id) AS note"
    )
    eng.write_table_version(new, "t", mode="append")
    rows = {r.id: r.note for r in eng.read_version("t").collect()}
    assert rows == {0: None, 1: None, 2: None, 3: "n3", 4: "n4"}


def test_rename_and_drop_remap_stats_and_prune(eng, spark):
    eng.write_table_version(
        _df(spark, 0, 100).repartitionByRange(4, "id"),
        "t",
        stats_cols=["id", "v"],
    )
    eng.execute("ALTER TABLE t RENAME COLUMN id TO doc")
    eng.execute("ALTER TABLE t DROP COLUMN v")
    path = eng._table_path("t")
    m = versioning.read_manifest(path, 3, eng.fs)
    for st in m["stats"].values():
        assert set(st) == {"doc"}  # renamed key kept, dropped key gone
    kept = versioning.prune_files(m, [("doc", "<", 10)])
    assert 0 < len(kept) < len(m["files"])
    got = eng.read_version("t", predicates=[("doc", "<", 10)])
    assert got.columns == ["doc"]
    assert sorted(r.doc for r in got.collect()) == list(range(10))


def test_mor_delete_after_alter_uses_new_names(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.alter_table("t", [{"op": "rename", "from": "id", "to": "doc"}])
    versioning.commit_delete(
        eng._table_path("t"), "doc % 2 = 0", fs=eng.fs
    )
    got = sorted(r.doc for r in eng.read_version("t").collect())
    assert got == [1, 3, 5, 7, 9]


def test_alter_refused_with_pending_deletes(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    versioning.commit_delete(eng._table_path("t"), "id > 5", fs=eng.fs)
    with pytest.raises(EngineIOError, match="compact_version first"):
        eng.alter_table(
            "t", [{"op": "rename", "from": "id", "to": "doc"}]
        )


def test_alter_validation_errors(eng, spark):
    eng.write_table_version(_df(spark, 0, 3), "t")
    with pytest.raises(EngineIOError, match="already exists"):
        eng.alter_table("t", [{"op": "add", "name": "v", "type": "int"}])
    with pytest.raises(EngineIOError, match="not found"):
        eng.alter_table("t", [{"op": "drop", "name": "nope"}])
    with pytest.raises(EngineIOError, match="unsupported"):
        eng.alter_table(
            "t", [{"op": "add", "name": "x", "type": "map<int,int>"}]
        )


def test_compact_materializes_evolution(eng, spark):
    """After OPTIMIZE, the evolved schema is physical: the op chain is
    gone and the files carry the final shape."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.alter_table("t", [{"op": "add", "name": "note", "type": "string"}])
    eng.compact_table("t")
    path = eng._table_path("t")
    m = versioning.read_manifest(
        path, versioning.current_version(path, eng.fs), eng.fs
    )
    assert m["mode"] == "compact"
    assert not m.get("schema_ops")
    got = eng.read_version("t")
    assert got.columns == ["id", "v", "note"]
    assert got.count() == 10


def test_rollback_restores_op_chain(eng, spark):
    eng.write_table_version(_df(spark, 0, 3), "t")
    eng.alter_table("t", [{"op": "rename", "from": "v", "to": "val"}])
    assert eng.read_version("t").columns == ["id", "val"]
    eng.rollback_table("t", 1)
    assert eng.read_version("t").columns == ["id", "v"]
    eng.rollback_table("t", 2)
    assert eng.read_version("t").columns == ["id", "val"]


def test_plain_table_alter_rewrites(eng, spark):
    eng.write_table(_df(spark, 0, 4), "p")
    eng.execute("ALTER TABLE p ADD COLUMN note string")
    eng.execute("ALTER TABLE p RENAME COLUMN v TO val")
    eng.execute("ALTER TABLE p DROP COLUMN note")
    got = eng.table("p")
    assert got.columns == ["id", "val"]
    assert sorted(r.val for r in got.collect()) == [0, 2, 4, 6]


def test_read_changes_conforms_across_alter(eng, spark):
    """CDC reads spanning a rename serve the TARGET schema: files added
    before the alter (old physical names) conform through the op chain."""
    eng.write_table_version(_df(spark, 0, 3), "t")          # v1
    eng.write_table_version(_df(spark, 3, 6), "t", mode="append")  # v2
    eng.alter_table("t", [{"op": "rename", "from": "v", "to": "val"}])  # v3
    new = spark.range(6, 8).selectExpr("id", "id * 2 AS val")
    eng.write_table_version(new, "t", mode="append")        # v4
    delta = versioning.read_changes(
        spark, eng._table_path("t"), 1, 4, fs=eng.fs
    )
    assert delta.columns == ["id", "val"]
    got = sorted((r.id, r.val) for r in delta.collect())
    assert got == [(i, i * 2) for i in range(3, 8)]


def test_read_version_merges_generations_across_rename(eng, spark):
    """The bug class the coalesce-rename guards: append AFTER a rename,
    then one read spanning both file generations — pre-alter values must
    survive (not NULL out) in the new column."""
    eng.write_table_version(_df(spark, 0, 3), "t")
    eng.alter_table("t", [{"op": "rename", "from": "v", "to": "val"}])
    eng.write_table_version(
        spark.range(3, 6).selectExpr("id", "id * 2 AS val"),
        "t",
        mode="append",
    )
    got = sorted((r.id, r.val) for r in eng.read_version("t").collect())
    assert got == [(i, i * 2) for i in range(6)]


def test_drop_then_readd_refused_until_compaction(eng, spark):
    """Re-adding a dropped name would let the inherited drop op silently
    null post-readd data (idempotence holds for add/rename, not
    drop-then-readd) — refused until compaction clears the chain."""
    eng.write_table_version(
        spark.createDataFrame(
            [(1, "a", "k")], "id long, junk string, keep string"
        ),
        "t",
    )
    p = eng._table_path("t")
    versioning.alter_schema(p, [{"op": "drop", "name": "junk"}])
    # ALTER ADD of the dropped name: refused
    with pytest.raises(EngineIOError, match="previously dropped"):
        versioning.alter_schema(
            p, [{"op": "add", "name": "junk", "type": "string"}]
        )
    # same refusal within ONE multi-op call
    with pytest.raises(EngineIOError, match="previously dropped"):
        versioning.alter_schema(
            p,
            [
                {"op": "drop", "name": "keep"},
                {"op": "add", "name": "keep", "type": "string"},
            ],
        )
    # an append physically reintroducing the dropped name: refused
    with pytest.raises(EngineIOError, match="reintroduces dropped"):
        versioning.commit_version(
            spark.createDataFrame(
                [(2, "b", "k")], "id long, junk string, keep string"
            ),
            p,
            mode="append",
        )
    # compaction materializes the drop and clears the chain; then the
    # re-add is an ordinary new column
    versioning.compact_version(spark, p)
    versioning.alter_schema(
        p, [{"op": "add", "name": "junk", "type": "string"}]
    )
    versioning.commit_version(
        spark.createDataFrame(
            [(2, "k", "b")], "id long, keep string, junk string"
        ),
        p,
        mode="append",
    )
    rows = {
        r.id: r.junk for r in versioning.read_version(spark, p).collect()
    }
    assert rows == {1: None, 2: "b"}
