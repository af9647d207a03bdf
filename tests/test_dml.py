"""Row-level DML: merge_table (upsert) and delete_from — the MERGE/DELETE
capability the reference's host engines get from Iceberg, committed
atomically on both plain (rename-swap) and versioned (snapshot) tables."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse, database="dml")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v string")


def test_merge_upserts_plain_table(eng, spark):
    eng.write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "t")
    eng.merge_table(_df(spark, [(2, "B"), (4, "d")]), "t", on="id")
    got = {(r.id, r.v) for r in eng.table("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    assert eng.is_committed("t")  # swapped-in table is a committed write


def test_merge_versioned_table_keeps_history(eng, spark):
    eng.write_table_version(_df(spark, [(1, "a"), (2, "b")]), "t")
    eng.merge_table(_df(spark, [(2, "B"), (3, "c")]), "t", on="id")
    assert eng.table_versions("t") == [1, 2]
    got = {(r.id, r.v) for r in eng.table("t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # pre-merge snapshot intact
    old = {(r.id, r.v) for r in eng.read_version("t", 1).collect()}
    assert old == {(1, "a"), (2, "b")}


def test_merge_validates_keys_and_columns(eng, spark):
    eng.write_table(_df(spark, [(1, "a")]), "t")
    with pytest.raises(EngineIOError):
        eng.merge_table(_df(spark, [(1, "x")]), "t", on="nope")
    with pytest.raises(EngineIOError):
        eng.merge_table(
            spark.createDataFrame([(1,)], "id bigint"), "t", on="id"
        )


def test_merge_multi_key(eng, spark):
    df = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)],
        "k1 bigint, k2 string, v double",
    )
    eng.write_table(df, "t")
    upd = spark.createDataFrame(
        [(1, "y", 99.0), (3, "z", 7.0)], "k1 bigint, k2 string, v double"
    )
    eng.merge_table(upd, "t", on=["k1", "k2"])
    got = {(r.k1, r.k2, r.v) for r in eng.table("t").collect()}
    assert got == {(1, "x", 10.0), (1, "y", 99.0), (2, "x", 30.0), (3, "z", 7.0)}


def test_delete_from_plain_and_versioned(eng, spark):
    eng.write_table(_df(spark, [(i, "v") for i in range(10)]), "p")
    eng.delete_from("p", "id >= 7")
    assert sorted(r.id for r in eng.table("p").collect()) == list(range(7))

    eng.write_table_version(_df(spark, [(i, "v") for i in range(5)]), "q")
    eng.delete_from("q", "id = 2")
    assert sorted(r.id for r in eng.table("q").collect()) == [0, 1, 3, 4]
    assert eng.table_versions("q") == [1, 2]
    assert eng.read_version("q", 1).count() == 5


def test_merge_visible_through_synced_catalog(eng, spark):
    eng.write_table(_df(spark, [(1, "a")]), "t")
    eng.sync_catalog()
    try:
        eng.merge_table(_df(spark, [(1, "A"), (2, "b")]), "t", on="id")
        got = {(r.id, r.v) for r in eng.sql("SELECT * FROM t").collect()}
        assert got == {(1, "A"), (2, "b")}
    finally:
        eng.unsync_catalog()
        spark.sql("DROP DATABASE IF EXISTS dml CASCADE")


def test_execute_delete_merge_and_time_travel(eng, spark):
    eng.write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "t")
    eng.execute("DELETE FROM t WHERE id = 3")
    assert sorted(r.id for r in eng.table("t").collect()) == [1, 2]

    eng.execute(
        "MERGE INTO t USING (SELECT CAST(2 AS BIGINT) AS id, 'B' AS v) ON id"
    )
    got = {(r.id, r.v) for r in eng.table("t").collect()}
    assert got == {(1, "a"), (2, "B")}

    eng.write_table_version(_df(spark, [(1, "old")]), "vt")
    eng.write_table_version(_df(spark, [(1, "new"), (2, "x")]), "vt")
    row = eng.execute(
        "SELECT v FROM vt VERSION AS OF 1"
    ).collect()
    assert [r.v for r in row] == ["old"]
    # current version unaffected
    assert eng.execute("SELECT count(*) AS n FROM vt").first().n == 2


def test_vacuum_restores_interrupted_swap(eng, spark):
    """A crash between the two swap renames leaves <t>.__old as the ONLY
    copy of the table; vacuum must restore it, never delete it."""
    eng.write_table(_df(spark, [(1, "a"), (2, "b")]), "t")
    root = eng._db_path()
    # simulate the crash window: table renamed away, staged dir not yet in
    assert eng.fs.rename(eng.fs.join(root, "t"), eng.fs.join(root, "t.__old"))
    assert not eng.table_exists("t")
    removed = eng.vacuum()
    assert any("restored" in r for r in removed)
    assert eng.table_exists("t")
    assert eng.table("t").count() == 2

    # completed swap: base exists -> .__old is garbage and IS deleted
    eng.fs.mkdirs(eng.fs.join(root, "t.__old"))
    removed = eng.vacuum()
    assert "t.__old" in removed
    assert eng.table("t").count() == 2


def test_delete_from_null_predicate_rows_are_kept(eng, spark):
    """SQL DELETE three-valued logic: rows where the predicate evaluates
    NULL are kept, not deleted."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "id bigint, v double"
    )
    eng.write_table(df, "n")
    eng.delete_from("n", "v > 50")  # NULL for id=2 -> keep
    assert sorted(r.id for r in eng.table("n").collect()) == [1, 2]


# -- property test: DML sequence vs an in-memory model ----------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_dml_op = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(st.integers(0, 6), st.integers(0, 99)),
            min_size=1,
            max_size=4,
        ),
    ),
    st.tuples(st.just("delete_ge"), st.integers(0, 99)),
    st.tuples(
        st.just("update_add"), st.integers(0, 99), st.integers(1, 9)
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_dml_op, min_size=1, max_size=5), versioned=st.booleans())
def test_dml_sequence_agrees_with_model(spark, tmp_path_factory, ops, versioned):
    """Random merge/delete sequences leave the table exactly where a
    dict model lands — on both the plain (rename-swap) and versioned
    (snapshot-commit) paths."""
    wh = str(tmp_path_factory.mktemp("dml_wh"))
    eng = Engine(spark, wh)
    model = {i: i * 10 for i in range(4)}
    init = spark.createDataFrame(
        [(k, v) for k, v in model.items()], "id bigint, v bigint"
    )
    if versioned:
        eng.write_table_version(init, "t")
    else:
        eng.write_table(init, "t")

    for op in ops:
        if op[0] == "merge":
            # last occurrence of each key in the batch wins (upsert batch)
            batch = {}
            for k, v in op[1]:
                batch[k] = v
            df = spark.createDataFrame(
                [(k, v) for k, v in batch.items()], "id bigint, v bigint"
            )
            eng.merge_table(df, "t", on="id")
            model.update(batch)
        elif op[0] == "delete_ge":
            eng.delete_from("t", f"v >= {op[1]}")
            model = {k: v for k, v in model.items() if not v >= op[1]}
        else:  # update_add: v += d where v >= threshold
            eng.update_table("t", {"v": f"v + {op[2]}"}, f"v >= {op[1]}")
            model = {
                k: (v + op[2] if v >= op[1] else v) for k, v in model.items()
            }

    got = {r.id: r.v for r in eng.table("t").collect()}
    assert got == model
    if versioned:
        # every DML commit added a version; history intact
        assert len(eng.table_versions("t")) == 1 + len(ops)


def test_update_table_plain_and_versioned(eng, spark):
    # plain: predicate IS TRUE rows updated, NULL-predicate rows kept
    eng.write_table(_df(spark, [(1, "a"), (2, "b"), (3, None)]), "u")
    eng.update_table("u", {"v": "upper(v)"}, "v = 'b' OR v IS NULL AND false")
    got = {(r.id, r.v) for r in eng.table("u").collect()}
    assert got == {(1, "a"), (2, "B"), (3, None)}
    # versioned: history intact, pre-update snapshot readable
    eng.write_table_version(_df(spark, [(1, "x"), (2, "y")]), "uv")
    eng.update_table("uv", {"v": "concat(v, '!')"}, "id = 2")
    assert {(r.id, r.v) for r in eng.table("uv").collect()} == {
        (1, "x"), (2, "y!"),
    }
    assert {(r.id, r.v) for r in eng.read_version("uv", 1).collect()} == {
        (1, "x"), (2, "y"),
    }


def test_update_rhs_sees_pre_update_row(eng, spark):
    """ANSI UPDATE: SET a = b, b = a swaps — RHSs evaluate the OLD row."""
    df = spark.createDataFrame([(1, 10, 20)], "id bigint, a bigint, b bigint")
    eng.write_table(df, "sw")
    eng.update_table("sw", {"a": "b", "b": "a"})
    r = eng.table("sw").collect()[0]
    assert (r.a, r.b) == (20, 10)


def test_execute_update_truncate_insert_overwrite(eng, spark):
    eng.write_table(_df(spark, [(1, "a"), (2, "b")]), "t1")
    # UPDATE with function-call commas and string literal in SET list
    eng.execute("UPDATE t1 SET v = concat(v, ',x') WHERE id = 1")
    assert {(r.id, r.v) for r in eng.table("t1").collect()} == {
        (1, "a,x"), (2, "b"),
    }
    # self-referential INSERT OVERWRITE (read-from-target)
    eng.execute("INSERT OVERWRITE t1 SELECT id + 10 AS id, v FROM t1")
    assert {r.id for r in eng.table("t1").collect()} == {11, 12}
    # unknown SET column is a typed error
    with pytest.raises(EngineIOError):
        eng.update_table("t1", {"nope": "1"})
    # TRUNCATE keeps schema, drops rows; versioned keeps history
    eng.execute("TRUNCATE TABLE t1")
    assert eng.table("t1").count() == 0
    assert eng.table("t1").columns == ["id", "v"]
    eng.write_table_version(_df(spark, [(5, "e")]), "t2")
    eng.execute("TRUNCATE t2")
    assert eng.table("t2").count() == 0
    assert eng.read_version("t2", 1).count() == 1
