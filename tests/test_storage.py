"""Storage-contract tests (SURVEY §5 item 3): the reference's 9 filesystem
behaviors (CubeFileSystemTest.java:10-246) re-expressed at table semantics,
plus the Q38-Q40 sink checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import (
    TableAlreadyExistsError,
    TableNotFoundError,
)
from cubefs_hadoop_spark.queries.relational import q06_tpch_q1
from tests.conftest import SF_SMOKE


@pytest.fixture()
def engine(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _hash(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_q38_write_read_back_hash(spark, engine):
    """Q38: write Q06's result, re-read, hash equals the original."""
    res = q06_tpch_q1(spark, SF_SMOKE)
    engine.write_table(res, "q1_out")
    assert _hash(engine.table("q1_out")) == _hash(res)
    assert engine.is_committed("q1_out")  # _SUCCESS marker (N9 durability)


def test_q39_partitioned_write_layout(spark, engine):
    """Q39: partitioned write produces partition dirs (N12 listing analog)
    and re-reads to the same content."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    engine.write_table(li, "li_part", mode="overwrite", partition_by=["l_returnflag"])
    files = engine.describe("li_part").collect()
    dirs = {f.file.split("/")[0] for f in files if "/" in f.file}
    assert {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"} <= dirs
    back = engine.table("li_part")
    assert back.count() == li.count()
    # partition pruning: reading one partition must not scan the others
    one = back.filter(F.col("l_returnflag") == "R")
    assert one.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_q40_append_doubles(spark, engine):
    """Q40/N8: append mode adds part files; count doubles
    (CubefsFileSystem.java:195-209 semantics at table level)."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "nat")
    engine.append(nat, "nat")
    assert engine.table("nat").count() == 2 * nat.count()


def test_overwrite_replaces(spark, engine):
    """N6 O_TRUNC branch (CubefsFileSystem.java:184-186)."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "t")
    engine.write_table(nat.limit(5), "t", mode="overwrite")
    assert engine.table("t").count() == 5


def test_errorifexists_raises(spark, engine):
    """N6 EEXIST branch (CubefsFileSystem.java:180-183)."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "t")
    with pytest.raises(TableAlreadyExistsError):
        engine.write_table(nat, "t")


def test_rename_semantics(spark, engine):
    """N10: rename to fresh name -> True (testRename :74-84); rename onto
    existing -> False, the impl's documented pre-check
    (CubefsFileSystem.java:221-223, quirk Q3)."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "a")
    engine.write_table(nat, "b")
    assert engine.rename_table("a", "c") is True
    assert engine.table_exists("c") and not engine.table_exists("a")
    assert engine.rename_table("c", "b") is False  # dst exists
    with pytest.raises(TableNotFoundError):
        engine.rename_table("nope", "x")


def test_delete_and_listing(spark, engine):
    """N11/N12: listStatus counts drop as tables are deleted
    (testFilesForRelativePath :123-159 shape)."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "t1")
    engine.write_table(nat, "t2")
    assert engine.list_tables() == ["t1", "t2"]
    assert engine.drop_table("t1") is True
    assert engine.list_tables() == ["t2"]
    with pytest.raises(TableNotFoundError):
        engine.drop_table("t1")
    assert engine.drop_table("t1", ignore_missing=True) is False


def test_many_small_tables_listing(spark, engine):
    """testListStatusFOrAbsentPath (:161-175): N entries -> listing == N."""
    df = spark.range(3)
    for i in range(10):
        engine.write_table(df, f"s{i}")
    assert len(engine.list_tables()) == 10


def test_writeutf_roundtrip_shape(spark, engine):
    """testReadWriter (:99-121): 12,000-record round-trip; first record
    equality — re-expressed as a 12k-row single-string-column table."""
    df = spark.range(12000).select(
        F.concat(F.lit("Is there anyone out there?"), F.col("id")).alias("s")
    )
    engine.write_table(df, "utf")
    back = engine.table("utf")
    assert back.count() == 12000
    assert (
        back.orderBy("s").first().s
        == df.orderBy("s").first().s
    )


def test_byte_pattern_roundtrip(spark, engine):
    """testFileIO (:177-243): byte-pattern write/read equality —
    re-expressed over a binary column."""
    df = spark.range(64).select(
        F.col("id"),
        F.expr("CAST(concat(repeat(char(32), 4), cast(id AS string)) AS BINARY)").alias(
            "payload"
        ),
    )
    engine.write_table(df, "bytes")
    back = engine.table("bytes").orderBy("id").collect()
    orig = df.orderBy("id").collect()
    assert [r.payload for r in back] == [r.payload for r in orig]


def test_stats_and_describe(spark, engine):
    """N18 getContentSummary / N22 statistics analog."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "n")
    stats = engine.table_stats("n")
    assert stats["rows"] == 25 and stats["files"] >= 1 and stats["bytes"] > 0
    with pytest.raises(TableNotFoundError):
        engine.describe("missing")


def test_database_namespace(spark, engine):
    """N14/N16: create_database + use (working-directory analog)."""
    engine.create_database("db2")
    engine.use("db2")
    assert engine.list_tables() == []
    with pytest.raises(TableNotFoundError):
        engine.use("db3")


def test_sql_over_warehouse(spark, engine):
    """E3 metadata+query path: engine.sql resolves warehouse tables."""
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    engine.write_table(nat, "nation_t")
    out = engine.sql("SELECT COUNT(*) AS c FROM nation_t").first()
    assert out.c == 25


def test_schema_evolution_merge_schema(spark, tmp_warehouse):
    """Append parts with a new nullable column; merge_schema reconciles
    (old rows null), plain read keeps the first-footer schema."""
    from cubefs_hadoop_spark.engine import Engine

    from cubefs_hadoop_spark.catalog import load

    eng = Engine(spark, tmp_warehouse)
    nation = load(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    eng.write_table(nation, "evolving")
    eng.append(nation.withColumn("extra", F.lit(1)), "evolving")
    merged = eng.table("evolving", merge_schema=True)
    assert "extra" in merged.columns
    assert merged.count() == 2 * nation.count()
    assert merged.filter(F.col("extra").isNull()).count() == nation.count()


def test_closed_engine_rejects_ops(spark, tmp_path):
    """N19 fidelity: after close(), every verb raises (the reference's
    closed native client rejects all calls, CubefsFileSystem.java:443-447)."""
    from cubefs_hadoop_spark.engine import Engine
    from cubefs_hadoop_spark.errors import EngineIOError

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.close()
    import pytest as _pt

    for op in [
        lambda: eng.list_tables(),
        lambda: eng.table("t"),
        lambda: eng.write_table(spark.range(1), "t"),
        lambda: eng.drop_table("t"),
        lambda: eng.describe("t"),
    ]:
        with _pt.raises(EngineIOError, match="closed"):
            op()
