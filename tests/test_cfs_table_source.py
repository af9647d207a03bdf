"""cfstable Python DataSource: versioned-table scans with pushFilters ->
manifest file skipping (sources/table_source.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.sources.table_source import (
    CfsTableReader,
    read_table,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def vt(spark, tmp_path):
    """A versioned documents table with range layout + doc_id stats."""
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    path = str(tmp_path / "t")
    versioning.commit_version(
        docs.repartitionByRange(8, "doc_id"), path, stats_cols=["doc_id"]
    )
    return path, docs


def test_full_scan_matches_engine_read(spark, vt):
    path, docs = vt
    got = read_table(spark, path).collect()
    want = docs.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_where_prunes_files_and_stays_exact(spark, vt):
    path, docs = vt
    df = read_table(spark, path).filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    )
    got = sorted(r.doc_id for r in df.collect())
    assert got == list(range(100, 150))
    # pruning observed at the reader level: the same pushed filters must
    # shrink partitions() below the 8-file full set
    m = versioning.read_manifest(path, 1)
    schema = read_table(spark, path).schema
    r = CfsTableReader({"path": path}, schema)
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 100), LessThan(("doc_id",), 150)]
        )
    )
    assert len(leftover) == 2  # every filter handed back to Spark
    assert 0 < len(r.partitions()) < len(m["files"])


def test_unsupported_filters_pass_through(spark, vt):
    path, docs = vt
    # predicate on an un-statted column: no pruning, still exact
    got = read_table(spark, path).filter("lang = 'en'").count()
    assert got == docs.filter("lang = 'en'").count()
    schema = read_table(spark, path).schema
    r = CfsTableReader({"path": path}, schema)
    list(r.pushFilters([EqualTo(("lang",), "en")]))
    assert len(r.partitions()) == 8  # conservative: nothing pruned


def test_version_time_travel(spark, vt):
    path, docs = vt
    versioning.commit_version(
        docs.filter("doc_id < 10"), path, mode="overwrite"
    )
    assert read_table(spark, path).count() == 10
    assert read_table(spark, path, version=1).count() == docs.count()


def test_pending_mor_deletes_refused(spark, vt):
    path, _docs = vt
    versioning.commit_delete(path, "doc_id % 2 = 0")
    with pytest.raises(Exception, match="merge-on-read"):
        read_table(spark, path).collect()


def test_write_path_round_trip(spark, tmp_path):
    """df.write.format('cfstable'): executor-staged parquet + manifest
    commit; append mode stacks versions; read paths (engine + source)
    agree."""
    from cubefs_hadoop_spark.sources.table_source import register

    register(spark)
    path = str(tmp_path / "wt")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    df.write.format("cfstable").option("path", path).mode(
        "append"
    ).save()
    assert versioning.current_version(path) == 1
    df2 = spark.range(100, 120).selectExpr("id", "id * 2 AS v")
    df2.write.format("cfstable").option("path", path).mode(
        "append"
    ).save()
    m = versioning.read_manifest(path, 2)
    assert m["mode"] == "append"
    got = sorted(r.id for r in read_table(spark, path).collect())
    assert got == list(range(120))
    eng_read = sorted(
        r.id for r in versioning.read_version(spark, path).collect()
    )
    assert eng_read == got
    # overwrite replaces the file set, v2 stays time-travelable
    df.limit(5).write.format("cfstable").option("path", path).mode(
        "overwrite"
    ).save()
    assert read_table(spark, path).count() == 5
    assert read_table(spark, path, version=2).count() == 120


def test_partitioned_layout_reads_and_path_prunes(spark, tmp_path):
    """Hive-partitioned versioned commits: the dir-encoded column comes
    back typed, and a predicate on it prunes files from the PATH
    encoding alone."""
    from cubefs_hadoop_spark.sources.table_source import CfsTableReader

    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "pt")
    versioning.commit_version(docs, path, partition_by=["lang"])
    got = read_table(spark, path)
    assert set(got.columns) == {"doc_id", "lang", "n_chars"}
    assert got.count() == docs.count()
    want = {(r.doc_id, r.lang) for r in docs.collect()}
    assert {(r.doc_id, r.lang) for r in got.collect()} == want
    # path pruning: lang = 'en' keeps only the en files
    n_en = read_table(spark, path).filter("lang = 'en'").count()
    assert n_en == docs.filter("lang = 'en'").count()
    schema = read_table(spark, path).schema
    r = CfsTableReader({"path": path}, schema)
    from pyspark.sql.datasource import EqualTo as _Eq

    list(r.pushFilters([_Eq(("lang",), "en")]))
    m = versioning.read_manifest(path, 1)
    assert 0 < len(r.partitions()) < len(m["files"])


def test_stream_tails_version_commits(spark, tmp_path):
    """readStream on cfstable: version-number offsets; each commit lands
    as one micro-batch; startingversion=0 replays the whole history."""
    from cubefs_hadoop_spark.sources.table_source import register

    register(spark)
    path = str(tmp_path / "st")
    for lo in (0, 10, 20):
        versioning.commit_version(
            spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v"),
            path,
            mode="append",
        )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("cfstable")
        .option("path", path)
        .option("startingversion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.id for r in spark.read.parquet(out_dir).collect())
    assert got == list(range(30))
    # new commit -> incremental batch only
    versioning.commit_version(
        spark.range(30, 35).selectExpr("id", "id * 2 AS v"),
        path,
        mode="append",
    )
    q = (
        spark.readStream.format("cfstable")
        .option("path", path)
        .option("startingversion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.id for r in spark.read.parquet(out_dir).collect())
    assert got == list(range(35))  # no duplicates from the replayed range


def test_writer_abort_leaves_no_visible_state(spark, tmp_path):
    """A writer abort removes its stage; the table's committed state is
    untouched (and a fresh write still works)."""
    from cubefs_hadoop_spark.sources.table_source import CfsTableWriter

    path = str(tmp_path / "ab")
    df = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    versioning.commit_version(df, path)
    w = CfsTableWriter({"path": path}, df.schema, overwrite=False)
    import os

    os.makedirs(os.path.join(path, "data", w.stage), exist_ok=True)
    open(os.path.join(path, "data", w.stage, "junk.parquet"), "wb").write(
        b"broken"
    )
    w.abort([])
    assert not os.path.exists(os.path.join(path, "data", w.stage))
    assert versioning.read_version(spark, path).count() == 10


@pytest.fixture()
def evolved(spark, tmp_path):
    """v1 (id, name, extra) -> rename name->label, add score, drop
    extra -> append one post-alter row.  Two file generations with
    different physical schemas under one op chain."""
    path = str(tmp_path / "ev")
    versioning.commit_version(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, name string, extra long"
        ),
        path,
        stats_cols=["id"],
    )
    versioning.alter_schema(
        path,
        [
            {"op": "rename", "from": "name", "to": "label"},
            {"op": "add", "name": "score", "type": "bigint"},
            {"op": "drop", "name": "extra"},
        ],
    )
    versioning.commit_version(
        spark.createDataFrame(
            [(3, "c", 99)], "id long, label string, score long"
        ),
        path,
        mode="append",
    )
    return path


def test_schema_evolved_read_matches_engine(spark, evolved):
    """The r5 repro: cfstable over an ALTERed table must serve exactly
    the Engine read path's rows (renamed cols under old physical names,
    added col as null for the pre-alter generation, dropped col gone)."""
    got = read_table(spark, evolved).orderBy("id")
    want = versioning.read_version(spark, evolved).orderBy("id")
    assert got.columns == ["id", "label", "score"]
    assert got.collect() == want.collect()
    rows = {r.id: (r.label, r.score) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 99)}


def test_schema_evolved_pushdown_on_renamed_and_added(spark, evolved):
    # predicate on the renamed column: target name resolves to the old
    # physical name file-side
    got = read_table(spark, evolved).filter(F.col("label") == "b").collect()
    assert [(r.id, r.label) for r in got] == [(2, "b")]
    # predicate on the post-alter ADDED column: pre-alter files hold only
    # nulls for it, so they are skipped wholesale yet the result is exact
    got = read_table(spark, evolved).filter(F.col("score") > 0).collect()
    assert [(r.id, r.score) for r in got] == [(3, 99)]


def test_schema_evolved_partitioned_rename_of_partition_col(
    spark, tmp_path
):
    """Dir-encoded partition keys are the WRITING generation's physical
    names; a renamed partition column must resolve through the op chain
    for both generations."""
    path = str(tmp_path / "pev")
    versioning.commit_version(
        spark.createDataFrame([(1, "x"), (2, "y")], "id long, p string"),
        path,
        partition_by=["p"],
    )
    versioning.alter_schema(path, [{"op": "rename", "from": "p", "to": "q"}])
    versioning.commit_version(
        spark.createDataFrame([(3, "z")], "id long, q string"),
        path,
        mode="append",
        partition_by=["q"],
    )
    got = read_table(spark, path).orderBy("id").collect()
    assert [(r.id, r.q) for r in got] == [(1, "x"), (2, "y"), (3, "z")]
    want = versioning.read_version(spark, path).orderBy("id").collect()
    assert got == want


def test_stream_conforms_across_alter_boundary(spark, tmp_path):
    """A CDC tail whose replayed range crosses an ALTER conforms each
    file generation (the r5 verdict's second crash family)."""
    from cubefs_hadoop_spark.sources.table_source import (
        CfsTableStreamReader,
    )

    path = str(tmp_path / "sev")
    versioning.commit_version(
        spark.createDataFrame([(1, "a")], "id long, name string"), path
    )
    versioning.alter_schema(
        path, [{"op": "rename", "from": "name", "to": "label"}]
    )
    versioning.commit_version(
        spark.createDataFrame([(2, "b")], "id long, label string"),
        path,
        mode="append",
    )
    r = CfsTableStreamReader({"path": path})
    rows = r._added_rows(0, versioning.current_version(path))
    assert sorted(rows) == [(1, "a"), (2, "b")]


def test_stream_refuses_mor_delete_change(spark, tmp_path):
    """A merge-on-read delete changes rows without changing files; the
    file-set diff would silently emit nothing — must refuse (ADVICE r5)."""
    from cubefs_hadoop_spark.sources.table_source import (
        CfsTableStreamReader,
    )

    path = str(tmp_path / "dev")
    versioning.commit_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"), path
    )
    v1 = versioning.current_version(path)
    versioning.commit_delete(path, "id < 3")
    r = CfsTableStreamReader({"path": path})
    with pytest.raises(ValueError, match="deletes changed"):
        r._added_rows(v1, versioning.current_version(path))


def test_partitioned_write_via_option_round_trips(spark, tmp_path):
    """df.write.format('cfstable').option('partitionBy', ...) dir-encodes
    partition columns Hive-style (Spark's Python DataSource API refuses
    .partitionBy() itself), commits partition_by into the manifest, and
    the reader recovers + path-prunes the columns.  A layout-mismatched
    append is refused by the manifest commit."""
    from cubefs_hadoop_spark.sources.table_source import register

    register(spark)
    path = str(tmp_path / "pw")
    df = spark.range(0, 12).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS p"
    )
    (
        df.write.format("cfstable")
        .option("path", path)
        .option("partitionBy", "p")
        .mode("append")
        .save()
    )
    m = versioning.read_manifest(path, 1)
    assert m["partition_by"] == ["p"]
    assert all("p=" in f for f in m["files"])  # dir-encoded layout
    back = read_table(spark, path)
    assert sorted(back.columns) == ["id", "p"]
    got = sorted((r.id, r.p) for r in back.collect())
    assert got == [(i, str(i % 3)) for i in range(12)]
    assert versioning.read_version(spark, path).count() == 12
    # predicate on the partition column prunes files straight from the
    # path encoding at the reader level
    schema = back.schema
    r = CfsTableReader({"path": path}, schema)
    list(r.pushFilters([EqualTo(("p",), "1")]))
    pruned = r.partitions()
    assert 0 < len(pruned) < len(m["files"])
    assert back.filter("p = '1'").count() == 4
    # unpartitioned append onto the partitioned layout: refused
    with pytest.raises(Exception, match="layout mismatch"):
        (
            spark.range(5)
            .selectExpr("id", "'x' AS p")
            .write.format("cfstable")
            .option("path", path)
            .mode("append")
            .save()
        )
    # partitionBy of a column not in the schema: refused at plan time
    with pytest.raises(Exception, match="not in the written schema"):
        (
            df.write.format("cfstable")
            .option("path", str(tmp_path / "bad"))
            .option("partitionBy", "nope")
            .mode("append")
            .save()
        )
