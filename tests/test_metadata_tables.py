"""``files`` / ``partitions`` metadata-table parity (Iceberg metadata
tables; Delta DESCRIBE HISTORY/DETAIL family).  All three surfaces are
metadata-only — the manifest plus a directory walk — so they stay
file-count-sized at any data scale."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 3 AS INT) AS bucket"
    )


def test_table_files_matches_manifest(eng, spark):
    eng.write_table_version(_df(spark, 0, 100), "t", stats_cols=["id"])
    from cubefs_hadoop_spark import versioning

    m = versioning.read_manifest(eng._table_path("t"), 1)
    rows = eng.table_files("t").collect()
    assert sorted(r.file for r in rows) == sorted(m["files"])
    # every live file has a real on-disk size and a commit seq
    assert all(r.size_bytes > 0 for r in rows)
    assert all(r.seq == 1 for r in rows)
    # harvested stats round-trip through the JSON column
    stats = {r.file: r.stats for r in rows}
    for f, st in (m.get("stats") or {}).items():
        assert json.loads(stats[f]) == st


def test_table_files_time_travel_snapshot_scoped(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 10, 30), "t", mode="append")
    v1_files = {r.file for r in eng.table_files("t", 1).collect()}
    v2_files = {r.file for r in eng.table_files("t", 2).collect()}
    assert v1_files < v2_files  # append keeps parent files live
    # appended files carry the appending commit's sequence number
    seqs = {r.file: r.seq for r in eng.table_files("t").collect()}
    assert {seqs[f] for f in v1_files} == {1}
    assert {seqs[f] for f in v2_files - v1_files} == {2}


def test_table_files_parses_hive_partition_values(eng, spark):
    eng.write_table_version(
        _df(spark, 0, 30), "t", partition_by=["bucket"]
    )
    rows = eng.table_files("t").collect()
    assert all(set(r.partition) == {"bucket"} for r in rows)
    assert {r.partition["bucket"] for r in rows} == {"0", "1", "2"}


def test_table_partitions_rollup(eng, spark):
    eng.write_table_version(
        _df(spark, 0, 30), "t", partition_by=["bucket"]
    )
    parts = eng.table_partitions("t").collect()
    assert len(parts) == 3
    assert all(p.n_files >= 1 and p.total_bytes > 0 for p in parts)
    # rollup agrees with the per-file listing
    files = eng.table_files("t")
    byp = {
        r["partition"]["bucket"]: (r.n, r.b)
        for r in files.groupBy("partition")
        .agg(F.count("*").alias("n"), F.sum("size_bytes").alias("b"))
        .collect()
    }
    for p in parts:
        assert (p.n_files, p.total_bytes) == byp[p.partition["bucket"]]


def test_table_partitions_unpartitioned_single_row(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    parts = eng.table_partitions("t").collect()
    assert len(parts) == 1
    assert parts[0].partition == {}


def test_metadata_tables_refuse_plain_tables(eng, spark):
    eng.write_table(_df(spark, 0, 10), "plain")
    with pytest.raises(EngineIOError):
        eng.table_files("plain")


def test_describe_sql_verbs(eng, spark):
    eng.write_table_version(
        _df(spark, 0, 30), "t", partition_by=["bucket"]
    )
    eng.write_table_version(_df(spark, 30, 40), "t2")
    hist = eng.execute("DESCRIBE HISTORY t2")
    assert [r.version for r in hist.collect()] == [1]
    files = eng.execute("DESCRIBE FILES t")
    assert files.count() == eng.table_files("t").count()
    parts = eng.execute("DESCRIBE PARTITIONS t")
    assert parts.count() == 3
    # plain DESCRIBE still routes to the FileStatus listing
    assert "is_marker" in eng.execute("DESCRIBE t2").columns


def test_describe_detail_and_show_tags(eng, spark):
    df = _df(spark, 0, 30)
    eng.write_table_version(df, "t", partition_by=["bucket"])
    eng.tag_table("t", "base")
    eng.create_table_branch("t", "b1")
    eng.set_table_properties("t", {"owner": "me"})
    d = eng.execute("DESCRIBE DETAIL t").first()
    assert d.name == "t" and d.version == 1
    assert d.num_files >= 1 and d.size_bytes > 0
    assert d.partition_columns == ["bucket"]
    assert d.tags == ["base"] and d.branches == ["b1"]
    assert "owner" in d.properties
    tags = eng.execute("SHOW TAGS t").collect()
    assert [(r.tag, r.version) for r in tags] == [("base", 1)]
