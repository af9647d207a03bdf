"""Incremental binpack compaction (Iceberg rewrite-data-files binpack /
Delta OPTIMIZE): only small files rewrite; well-sized files — and their
stats and sequence numbers — survive untouched.  The O(small-files)
maintenance verb that keeps streaming-ingest tables healthy at 100 TB
where a full ``compact_version`` rewrite is O(table)."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _append_many_small(eng, spark, n_commits=4, rows_each=20):
    """Simulate streaming ingest: several tiny append commits."""
    for i in range(n_commits):
        df = spark.range(i * rows_each, (i + 1) * rows_each).selectExpr(
            "id", "id * 2 AS v"
        )
        eng.write_table_version(
            df.coalesce(2), "t",
            mode="append" if i else "overwrite",
            stats_cols=["id"],
        )


def test_binpack_rewrites_only_small_files(eng, spark):
    _append_many_small(eng, spark)
    path = eng._table_path("t")
    before = versioning.read_manifest(path, versioning.current_version(path))
    n_before = len(before["files"])
    v = eng.binpack_table("t", target_file_bytes=1 << 20)
    assert v == versioning.current_version(path)
    after = versioning.read_manifest(path, v)
    # everything was tiny -> one output file, content identical
    assert len(after["files"]) < n_before
    assert eng.read_version("t").count() == 80
    assert sorted(
        r.id for r in eng.read_version("t").collect()
    ) == list(range(80))
    # history intact: the pre-binpack snapshot still reads
    assert eng.read_version("t", v - 1).count() == 80
    # stats re-harvested for the packed files
    assert all(
        "id" in st for st in after["stats"].values()
    )


def test_binpack_keeps_large_files_untouched(eng, spark):
    _append_many_small(eng, spark)
    path = eng._table_path("t")
    # first binpack produces one well-sized file
    v1 = eng.binpack_table("t", target_file_bytes=1 << 20)
    m1 = versioning.read_manifest(path, v1)
    packed = set(m1["files"])
    # more small appends land on top
    for i in (4, 5, 6):
        eng.write_table_version(
            spark.range(i * 20, (i + 1) * 20)
            .selectExpr("id", "id * 2 AS v")
            .coalesce(2),
            "t",
            mode="append",
            stats_cols=["id"],
        )
    # second binpack: packed files are already above min_file_bytes for a
    # tiny threshold, so they must survive verbatim with seq/stats intact
    sizes = {
        rel: size for rel, size, _m in eng.fs.walk_files(path)
    }
    big = max(packed, key=lambda f: sizes.get(f, 0))
    v2 = eng.binpack_table(
        "t", target_file_bytes=1 << 20, min_file_bytes=sizes[big]
    )
    m2 = versioning.read_manifest(path, v2)
    assert big in m2["files"]
    assert m2["file_seq"][big] == m1["file_seq"][big]
    assert m2["stats"][big] == m1["stats"][big]
    assert eng.read_version("t").count() == 140
    # binpacked-away small files are gone from the live set
    assert all(
        sizes.get(f, 0) >= sizes[big] or m2["file_seq"][f] == v2
        for f in m2["files"]
    )


def test_binpack_noop_when_nothing_qualifies(eng, spark):
    eng.write_table_version(
        spark.range(100).selectExpr("id").coalesce(1), "t"
    )
    path = eng._table_path("t")
    v_before = versioning.current_version(path)
    assert eng.binpack_table("t", target_file_bytes=1 << 20) is None
    assert versioning.current_version(path) == v_before


def test_binpack_partitioned_preserves_layout(eng, spark):
    for i in range(3):
        eng.write_table_version(
            spark.range(i * 30, (i + 1) * 30).selectExpr(
                "id", "CAST(id % 2 AS INT) AS p"
            ),
            "t",
            mode="append" if i else "overwrite",
            partition_by=["p"],
        )
    v = eng.binpack_table("t", target_file_bytes=1 << 20)
    assert v is not None
    files = eng.table_files("t")
    rows = files.collect()
    # layout preserved: every live file still sits under a p=... dir
    assert all(r.partition.get("p") in ("0", "1") for r in rows)
    # packed down to one file per partition value
    assert len(rows) == 2
    df = eng.read_version("t")
    assert df.count() == 90
    assert sorted(r.id for r in df.collect()) == list(range(90))
    # partition column values survived the basePath round-trip
    assert df.filter("p = 1").count() == 45


def test_binpack_refuses_pending_mor_deletes(eng, spark):
    _append_many_small(eng, spark)
    eng.delete_from("t", "id < 5", strategy="mor")
    with pytest.raises(EngineIOError, match="compact_version"):
        eng.binpack_table("t", target_file_bytes=1 << 20)


def test_binpack_refuses_pending_schema_ops(eng, spark):
    _append_many_small(eng, spark)
    eng.alter_table("t", [{"op": "rename", "from": "v", "to": "w"}])
    with pytest.raises(EngineIOError, match="compact_version"):
        eng.binpack_table("t", target_file_bytes=1 << 20)


def test_optimize_binpack_sql_verb(eng, spark):
    _append_many_small(eng, spark)
    eng.execute("OPTIMIZE t BINPACK")
    path = eng._table_path("t")
    m = versioning.read_manifest(path, versioning.current_version(path))
    assert m["mode"] == "binpack"
    assert eng.read_version("t").count() == 80


def test_maintain_table_policy(eng, spark):
    """The one-call maintenance verb picks the right tool per state:
    binpack on a clean small-file table, full compact when MoR deletes or
    schema ops are pending, GC always."""
    _append_many_small(eng, spark)
    r1 = eng.maintain_table("t", target_file_bytes=1 << 20, keep_last=2)
    assert r1["binpacked"] is not None and r1["compacted"] is None
    assert eng.read_version("t").count() == 80
    # pending MoR delete flips the policy to full compact
    eng.delete_from("t", "id < 10", strategy="mor")
    r2 = eng.maintain_table("t", target_file_bytes=1 << 20, keep_last=2)
    assert r2["compacted"] is not None and r2["binpacked"] is None
    assert eng.read_version("t").count() == 70  # delete materialized
    assert r2["gc"]["versions_removed"] > 0
    # stats tier survives both rewrites
    m = versioning.read_manifest(
        eng._table_path("t"),
        versioning.current_version(eng._table_path("t")),
    )
    assert all("id" in st for st in m["stats"].values())
    # idempotent: rerunning is safe and a no-op on a healthy table
    r3 = eng.maintain_table("t", target_file_bytes=1 << 20, keep_last=2)
    assert r3["binpacked"] is None and r3["compacted"] is None


def test_maintain_table_compacts_through_rename(eng, spark):
    """Stats tracked under a pre-ALTER name are re-harvested under the
    renamed column after the policy compact."""
    _append_many_small(eng, spark)
    eng.alter_table("t", [{"op": "rename", "from": "id", "to": "key"}])
    r = eng.maintain_table("t", target_file_bytes=1 << 20, keep_last=2)
    assert r["compacted"] is not None
    m = versioning.read_manifest(
        eng._table_path("t"),
        versioning.current_version(eng._table_path("t")),
    )
    assert all("key" in st for st in m["stats"].values())
    assert eng.read_version("t").columns == ["key", "v"]
