"""Table properties (TBLPROPERTIES): durable per-table settings in a
sidecar (O(1) set, no commit path touched).  The cfs.* keys steer
writers TABLE-locally — set the layout contract once and every producer
on any session inherits it, instead of each caller re-passing
stats/bloom columns."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import EngineIOError, TableNotFoundError


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "md5(CAST(id AS STRING)) AS doc_id"
    )


def test_properties_roundtrip_and_sql(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.execute(
        "ALTER TABLE t SET TBLPROPERTIES ('owner'='curation', "
        "'cfs.stats.cols'='id')"
    )
    assert eng.table_properties("t") == {
        "owner": "curation",
        "cfs.stats.cols": "id",
    }
    rows = eng.execute("SHOW TBLPROPERTIES t").collect()
    assert {(r.key, r.value) for r in rows} == {
        ("owner", "curation"),
        ("cfs.stats.cols", "id"),
    }
    eng.execute("ALTER TABLE t UNSET TBLPROPERTIES ('owner')")
    assert eng.table_properties("t") == {"cfs.stats.cols": "id"}


def test_stats_cols_property_defaults_commits(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.set_table_properties("t", {"cfs.stats.cols": "id"})
    # a later append with NO explicit stats_cols records stats anyway
    eng.write_table_version(_df(spark, 10, 30), "t", mode="append")
    path = eng._table_path("t")
    m = versioning.read_manifest(path, versioning.current_version(path))
    new_files = [f for f, seq in m["file_seq"].items() if seq == 2]
    assert new_files and all(
        "id" in m["stats"].get(f, {}) for f in new_files
    )


def test_bloom_cols_property_defaults_commits(eng, spark):
    df = _df(spark, 0, 30000).coalesce(1)
    eng.write_table_version(df, "plain_t")
    eng.write_table_version(df, "bloom_t")
    eng.set_table_properties("bloom_t", {"cfs.bloom.cols": "doc_id"})
    eng.write_table_version(df, "plain_t", mode="append")
    eng.write_table_version(df, "bloom_t", mode="append")

    def latest_bytes(name):
        path = eng._table_path(name)
        m = versioning.read_manifest(
            path, versioning.current_version(path)
        )
        sizes = {rel: sz for rel, sz, _m in eng.fs.walk_files(path)}
        return sum(
            sizes[f] for f, seq in m["file_seq"].items() if seq == 2
        )

    # the property-driven append carries bloom bytes the plain one lacks
    assert latest_bytes("bloom_t") > latest_bytes("plain_t") + 10_000


def test_target_file_bytes_property_drives_maintenance(eng, spark):
    for i in range(4):
        eng.write_table_version(
            _df(spark, i * 10, (i + 1) * 10).coalesce(2),
            "t",
            mode="append" if i else "overwrite",
        )
    eng.set_table_properties("t", {"cfs.target.file.bytes": str(1 << 20)})
    r = eng.maintain_table("t", keep_last=2)  # no explicit target
    assert r["binpacked"] is not None
    assert eng.read_version("t").count() == 40


def test_properties_require_versioned_table(eng, spark):
    eng.write_table(_df(spark, 0, 5), "plain")
    with pytest.raises(TableNotFoundError):
        eng.set_table_properties("plain", {"k": "v"})


def test_bad_sql_properties_refused(eng, spark):
    eng.write_table_version(_df(spark, 0, 5), "t")
    with pytest.raises(EngineIOError, match="key"):
        eng.execute("ALTER TABLE t SET TBLPROPERTIES (k=v)")


def test_cfstable_writer_inherits_stats_property(eng, spark):
    """The DataSource writer (no Spark session at commit) still records
    the numeric stats tier declared on the table — harvested from the
    staged parquet footers, metadata-only."""
    from cubefs_hadoop_spark.sources.table_source import register

    register(spark)
    eng.write_table_version(
        spark.range(10).selectExpr("id", "id * 2 AS v"), "t"
    )
    eng.set_table_properties("t", {"cfs.stats.cols": "id"})
    p = eng._table_path("t")
    (
        spark.range(10, 30)
        .selectExpr("id", "id * 2 AS v")
        .write.format("cfstable")
        .option("path", p)
        .mode("append")
        .save()
    )
    m = versioning.read_manifest(p, versioning.current_version(p))
    new_files = [f for f, seq in m["file_seq"].items() if seq == 2]
    assert new_files
    assert all("id" in m["stats"].get(f, {}) for f in new_files)
    # and the stats actually prune: id >= 100 matches none of the NEW
    # files (v1's pre-property files have no stats -> conservative keep)
    kept = versioning.prune_files(m, [("id", ">=", 100)])
    assert not set(kept) & set(new_files)


def test_corrupt_props_sidecar_fails_loudly(eng, spark):
    import os

    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.set_table_properties("t", {"k": "v"})
    p = os.path.join(eng._table_path("t"), "_manifests", "props.json")
    with open(p, "w") as fh:
        fh.write('{"k": "v"')  # torn write
    with pytest.raises(EngineIOError, match="corrupt"):
        eng.table_properties("t")
    # and commits consult props, so they refuse too instead of silently
    # dropping the declared layout contract
    with pytest.raises(EngineIOError, match="corrupt"):
        eng.write_table_version(_df(spark, 5, 8), "t", mode="append")
    os.remove(p)  # operator remedy
    assert eng.table_properties("t") == {}


def test_corrupt_tag_sidecar_fails_loudly(eng, spark):
    """A torn tag file must stop GC loudly — silently skipping it could
    reap a snapshot the tag promised to keep readable."""
    import os

    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.tag_table("t", "keep")
    p = os.path.join(eng._table_path("t"), "_manifests", "tag-keep.json")
    with open(p, "w") as fh:
        fh.write('{"version"')
    with pytest.raises(EngineIOError, match="tag-keep"):
        eng.table_tags("t")
    with pytest.raises(EngineIOError, match="corrupt tag"):
        eng.expire_table_versions("t", keep_last=1)


def test_rewrites_preserve_property_blooms(eng, spark):
    """OPTIMIZE/BINPACK rewrites keep writing the bloom tier declared on
    the table — a compaction must not silently strip point-lookup
    skipping from the files it produces."""
    df = _df(spark, 0, 40000)
    eng.write_table_version(df.coalesce(2), "t")
    eng.set_table_properties("t", {"cfs.bloom.cols": "doc_id"})
    path = eng._table_path("t")

    def live_bytes():
        m = versioning.read_manifest(path, versioning.current_version(path))
        sizes = {rel: sz for rel, sz, _m in eng.fs.walk_files(path)}
        return sum(sizes[f] for f in m["files"])

    before = live_bytes()  # v1: written pre-property, no blooms
    eng.compact_table("t")  # full rewrite under the property
    after = live_bytes()
    # same rows, same compression class — the bloom bitsets are the
    # dominant byte delta (~1 byte/row at default FPP)
    assert after > before + 20_000
    assert eng.read_version("t").count() == 40000


def test_persisted_check_constraints(eng, spark):
    """ADD CONSTRAINT: proven against existing data at creation, then
    enforced on EVERY versioned commit by every producer."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.execute("ALTER TABLE t ADD CONSTRAINT id_pos CHECK (id >= 0)")
    assert eng.table_constraints("t") == {"id_pos": "id >= 0"}
    # clean append passes
    eng.write_table_version(_df(spark, 10, 15), "t", mode="append")
    # violating append refused BEFORE any data stages
    bad = spark.range(5).selectExpr("id - 99 AS id", "md5('x') AS doc_id")
    with pytest.raises(EngineIOError, match="id_pos"):
        eng.write_table_version(bad, "t", mode="append")
    assert eng.read_version("t").count() == 15  # nothing landed
    # a constraint the existing data violates is refused at creation
    with pytest.raises(EngineIOError, match="existing data"):
        eng.execute("ALTER TABLE t ADD CONSTRAINT big CHECK (id > 100)")
    # the streaming committer inherits enforcement (same commit path)
    from cubefs_hadoop_spark import versioning

    with pytest.raises(EngineIOError, match="id_pos"):
        versioning.commit_version(bad, eng._table_path("t"), mode="append")
    # drop lifts it
    eng.execute("ALTER TABLE t DROP CONSTRAINT id_pos")
    eng.write_table_version(bad, "t", mode="append")
    assert eng.read_version("t").count() == 20


def test_property_blooms_tolerate_merge_schema_appends(eng, spark):
    """Property-derived bloom cols FILTER to the written schema — a
    merge-schema append without the bloom column must not be refused
    (r6 review fix); an EXPLICIT bloom_cols arg still validates."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.set_table_properties("t", {"cfs.bloom.cols": "doc_id"})
    # additive append lacking doc_id: allowed, no bloom written
    eng.write_table_version(
        spark.range(10, 15).selectExpr("id", "id AS extra"),
        "t",
        mode="append",
    )
    assert versioning.read_version(
        spark, eng._table_path("t"), merge_schema=True
    ).count() == 15
    with pytest.raises(EngineIOError, match="bloom"):
        eng.write_table_version(
            spark.range(3).selectExpr("id"), "t2", bloom_cols=["nope"]
        )
