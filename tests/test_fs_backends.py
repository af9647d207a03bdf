"""WarehouseFS backends (VERDICT r02 #4): the Engine's metadata plane over
LocalFS (bare paths, POSIX) and HadoopFS (any Hadoop-FS URI through the
session JVM — exercised here with ``file://`` since that is the scheme this
container can serve; hdfs://-or-s3a:// differ only in the conf-resolved
FileSystem impl, which is the reference's own deployment story,
CubefsFileSystem.java:43,58).

Covers:
  - contract parity between the two backends (rename false-if-dst,
    create_if_absent exclusivity, walk/list shapes)
  - the full Engine lifecycle on a ``file:///`` warehouse root
  - versioned tables (commit/time-travel/rollback/expire) over HadoopFS
"""

from __future__ import annotations

import os

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import TableNotFoundError
from cubefs_hadoop_spark.fs import HadoopFS, LocalFS, has_scheme, warehouse_fs


def _viewfs_root(spark, tmp_path, name: str = "whtest") -> str:
    """Mount ``viewfs://<name>/wh`` onto a local dir via the session's
    Hadoop conf — a SECOND real scheme (ViewFileSystem, not
    LocalFileSystem) so HadoopFS's URI routing is exercised beyond
    ``file://`` (VERDICT r04 #7).  viewfs resolves every verb through its
    mount table, which is exactly the client-side indirection a
    federated/multi-cluster deployment uses."""
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{name}.link./wh",
        "file://" + str(tmp_path / f"viewfs_target_{name}"),
    )
    return f"viewfs://{name}/wh"


def _backends(spark, tmp_path):
    local_root = str(tmp_path / "local")
    uri_root = "file://" + str(tmp_path / "uri")
    view_root = _viewfs_root(spark, tmp_path)
    return [
        (LocalFS(), local_root),
        (HadoopFS(spark, uri_root), uri_root),
        (HadoopFS(spark, view_root), view_root),
    ]


def test_has_scheme():
    assert has_scheme("file:///w")
    assert has_scheme("hdfs://nn:9000/w")
    assert has_scheme("s3a://bucket/w")
    assert not has_scheme("/plain/path")
    assert not has_scheme("relative/path")
    assert not has_scheme("C:\\windows\\style")


def test_warehouse_fs_routing(spark, tmp_path):
    assert isinstance(warehouse_fs(spark, str(tmp_path)), LocalFS)
    assert isinstance(warehouse_fs(spark, "file://" + str(tmp_path)), HadoopFS)


def test_backend_contract_parity(spark, tmp_path):
    """Both backends implement the same verb semantics."""
    for fs, root in _backends(spark, tmp_path):
        d = fs.join(root, "db")
        assert not fs.exists(d)
        fs.mkdirs(d)
        assert fs.is_dir(d)

        f1 = fs.join(d, "a.txt")
        fs.write_text(f1, "hello")
        assert fs.read_text(f1) == "hello"
        fs.write_text(f1, "hello2")  # overwrite
        assert fs.read_text(f1) == "hello2"
        assert fs.exists(f1) and not fs.is_dir(f1)

        # list_dir: (name, is_dir) pairs; missing dir -> []
        names = dict(fs.list_dir(d))
        assert names == {"a.txt": False}
        assert fs.list_dir(fs.join(root, "nope")) == []

        # rename: N10 false-if-dst-exists; FileNotFoundError on missing src
        f2 = fs.join(d, "b.txt")
        assert fs.rename(f1, f2) is True
        fs.write_text(f1, "other")
        assert fs.rename(f1, f2) is False  # dst exists -> refused
        assert fs.read_text(f2) == "hello2"  # dst untouched
        with pytest.raises(FileNotFoundError):
            fs.rename(fs.join(d, "ghost"), f2)

        # create_if_absent: atomic no-overwrite publish
        f3 = fs.join(d, "manifest.json")
        assert fs.create_if_absent(f3, "v1") is True
        assert fs.create_if_absent(f3, "v2") is False
        assert fs.read_text(f3) == "v1"  # loser never corrupts the winner

        # walk_files: (relpath, size, mtime_ms) recursively
        sub = fs.join(d, "nested")
        fs.mkdirs(sub)
        fs.write_text(fs.join(sub, "c.txt"), "xyz")
        walked = {rel: size for rel, size, _m in fs.walk_files(d)}
        assert walked["nested/c.txt"] == 3
        assert set(walked) == {"a.txt", "b.txt", "manifest.json", "nested/c.txt"}
        mtimes = [m for _r, _s, m in fs.walk_files(d)]
        assert all(m > 1_500_000_000_000 for m in mtimes)  # ms, not sec

        # delete: recursive dir, single file, missing -> False
        assert fs.delete(fs.join(d, "ghost")) is False
        assert fs.delete(f3, recursive=False) is True
        assert fs.delete(d, recursive=True) is True
        assert not fs.exists(d)

        # cleanup_empty_dirs prunes empties, keeps non-empty + root
        fs.mkdirs(fs.join(root, "gc", "empty1", "empty2"))
        fs.mkdirs(fs.join(root, "gc", "keep"))
        fs.write_text(fs.join(root, "gc", "keep", "f"), "x")
        fs.cleanup_empty_dirs(fs.join(root, "gc"))
        assert not fs.exists(fs.join(root, "gc", "empty1"))
        assert fs.read_text(fs.join(root, "gc", "keep", "f")) == "x"


@pytest.fixture()
def uri_eng(spark, tmp_path):
    """Engine rooted at a file:// URI — every metadata verb goes through
    HadoopFS."""
    e = Engine(spark, "file://" + str(tmp_path / "wh"))
    assert isinstance(e.fs, HadoopFS)
    return e


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "id")


def test_engine_lifecycle_over_uri(uri_eng, spark):
    """The full storage contract (N3/N6/N8/N10-N14/N18) on a URI root."""
    eng = uri_eng
    eng.write_table(spark.range(0, 10), "t")
    assert eng.list_tables() == ["t"]
    assert eng.table_exists("t")
    assert eng.is_committed("t")
    assert eng.table("t").count() == 10

    # N8 append as new part files
    eng.append(spark.range(10, 15), "t")
    assert eng.table("t").count() == 15

    # N18 content summary
    st = eng.table_stats("t")
    assert st["rows"] == 15 and st["files"] >= 1 and st["bytes"] > 0

    # describe: FileStatus-shaped rows incl the _SUCCESS marker
    desc = eng.describe("t").collect()
    assert any(r.is_marker for r in desc)
    assert all(r.mtime_ms > 1_500_000_000_000 for r in desc)

    # N10 rename refuses existing dst
    eng.write_table(spark.range(3), "u")
    assert eng.rename_table("t", "u") is False
    assert eng.rename_table("t", "t2") is True
    with pytest.raises(TableNotFoundError):
        eng.rename_table("ghost", "x")

    # N11 recursive delete
    assert eng.drop_table("t2") is True
    assert not eng.table_exists("t2")

    # views + SQL over the URI warehouse
    eng.create_view("u_doubled", "SELECT id * 2 AS id2 FROM u")
    assert eng.sql("SELECT sum(id2) AS s FROM u_doubled").first().s == 6

    # compact keeps content
    eng.append(spark.range(3, 6), "u")
    eng.compact_table("u")
    assert sorted(r.id for r in eng.table("u").collect()) == [0, 1, 2, 3, 4, 5]


def test_versioned_tables_over_uri(uri_eng, spark):
    """Manifest commit/time-travel/rollback/expire on HadoopFS — the
    create-if-absent publish is FileSystem.create(overwrite=false)."""
    eng = uri_eng
    assert eng.write_table_version(spark.range(0, 5), "v") == 1
    assert eng.write_table_version(spark.range(0, 3), "v") == 2
    assert eng.table_versions("v") == [1, 2]
    assert eng.read_version("v", 1).count() == 5
    assert eng.read_version("v").count() == 3

    assert eng.rollback_table("v", 1) == 3
    assert eng.read_version("v").count() == 5

    gone = eng.expire_table_versions("v", keep_last=1)
    assert gone["versions_removed"] == 2
    assert eng.table_versions("v") == [3]
    assert eng.read_version("v").count() == 5  # survivor intact

    # engine-level reads resolve the latest snapshot, not the raw dir
    assert eng.table("v").count() == 5


def test_sync_catalog_over_uri_root(uri_eng, spark):
    """Catalog registration works when table LOCATIONs are Hadoop-FS URIs
    — the deployment shape of a real distributed warehouse."""
    eng = uri_eng
    eng.write_table(spark.range(6).selectExpr("id"), "t")
    try:
        eng.sync_catalog()
        assert spark.sql("SELECT count(*) AS n FROM default.t").first().n == 6
        eng.append(spark.range(2).selectExpr("id"), "t")
        assert eng.sql("SELECT count(*) AS n FROM t").first().n == 8
    finally:
        eng.unsync_catalog()


# -- property test: backend parity under random op sequences ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_NAMES = st.sampled_from(["a", "b", "c", "d1", "d2"])
_OP = st.one_of(
    st.tuples(st.just("mkdir"), _NAMES),
    st.tuples(st.just("write"), _NAMES, st.text(max_size=8)),
    st.tuples(st.just("rename"), _NAMES, _NAMES),
    st.tuples(st.just("delete"), _NAMES),
    st.tuples(st.just("cia"), _NAMES, st.text(max_size=8)),  # create_if_absent
)


def _apply(fs, root, op):
    kind = op[0]
    p = fs.join(root, op[1])
    try:
        if kind == "mkdir":
            fs.mkdirs(p)
            return ("ok",)
        if kind == "write":
            if fs.is_dir(p):
                return ("skip",)  # writing over a dir diverges per-FS; out of contract
            fs.write_text(p, op[2])
            return ("ok",)
        if kind == "rename":
            return ("ren", fs.rename(p, fs.join(root, op[2])))
        if kind == "delete":
            return ("del", fs.delete(p))
        if kind == "cia":
            if fs.is_dir(p):
                return ("skip",)
            return ("cia", fs.create_if_absent(p, op[2]))
    except FileNotFoundError:
        return ("enoent",)
    except OSError as ex:
        return ("oserr", type(ex).__name__)


def _observe(fs, root):
    out = {}
    for rel, size, _m in sorted(fs.walk_files(root)):
        out[rel] = (size, fs.read_text(fs.join(root, rel)))
    dirs = sorted(n for n, d in fs.list_dir(root) if d)
    return out, dirs


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=12))
def test_backend_parity_property(spark, tmp_path_factory, ops):
    """Any op sequence leaves LocalFS and HadoopFS in identical observable
    states (files+contents+dirs) with identical per-op results — the
    contract the Engine relies on to be backend-agnostic."""
    base = tmp_path_factory.mktemp("fsprop")
    lfs, lroot = LocalFS(), str(base / "l")
    hfs = HadoopFS(spark, "file://" + str(base / "h"))
    hroot = "file://" + str(base / "h")
    lfs.mkdirs(lroot)
    hfs.mkdirs(hroot)
    for op in ops:
        ra = _apply(lfs, lroot, op)
        rb = _apply(hfs, hroot, op)
        assert ra == rb, (op, ra, rb)
    assert _observe(lfs, lroot) == _observe(hfs, hroot)


def test_engine_lifecycle_over_viewfs(spark, tmp_path):
    """Engine + versioned tables on the SECOND scheme (viewfs://): data
    plane (Spark parquet IO) and metadata plane (HadoopFS verbs incl. the
    create-if-absent manifest publish) both route through the mount
    table."""
    root = _viewfs_root(spark, tmp_path, "engcluster")
    eng = Engine(spark, root)
    assert isinstance(eng.fs, HadoopFS)

    eng.write_table(spark.range(0, 8), "t")
    assert eng.table("t").count() == 8
    eng.append(spark.range(8, 10), "t")
    assert eng.table("t").count() == 10
    assert eng.rename_table("t", "t2") is True
    assert eng.table_stats("t2")["rows"] == 10

    assert eng.write_table_version(spark.range(4), "v") == 1
    assert eng.write_table_version(spark.range(2), "v") == 2
    assert eng.read_version("v", 1).count() == 4
    assert eng.read_version("v").count() == 2
    gone = eng.expire_table_versions("v", keep_last=1)
    assert gone["versions_removed"] == 1
    assert eng.table("v").count() == 2

    st = eng.status()  # getStatus resolves through the mount
    assert st["capacity"] > 0 and st["remaining"] > 0
    assert eng.drop_table("t2") is True


def test_has_scheme_single_slash_uri():
    assert has_scheme("file:/single/slash")  # Hadoop's short URI form
    assert not has_scheme("C:/windows/drive")


def test_status_reports_capacity(spark, tmp_path, uri_eng):
    """FsStatus parity (reference testFsStatus): capacity/remaining > 0 on
    both backends."""
    for eng in (Engine(spark, str(tmp_path / "lwh")), uri_eng):
        st = eng.status()
        assert st["capacity"] > 0 and st["remaining"] > 0
        assert st["used"] >= 0 and st["capacity"] >= st["remaining"]
