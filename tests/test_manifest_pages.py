"""Format-2 paged manifests (versioning.py, VERDICT r05 #6): oversized
file lists split into page files with per-page [min, max] bounds; reads
reassemble transparently, predicate reads skip whole pages, GC reaps
expired/orphaned pages."""

from __future__ import annotations

import json
import os
import time

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.errors import VersionConflictError


@pytest.fixture()
def paged(monkeypatch):
    """Force paging at 4 files per page so real tables page cheaply."""
    monkeypatch.setattr(versioning, "MANIFEST_PAGE_ROWS", 4)


def test_real_table_pages_and_round_trips(spark, tmp_path, paged):
    """A real commit above the threshold writes a format-2 root + pages;
    every read surface (full read, predicate read, append inheritance,
    time travel) behaves identically to an inline manifest."""
    path = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    versioning.commit_version(
        df.repartitionByRange(10, "id"), path, stats_cols=["id"]
    )
    m = versioning.read_manifest(path, 1)
    root = json.loads(
        open(os.path.join(path, "_manifests", "v00001.json")).read()
    )
    assert root.get("format") == 2 and len(root["pages"]) == 3
    assert "files" not in root and root["file_count"] == 10
    # reassembly carries files + file_seq + stats
    assert len(m["files"]) == 10
    assert len(m["stats"]) == 10 and len(m["file_seq"]) == 10
    got = sorted(r.id for r in versioning.read_version(spark, path).collect())
    assert got == list(range(100))
    # predicate read: page-level skip + identical rows
    pred = [("id", "<", 10)]
    mp = versioning.read_manifest(path, 1, predicates=pred)
    assert mp.get("page_pruned") is True
    assert len(mp["files"]) < 10
    got = sorted(
        r.id
        for r in versioning.read_version(
            spark, path, predicates=pred
        ).collect()
    )
    assert got == list(range(10))
    # light read: O(1) root only
    ml = versioning.read_manifest(path, 1, light=True)
    assert ml["light"] is True and ml["files"] == []
    assert ml["schema"] is not None
    # append inherits the full parent census through the paged root
    versioning.commit_version(
        spark.range(100, 110).selectExpr("id", "id * 2 AS v").coalesce(1),
        path,
        mode="append",
        stats_cols=["id"],
    )
    m2 = versioning.read_manifest(path, 2)
    assert len(m2["files"]) == 11
    got = sorted(r.id for r in versioning.read_version(spark, path).collect())
    assert got == list(range(110))
    # time travel to the paged v1 still serves the old snapshot
    assert versioning.read_version(spark, path, version=1).count() == 100


def test_cfstable_reads_paged_manifest(spark, tmp_path, paged):
    from cubefs_hadoop_spark.sources.table_source import read_table

    path = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    versioning.commit_version(
        df.repartitionByRange(10, "id"), path, stats_cols=["id"]
    )
    got = sorted(r.id for r in read_table(spark, path).collect())
    assert got == list(range(100))
    got = sorted(
        r.id for r in read_table(spark, path).filter("id < 10").collect()
    )
    assert got == list(range(10))


def test_synthetic_100k_manifest_bounded_read(tmp_path):
    """100k-entry manifest: commit pages it, a full read reassembles the
    identical census, and a selective predicate read parses only the
    matching pages — all in bounded driver time."""
    path = str(tmp_path / "t")
    n = 100_000
    files = [f"data/s/{i:06d}.parquet" for i in range(n)]
    stats = {
        f: {"k": [i * 10, i * 10 + 9]} for i, f in enumerate(files)
    }
    manifest = {
        "version": 1,
        "parent": None,
        "mode": "overwrite",
        "files": files,
        "file_seq": {f: 1 for f in files},
        "stats": stats,
        "ts_ms": 0,
        "schema": {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ]},
    }
    fs = versioning._fs(None)
    t0 = time.monotonic()
    versioning._commit_manifest(path, dict(manifest), 1, fs)
    commit_s = time.monotonic() - t0
    root = json.loads(
        open(os.path.join(path, "_manifests", "v00001.json")).read()
    )
    assert root["format"] == 2
    assert len(root["pages"]) == n // versioning.MANIFEST_PAGE_ROWS
    t0 = time.monotonic()
    m = versioning.read_manifest(path, 1)
    full_s = time.monotonic() - t0
    assert m["files"] == files and len(m["stats"]) == n
    # identical prune results as the inline form
    pred = [("k", ">=", 999_000)]
    inline_keep = versioning.prune_files(manifest, pred)
    t0 = time.monotonic()
    mp = versioning.read_manifest(path, 1, predicates=pred)
    paged_keep = versioning.prune_files(mp, pred)
    pruned_s = time.monotonic() - t0
    assert paged_keep == inline_keep
    # the selective read touched ~1 of 10 pages: it must parse far less
    # than the full assembly (and both stay interactive)
    assert mp.get("page_pruned") is True
    assert len(mp["files"]) <= n // 10 + versioning.MANIFEST_PAGE_ROWS
    assert full_s < 30 and pruned_s < full_s and commit_s < 60


def test_gc_reaps_expired_and_orphan_pages(spark, tmp_path, paged):
    path = str(tmp_path / "t")
    for lo in (0, 100):
        versioning.commit_version(
            spark.range(lo, lo + 100)
            .selectExpr("id", "id * 2 AS v")
            .repartitionByRange(10, "id"),
            path,
            mode="append",
        )
    pages_dir = os.path.join(path, "_manifests", "pages")
    before = set(os.listdir(pages_dir))
    assert before  # both versions paged
    res = versioning.expire_versions(path, keep_last=1, orphan_grace_ms=0)
    assert res["versions_removed"] == 1
    after = set(os.listdir(pages_dir))
    # v1's pages gone, v2's intact and readable
    assert after < before
    assert all(f.startswith("v00002-") for f in after)
    assert versioning.read_version(spark, path).count() == 200
    with pytest.raises(Exception):
        versioning.read_manifest(path, 1)


def test_conflict_loser_pages_cleaned(tmp_path):
    """A version-number conflict deletes the loser's just-written pages
    eagerly (they are unreferenced by any root)."""
    path = str(tmp_path / "t")
    fs = versioning._fs(None)
    files = [f"data/s/{i:06d}.parquet" for i in range(25_000)]
    base = {
        "version": 1, "parent": None, "mode": "overwrite",
        "files": files, "ts_ms": 0, "schema": None,
    }
    versioning._commit_manifest(path, dict(base), 1, fs)
    pages_dir = os.path.join(path, "_manifests", "pages")
    n_before = len(os.listdir(pages_dir))
    with pytest.raises(VersionConflictError):
        versioning._commit_manifest(path, dict(base), 1, fs)
    assert len(os.listdir(pages_dir)) == n_before


def test_page_skipping_fires_on_timestamp_predicates(spark, tmp_path, paged):
    """Page bounds live in JSON form (datetimes as ISO strings); a
    datetime-valued predicate must normalize the same way or page
    skipping silently never fires (r6 review fix)."""
    import datetime

    path = str(tmp_path / "t")
    df = spark.range(0, 64).selectExpr(
        "id",
        "timestampadd(HOUR, CAST(id AS INT), "
        "TIMESTAMP '2026-01-01 00:00:00') AS ts",
    )
    versioning.commit_version(
        df.repartition(16, "id"), path, stats_cols=["ts"]
    )
    cutoff = datetime.datetime(2026, 1, 10)  # beyond every ts bound
    m = versioning.read_manifest(
        path, 1, predicates=[("ts", ">", cutoff)]
    )
    assert m.get("page_pruned") is True
    assert m["files"] == []  # every page refuted, none parsed for files
    # and the full read agrees row-level
    got = versioning.read_version(
        spark, path, predicates=[("ts", ">", cutoff)]
    )
    assert got.count() == 0


def test_gc_self_heals_torn_expired_root(spark, tmp_path, paged):
    """Pre-reorder crash artifact: an EXPIRED format-2 root whose pages
    are gone.  The census drops the torn root instead of wedging every
    future sweep; LIVE torn roots still raise (real corruption)."""
    path = str(tmp_path / "t")
    df = spark.range(0, 32).selectExpr("id")
    versioning.commit_version(df.repartition(8), path)
    versioning.commit_version(df.repartition(8), path, mode="overwrite")
    # simulate the old crash: delete v1's pages but keep its root
    md = os.path.join(path, "_manifests")
    root1 = json.load(open(os.path.join(md, "v00001.json")))
    assert root1.get("pages"), "fixture must have paged v1"
    for pg in root1["pages"]:
        os.remove(os.path.join(md, pg["path"]))
    stats = versioning.expire_versions(path, keep_last=1, orphan_grace_ms=0)
    assert stats["versions_removed"] >= 1
    assert versioning.list_versions(path) == [2]
    assert versioning.read_version(spark, path).count() == 32
    # a LIVE (kept) torn root is corruption and must raise
    root2 = json.load(open(os.path.join(md, "v00002.json")))
    for pg in root2["pages"]:
        os.remove(os.path.join(md, pg["path"]))
    from cubefs_hadoop_spark.errors import EngineIOError

    with pytest.raises(EngineIOError):
        versioning.expire_versions(path, keep_last=1, orphan_grace_ms=0)
