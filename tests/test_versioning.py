"""Snapshot/versioned-table tests (Iceberg-capability analog): atomic
multi-file commit, time travel, append lineage, rollback, GC, and the
concurrent-writer conflict (VERDICT r01 next-round #7)."""

from __future__ import annotations

import json
import os
import threading

import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.errors import TableNotFoundError, VersionConflictError
from cubefs_hadoop_spark.fs import LocalFS

FS = LocalFS()


@pytest.fixture()
def eng(spark, tmp_warehouse):
    return Engine(spark, tmp_warehouse)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_read_at_version_time_travel(eng, spark):
    v1 = eng.write_table_version(_df(spark, 0, 10), "t")
    v2 = eng.write_table_version(_df(spark, 0, 5), "t")  # overwrite
    assert (v1, v2) == (1, 2)
    assert eng.read_version("t").count() == 5  # latest
    assert eng.read_version("t", 1).count() == 10  # time travel
    assert eng.table_versions("t") == [1, 2]
    with pytest.raises(TableNotFoundError):
        eng.read_version("t", 99)


def test_append_builds_on_parent_files(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 10, 15), "t", mode="append")
    assert eng.read_version("t").count() == 15
    assert eng.read_version("t", 1).count() == 10
    # append manifest references parent's files, not copies of their data
    m1 = versioning.read_manifest(eng._table_path("t"), 1)
    m2 = versioning.read_manifest(eng._table_path("t"), 2)
    assert set(m1["files"]) < set(m2["files"])


def test_rollback_is_append_only(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 0, 3), "t")
    v3 = eng.rollback_table("t", 1)
    assert v3 == 3
    assert eng.read_version("t").count() == 10
    # the bad version stays inspectable
    assert eng.read_version("t", 2).count() == 3


def test_expire_versions_gc(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 0, 5), "t")
    stats = eng.expire_table_versions("t", keep_last=1)
    assert stats["versions_removed"] == 1
    assert stats["files_removed"] >= 1
    assert eng.table_versions("t") == [2]
    assert eng.read_version("t").count() == 5
    with pytest.raises(TableNotFoundError):
        eng.read_version("t", 1)


def test_commit_never_tears_a_read(eng, spark):
    """A reader resolving version N keeps reading N's exact file set even
    after an overwrite commit lands."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    snapshot = eng.read_version("t")  # resolved to v1's files
    eng.write_table_version(_df(spark, 0, 2), "t")
    assert snapshot.count() == 10  # still v1


def test_concurrent_writers_one_wins(eng, spark, tmp_warehouse):
    """Two racing OVERWRITE commits to the same next version: exactly one
    manifest lands; the loser raises VersionConflictError."""
    eng.write_table_version(_df(spark, 0, 3), "t")
    path = eng._table_path("t")

    # Stage both writers' data first, then race the manifest commits so the
    # CAS (os.link create-if-absent) is what decides the winner.
    _, files_a = versioning._stage_write(_df(spark, 0, 4), path, None, FS)
    _, files_b = versioning._stage_write(_df(spark, 0, 6), path, None, FS)
    manifest = {"parent": 1, "mode": "overwrite", "ts_ms": 0, "schema": None}
    results: list = [None, None]

    def commit(i, files):
        try:
            results[i] = versioning._commit_manifest(
                path, {**manifest, "version": 2, "files": files}, 2, FS
            )
        except VersionConflictError as ex:
            results[i] = ex

    ts = [
        threading.Thread(target=commit, args=(0, files_a)),
        threading.Thread(target=commit, args=(1, files_b)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(type(r).__name__ for r in results) == [
        "VersionConflictError", "int",
    ]
    # the committed manifest is exactly one of the two candidates, intact
    m = versioning.read_manifest(path, 2)
    assert m["files"] in (files_a, files_b)


def test_append_retries_through_conflict(eng, spark):
    """Append commits commute: a conflicting append retries onto the new
    parent instead of failing."""
    eng.write_table_version(_df(spark, 0, 3), "t")
    path = eng._table_path("t")
    real_commit = versioning._commit_manifest
    raced = {"done": False}

    def racing_commit(table_path, manifest, version, fs, branch=None):
        # first attempt: sneak a competing commit in just before ours
        if not raced["done"]:
            raced["done"] = True
            _, files = versioning._stage_write(_df(spark, 100, 103), path, None, fs)
            real_commit(
                path,
                {"version": version, "parent": manifest["parent"],
                 "mode": "append", "files": files, "ts_ms": 0, "schema": None},
                version,
                fs,
            )
        return real_commit(table_path, manifest, version, fs, branch)

    versioning._commit_manifest = racing_commit
    try:
        v = eng.write_table_version(_df(spark, 3, 6), "t", mode="append")
    finally:
        versioning._commit_manifest = real_commit
    assert v == 3  # retried onto the interloper's v2
    assert eng.read_version("t").count() == 6  # 3 base + 3 appended... via parent v2

    # the appended rows AND the interloper's rows are both present
    ids = {r.id for r in eng.read_version("t").collect()}
    assert {3, 4, 5} <= ids and {100, 101, 102} <= ids


def test_manifest_is_durable_json(eng, spark):
    eng.write_table_version(_df(spark, 0, 3), "t")
    mp = os.path.join(eng._table_path("t"), "_manifests", "v00001.json")
    with open(mp, encoding="utf-8") as fh:
        m = json.load(fh)
    assert m["version"] == 1 and m["parent"] is None
    assert all(f.startswith("data/") for f in m["files"])


# -- property test: version history vs an in-memory model -------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

vop = st.one_of(
    st.tuples(st.just("overwrite"), st.integers(1, 5)),
    st.tuples(st.just("append"), st.integers(1, 5)),
    st.tuples(st.just("rollback"), st.integers(1, 6)),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(vop, min_size=1, max_size=6))
def test_version_history_agrees_with_model(spark, tmp_path_factory, ops):
    """Random commit/append/rollback sequences: every historical version
    must replay to the row count the model predicts — time travel never
    rewrites history."""
    wh = str(tmp_path_factory.mktemp("ver_wh"))
    eng = Engine(spark, wh)
    history: list[int] = []  # version index -> expected row count

    def mk(n):
        return spark.range(n).selectExpr("id", "id * 3 AS v")

    for kind, n in ops:
        if kind == "overwrite":
            eng.write_table_version(mk(n), "t", mode="overwrite")
            history.append(n)
        elif kind == "append":
            if history:
                eng.write_table_version(mk(n), "t", mode="append")
                history.append(history[-1] + n)
            else:
                eng.write_table_version(mk(n), "t", mode="append")
                history.append(n)
        elif kind == "rollback":
            if not history:
                continue
            target = (n % len(history)) + 1
            eng.rollback_table("t", target)
            history.append(history[target - 1])
    assert eng.table_versions("t") == list(range(1, len(history) + 1))
    for v, expect in enumerate(history, start=1):
        assert eng.read_version("t", v).count() == expect, f"v{v}"


# -- maintenance verbs vs versioned tables (VERDICT r02 #5) ----------------


def test_write_table_routes_through_version_commit(eng, spark):
    """Plain write_table on a versioned table must commit through the
    manifest protocol — never rewrite the dir around _manifests/."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.write_table(_df(spark, 0, 3), "t", mode="overwrite")
    assert eng.table_versions("t") == [1, 2]  # history intact
    assert eng.read_version("t", 1).count() == 5  # time travel intact
    assert eng.table("t").count() == 3

    eng.append(_df(spark, 10, 12), "t")  # append -> versioned append
    assert eng.table_versions("t") == [1, 2, 3]
    assert eng.table("t").count() == 5

    from cubefs_hadoop_spark.errors import TableAlreadyExistsError

    with pytest.raises(TableAlreadyExistsError):
        eng.write_table(_df(spark, 0, 1), "t")  # errorifexists honored
    eng.write_table(_df(spark, 0, 1), "t", mode="ignore")  # no-op
    assert eng.table_versions("t") == [1, 2, 3]


def test_compact_versioned_table_preserves_history(eng, spark):
    """compact_table on a versioned table commits a new 'compact' version:
    identical content, intact history, old versions still readable."""
    eng.write_table_version(_df(spark, 0, 4), "t")
    eng.write_table_version(_df(spark, 4, 10), "t", mode="append")
    before = sorted(r.id for r in eng.table("t").collect())

    eng.compact_table("t")
    vs = eng.table_versions("t")
    assert vs == [1, 2, 3]
    m = versioning.read_manifest(eng._table_path("t"), 3)
    assert m["mode"] == "compact"
    assert sorted(r.id for r in eng.table("t").collect()) == before
    assert eng.read_version("t", 1).count() == 4  # history intact

    # expire reclaims the superseded pre-compaction files
    eng.expire_table_versions("t", keep_last=1)
    assert eng.table_versions("t") == [3]
    assert sorted(r.id for r in eng.table("t").collect()) == before


def test_table_stats_scope_to_current_snapshot(eng, spark):
    """table_stats on a versioned table reports the current snapshot's
    files/bytes, not every historical version's."""
    eng.write_table_version(_df(spark, 0, 100), "t")
    eng.write_table_version(_df(spark, 0, 10), "t")  # overwrite, smaller
    st = eng.table_stats("t")
    assert st["rows"] == 10
    m = versioning.read_manifest(eng._table_path("t"), 2)
    assert st["files"] == len(m["files"])  # v1's files not counted


def test_expire_reaps_orphaned_staging_from_failed_commit(eng, spark):
    """A commit that staged data files but crashed before the manifest
    publish leaves an orphan stage dir; expire_versions reclaims it once
    past the grace window (and never touches referenced files)."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    path = eng._table_path("t")
    # simulate the crash: stage data, never publish a manifest
    _stage, orphan_files = versioning._stage_write(
        _df(spark, 100, 200), path, None, FS
    )
    assert orphan_files
    # grace 0 = "this crash is ancient": the orphan stage is reclaimed
    stats = eng.expire_table_versions("t", keep_last=5, orphan_grace_ms=0)
    assert stats["files_removed"] >= len(orphan_files)
    assert eng.read_version("t").count() == 5  # live version untouched
    # the orphan stage dir itself is gone
    import os

    assert not os.path.isdir(os.path.join(path, "data", _stage))


def test_expire_spares_inflight_stage_but_reaps_expired_files(eng, spark):
    """ADVICE r04: expire_versions must NOT reclaim a freshly staged,
    never-referenced file set (an in-flight commit between _stage_write
    and manifest publish) — while still immediately reclaiming files that
    expired manifests provably superseded."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 0, 5), "t")  # overwrite supersedes v1
    path = eng._table_path("t")
    # an in-flight commit: staged seconds ago, manifest not yet published
    _stage, inflight = versioning._stage_write(_df(spark, 50, 60), path, None, FS)

    stats = eng.expire_table_versions("t", keep_last=1)  # default grace
    assert stats["versions_removed"] == 1
    assert stats["files_removed"] >= 1  # v1's superseded files reclaimed
    # the in-flight stage survived the sweep...
    for rel in inflight:
        assert FS.exists(FS.join(path, rel)), rel
    # ...so the commit can still publish and the version reads cleanly
    manifest = {
        "version": 3, "parent": 2, "mode": "append",
        "files": sorted(
            versioning.read_manifest(path, 2)["files"] + inflight
        ),
        "ts_ms": 0, "schema": None,
    }
    versioning._commit_manifest(path, manifest, 3, FS)
    assert eng.read_version("t", 3).count() == 15  # 5 + 10 staged rows


def test_adopt_plain_table_preserves_existing_rows(eng, spark):
    """ADVICE r04: versioning a pre-existing PLAIN parquet table must not
    shadow its rows — adopt_plain_table commits them (in place, no
    rewrite) as version 1."""
    from cubefs_hadoop_spark.errors import EngineIOError

    eng.write_table(_df(spark, 0, 7), "t")  # plain, unversioned
    path = eng._table_path("t")
    assert not versioning.is_versioned(path)
    v = versioning.adopt_plain_table(path)
    assert v == 1
    m = versioning.read_manifest(path, 1)
    assert m["mode"] == "adopt" and m["files"]
    assert all(not f.startswith("data/") for f in m["files"])  # in place
    assert eng.read_version("t", 1).count() == 7
    # now a versioned append builds on the adopted file set
    versioning.commit_version(_df(spark, 7, 10), path, mode="append")
    assert eng.table("t").count() == 10
    # double adopt and empty adopt are typed refusals
    with pytest.raises(EngineIOError):
        versioning.adopt_plain_table(path)


def test_incremental_read_changes(eng, spark):
    """read_table_changes returns exactly the rows added in the version
    range; non-additive ranges are refused."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.write_table_version(_df(spark, 5, 8), "t", mode="append")
    eng.write_table_version(_df(spark, 8, 10), "t", mode="append")

    inc = eng.read_table_changes("t", from_version=1)
    assert sorted(r.id for r in inc.collect()) == [5, 6, 7, 8, 9]
    inc12 = eng.read_table_changes("t", from_version=1, to_version=2)
    assert sorted(r.id for r in inc12.collect()) == [5, 6, 7]
    # empty range -> empty frame with the table schema
    assert eng.read_table_changes("t", 3, 3).count() == 0

    # overwrite breaks additivity -> typed refusal
    eng.write_table_version(_df(spark, 0, 2), "t", mode="overwrite")
    from cubefs_hadoop_spark.errors import EngineIOError

    with pytest.raises(EngineIOError):
        eng.read_table_changes("t", from_version=1)


def test_versioned_schema_evolution_merge_schema(eng, spark):
    """Appending a snapshot with a new nullable column: merge_schema reads
    reconcile old and new parts (the same contract as plain tables)."""
    eng.write_table_version(spark.range(3).selectExpr("id"), "t")
    eng.write_table_version(
        spark.range(3, 5).selectExpr("id", "id * 2 AS extra"), "t", mode="append"
    )
    merged = eng.table("t", merge_schema=True)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in merged.collect()}
    assert rows[0] is None and rows[4] == 8


def test_threaded_commit_expire_stress(spark, tmp_path_factory):
    """VERDICT r04 #8: REAL interleavings of append commits and GC.  Three
    writer threads append concurrently while a GC thread loops
    expire_versions(keep_last=3) with the default orphan grace; at the
    end every successfully committed row is present exactly once, every
    retained manifest's file set exists on disk, and no writer lost a
    staged file to the sweep (the expire/commit race ADVICE r04 fixed)."""
    import time as _time

    wh = str(tmp_path_factory.mktemp("stress_wh"))
    eng = Engine(spark, wh)
    eng.write_table_version(_df(spark, 0, 2), "t")
    path = eng._table_path("t")
    stop = threading.Event()
    committed: list[tuple[int, int]] = []
    errors: list[str] = []

    def writer(tid: int) -> None:
        for k in range(4):
            lo = 1000 * tid + 10 * k
            df = _df(spark, lo, lo + 3)
            for _attempt in range(10):
                try:
                    versioning.commit_version(
                        df, path, mode="append", max_retries=10
                    )
                    committed.append((lo, lo + 3))
                    break
                except TableNotFoundError:
                    # parent manifest expired between list and read: the
                    # caller-visible retry loop (Iceberg refresh-and-retry)
                    _time.sleep(0.05)
                except Exception as ex:  # pragma: no cover - diagnostic
                    errors.append(f"writer {tid}@{lo}: {ex!r}")
                    break
            else:
                errors.append(f"writer {tid} gave up at {lo}")

    def gc() -> None:
        while not stop.is_set():
            try:
                versioning.expire_versions(path, keep_last=3)
            except (FileNotFoundError, TableNotFoundError):
                pass  # racing deletes/commits; sweep again next tick
            _time.sleep(0.02)

    writers = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    g = threading.Thread(target=gc)
    g.start()
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    g.join()

    assert not errors, errors
    assert len(committed) == 12  # 3 writers x 4 appends all landed
    final = versioning.read_version(spark, path)
    ids = sorted(r.id for r in final.collect())
    want = sorted(
        [0, 1] + [i for lo, hi in committed for i in range(lo, hi)]
    )
    assert ids == want  # nothing lost, nothing duplicated
    # every retained manifest resolves to files that actually exist
    for v in versioning.list_versions(path):
        for f in versioning.read_manifest(path, v)["files"]:
            assert FS.exists(FS.join(path, f)), (v, f)


def test_expire_reclaims_superseded_adopted_files(eng, spark):
    """Adopted (root-level) files are GC'd like staged ones once only
    expired manifests reference them — adoption must not become a
    permanent storage leak."""
    eng.write_table(_df(spark, 0, 6), "t")  # plain table
    path = eng._table_path("t")
    versioning.adopt_plain_table(path)
    adopted = versioning.read_manifest(path, 1)["files"]
    assert all(not f.startswith("data/") for f in adopted)
    versioning.commit_version(_df(spark, 0, 2), path, mode="overwrite")

    stats = eng.expire_table_versions("t", keep_last=1)
    assert stats["versions_removed"] == 1
    for f in adopted:
        assert not FS.exists(FS.join(path, f)), f  # root files reclaimed
    assert eng.table("t").count() == 2  # current snapshot intact


def test_partitioned_versioned_commits_keep_partition_columns(eng, spark):
    """A partition_by commit's dir-encoded column must survive versioned
    reads (explicit file lists disable partition discovery — the grouped
    basePath read recovers it), across appends, time travel, and
    incremental reads."""
    from pyspark.sql import functions as F

    def mk(lo, hi):
        return spark.range(lo, hi).withColumn(
            "p", (F.col("id") % 2).cast("int")
        )

    eng.write_table_version(mk(0, 10), "t", partition_by=["p"])
    r1 = eng.read_version("t")
    assert sorted(r1.columns) == ["id", "p"]
    assert r1.filter(F.col("p") == 1).count() == 5  # values, not just schema

    eng.write_table_version(mk(10, 14), "t", mode="append", partition_by=["p"])
    r2 = eng.read_version("t")
    assert sorted(r2.columns) == ["id", "p"] and r2.count() == 14
    assert eng.read_version("t", 1).count() == 10  # time travel intact
    inc = eng.read_table_changes("t", from_version=1)
    assert sorted(inc.columns) == ["id", "p"] and inc.count() == 4

    # layout homogeneity: an UNPARTITIONED append onto the partitioned
    # chain is a typed refusal (a mixed file set cannot recover the
    # partition column consistently)
    from cubefs_hadoop_spark.errors import EngineIOError

    with pytest.raises(EngineIOError):
        eng.write_table_version(mk(20, 22), "t", mode="append")
    # overwrite replaces the file set wholesale: layout may change
    eng.write_table_version(mk(0, 3), "t")
    assert eng.read_version("t").count() == 3


def test_adopt_partitioned_plain_table_keeps_partition_columns(eng, spark):
    """adopt_plain_table over a Hive-partitioned plain table: the adopted
    root-level kv-dir files read back WITH their partition column."""
    from pyspark.sql import functions as F

    df = spark.range(8).withColumn("p", (F.col("id") % 2).cast("int"))
    eng.write_table(df, "t", partition_by=["p"])
    path = eng._table_path("t")
    versioning.adopt_plain_table(path)
    r = eng.read_version("t", 1)
    assert sorted(r.columns) == ["id", "p"]
    assert r.count() == 8 and r.filter(F.col("p") == 0).count() == 4


# -- merge-on-read delete tier (round 5) ------------------------------------


def test_mor_delete_is_metadata_only_and_scoped(eng, spark):
    """commit_delete hides matching rows with NO data rewrite; rows
    appended AFTER the delete are untouched even when they match
    (sequence-number scoping, the Iceberg v2 semantics)."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    path = eng._table_path("t")
    files_before = set(versioning.read_manifest(path, 1)["files"])

    eng.delete_from("t", "id < 3", strategy="mor")
    assert eng.table("t").count() == 7
    m2 = versioning.read_manifest(path, 2)
    assert set(m2["files"]) == files_before  # no rewrite, no new files
    assert m2["mode"] == "delete" and len(m2["deletes"]) == 1

    # post-delete append: ids 0..4 APPENDED now must all be visible —
    # the pending delete predicates only files older than itself
    eng.write_table_version(_df(spark, 0, 5), "t", mode="append")
    ids = sorted(r.id for r in eng.table("t").collect())
    assert ids == [0, 1, 2, 3, 3, 4, 4, 5, 6, 7, 8, 9]

    # time travel: the pre-delete snapshot still shows every row
    assert eng.read_version("t", 1).count() == 10
    # NULL-predicate rows are kept (three-valued logic)
    eng.delete_from("t", "CASE WHEN id = 5 THEN NULL ELSE id = 9 END",
                    strategy="mor")
    ids2 = sorted(r.id for r in eng.table("t").collect())
    assert 5 in ids2 and 9 not in ids2


def test_mor_delete_compaction_materializes(eng, spark):
    """compact_table applies pending MoR deletes physically and clears
    them; content identical before/after compaction."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.delete_from("t", "id % 2 = 0", strategy="mor")
    before = sorted(r.id for r in eng.table("t").collect())
    assert before == [1, 3, 5, 7, 9]

    eng.compact_table("t")
    path = eng._table_path("t")
    m = versioning.read_manifest(path, versioning.current_version(path))
    assert m["mode"] == "compact" and m["deletes"] == []
    assert sorted(r.id for r in eng.table("t").collect()) == before
    # post-compaction files physically lack the deleted rows
    raw = versioning._read_files(
        spark, path, m["files"], versioning._LOCAL
    )
    assert sorted(r.id for r in raw.collect()) == before


def test_mor_delete_rollback_resurrects_rows(eng, spark):
    """Rolling back to a pre-delete version restores its rows (the
    rollback manifest carries the target's delete state)."""
    eng.write_table_version(_df(spark, 0, 6), "t")
    eng.delete_from("t", "id >= 4", strategy="mor")
    assert eng.table("t").count() == 4
    eng.rollback_table("t", 1)
    assert eng.table("t").count() == 6


def test_mor_delete_refuses_unversioned_and_breaks_incremental(eng, spark):
    """MoR needs manifests; and read_table_changes refuses ranges whose
    pending deletes changed (rows vanished without file-set diffs)."""
    from cubefs_hadoop_spark.errors import EngineIOError

    eng.write_table(_df(spark, 0, 4), "t")  # plain table
    with pytest.raises(EngineIOError):
        eng.delete_from("t", "id = 0", strategy="mor")

    eng.write_table_version(_df(spark, 0, 6), "v")
    eng.write_table_version(_df(spark, 6, 8), "v", mode="append")
    eng.delete_from("v", "id = 0", strategy="mor")
    with pytest.raises(EngineIOError):
        eng.read_table_changes("v", from_version=1)
    # ranges not crossing the delete still work
    assert eng.read_table_changes("v", 1, 2).count() == 2


def test_mor_merge_upserts_without_rewrite(eng, spark):
    """merge_table(strategy='mor'): matched old rows vanish via the
    equality-delete key file, the batch's rows replace them, unmatched
    rows persist — all WITHOUT rewriting existing data files, and
    byte-identical in effect to the copy-on-write merge."""
    eng.write_table_version(_df(spark, 0, 6), "t")  # v=2*id
    path = eng._table_path("t")
    v1_files = set(versioning.read_manifest(path, 1)["files"])

    batch = spark.createDataFrame(
        [(2, 999), (3, 888), (10, 777)], "id long, v long"
    )
    eng.merge_table(batch, "t", on="id", strategy="mor")

    got = {r.id: r.v for r in eng.table("t").collect()}
    assert got == {0: 0, 1: 2, 2: 999, 3: 888, 4: 8, 5: 10, 10: 777}
    m2 = versioning.read_manifest(path, 2)
    assert v1_files <= set(m2["files"])  # old files still there, unrewritten
    assert m2["mode"] == "merge"
    d = m2["deletes"][0]
    assert d["eq_cols"] == ["id"] and d["eq_files"]

    # CoW twin on a copy produces the same table state
    eng.write_table_version(_df(spark, 0, 6), "u")
    eng.merge_table(batch, "u", on="id", strategy="cow")
    got_cow = {r.id: r.v for r in eng.table("u").collect()}
    assert got_cow == got

    # time travel unaffected; a second mor merge stacks correctly
    assert eng.read_version("t", 1).count() == 6
    eng.merge_table(
        spark.createDataFrame([(2, 111)], "id long, v long"),
        "t", on="id", strategy="mor",
    )
    got2 = {r.id: r.v for r in eng.table("t").collect()}
    assert got2[2] == 111 and got2[3] == 888 and len(got2) == 7


def test_mor_merge_key_files_survive_gc_until_compaction(eng, spark):
    """expire_versions must treat equality-delete key files as live
    (reaping them would break reads); after compact_table materializes,
    they become unreferenced and ARE reclaimed."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.merge_table(
        spark.createDataFrame([(1, 42)], "id long, v long"),
        "t", on="id", strategy="mor",
    )
    path = eng._table_path("t")
    kf = versioning.read_manifest(path, 2)["deletes"][0]["eq_files"]

    eng.expire_table_versions("t", keep_last=1, orphan_grace_ms=0)
    for f in kf:
        assert FS.exists(FS.join(path, f)), f  # key file still live
    got = {r.id: r.v for r in eng.table("t").collect()}
    assert got[1] == 42 and len(got) == 5

    eng.compact_table("t")
    eng.expire_table_versions("t", keep_last=1, orphan_grace_ms=0)
    for f in kf:
        assert not FS.exists(FS.join(path, f)), f  # now reclaimed
    assert {r.id: r.v for r in eng.table("t").collect()} == got


def test_threaded_append_optimize_gc_stress(spark, tmp_path_factory):
    """Late-round-5 torture: stats-carrying appends, a looping OPTIMIZE
    ZORDER (compact commits racing the appends via optimistic
    concurrency), and a GC thread — all interleaved.  Invariants at the
    end: every successful append's rows present exactly once, every
    retained manifest's stats keys are a subset of its files, and a
    predicate-pruned read equals the exact filter."""
    import time as _time

    wh = str(tmp_path_factory.mktemp("zstress_wh"))
    eng = Engine(spark, wh)
    versioning.commit_version(
        _df(spark, 0, 2), eng._table_path("t"), stats_cols=["id"]
    )
    path = eng._table_path("t")
    stop = threading.Event()
    committed: list[tuple[int, int]] = []
    errors: list[str] = []

    def writer(tid: int) -> None:
        for k in range(3):
            lo = 1000 * tid + 10 * k
            df = _df(spark, lo, lo + 3)
            for _attempt in range(10):
                try:
                    versioning.commit_version(
                        df,
                        path,
                        mode="append",
                        max_retries=10,
                        stats_cols=["id"],
                    )
                    committed.append((lo, lo + 3))
                    break
                except TableNotFoundError:
                    _time.sleep(0.05)
                except Exception as ex:  # pragma: no cover - diagnostic
                    errors.append(f"writer {tid}@{lo}: {ex!r}")
                    break
            else:
                errors.append(f"writer {tid} gave up at {lo}")

    def optimizer() -> None:
        while not stop.is_set():
            try:
                versioning.compact_version(
                    spark,
                    path,
                    target_file_bytes=1 << 12,
                    zorder_by=["id", "v"],
                    stats_cols=["id"],
                )
            except VersionConflictError:
                pass  # an append won the version: rewrite next lap
            except (FileNotFoundError, TableNotFoundError):
                pass
            _time.sleep(0.01)

    def gc() -> None:
        while not stop.is_set():
            try:
                versioning.expire_versions(path, keep_last=4)
            except (FileNotFoundError, TableNotFoundError):
                pass
            _time.sleep(0.03)

    writers = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    opt = threading.Thread(target=optimizer)
    g = threading.Thread(target=gc)
    opt.start()
    g.start()
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    opt.join()
    g.join()

    assert not errors, errors
    assert len(committed) == 6
    ids = sorted(
        r.id for r in versioning.read_version(spark, path).collect()
    )
    want = sorted(
        [0, 1] + [i for lo, hi in committed for i in range(lo, hi)]
    )
    assert ids == want
    m = versioning.read_manifest(path, versioning.current_version(path))
    assert set(m.get("stats", {})) <= set(m["files"])
    got = sorted(
        r.id
        for r in versioning.read_version(
            spark, path, predicates=[("id", "<", 100)]
        ).collect()
    )
    assert got == [i for i in want if i < 100]


def test_tags_pin_versions_and_survive_gc(eng, spark):
    """Tags: immutable named snapshots, readable by name, exempt from
    expire GC; delete_tag releases the pin."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.write_table_version(_df(spark, 0, 3), "t")
    eng.write_table_version(_df(spark, 0, 8), "t")
    eng.tag_table("t", "baseline", version=1)
    assert eng.table_tags("t") == {"baseline": 1}
    assert eng.read_version("t", "baseline").count() == 5
    with pytest.raises(Exception, match="immutable"):
        eng.tag_table("t", "baseline", version=2)
    path = eng._table_path("t")
    versioning.expire_versions(path, keep_last=1, fs=eng.fs)
    # tagged v1 survives alongside the latest; untagged v2 expired
    assert versioning.list_versions(path, eng.fs) == [1, 3]
    assert eng.read_version("t", "baseline").count() == 5
    assert eng.delete_table_tag("t", "baseline") is True
    versioning.expire_versions(path, keep_last=1, fs=eng.fs)
    assert versioning.list_versions(path, eng.fs) == [3]
    with pytest.raises(TableNotFoundError, match="tag"):
        eng.read_version("t", "baseline")


def test_write_time_expectations(eng, spark):
    """checks= refuses commits whose rows violate the contract, and a
    clean frame commits; Engine.expect reports per-check counts in one
    pass."""
    from cubefs_hadoop_spark.errors import EngineIOError

    bad = spark.range(0, 10).selectExpr(
        "id", "CASE WHEN id < 8 THEN id * 2 END AS v"
    )
    counts = eng.expect(bad, ["v IS NOT NULL", "id >= 0", "v < 10"])
    # violations: 2 NULL v rows; v in {10,12,14} plus the 2 NULLs fail v<10
    assert counts == {"v IS NOT NULL": 2, "id >= 0": 0, "v < 10": 5}
    with pytest.raises(EngineIOError, match="expectation violations"):
        eng.write_table_version(bad, "t", checks=["v IS NOT NULL"])
    assert not eng.table_exists("t")  # nothing staged into a version
    good = bad.filter("v IS NOT NULL")
    v = eng.write_table_version(good, "t", checks=["v IS NOT NULL"])
    assert v == 1 and eng.read_version("t").count() == 8


def test_sql_time_travel_by_tag(eng, spark):
    """Router: `t VERSION AS OF 'tag'` reads the tagged snapshot."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.write_table_version(_df(spark, 0, 2), "t")
    eng.tag_table("t", "baseline", version=1)
    n = eng.execute(
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'baseline'"
    ).first().n
    assert n == 5
    assert eng.execute("SELECT COUNT(*) AS n FROM t").first().n == 2


def test_sql_time_travel_by_hyphenated_tag(eng, spark):
    """Tag names allow hyphens ([\\w-]); the rewritten temp-view name
    must still be a valid SQL identifier (ADVICE r5)."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    eng.write_table_version(_df(spark, 0, 2), "t")
    eng.tag_table("t", "base-line", version=1)
    n = eng.execute(
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'base-line'"
    ).first().n
    assert n == 5
    # 'base_line' and 'base-line' are distinct tags -> distinct views
    eng.tag_table("t", "base_line", version=2)
    n2 = eng.execute(
        "SELECT COUNT(*) AS n FROM t VERSION AS OF 'base_line'"
    ).first().n
    assert n2 == 2


def test_timestamp_as_of_time_travel(eng, spark):
    """TIMESTAMP AS OF resolves the latest commit at-or-before the
    moment — python API and SQL rewrite."""
    import time as _time

    from cubefs_hadoop_spark import versioning

    eng.write_table_version(_df(spark, 0, 10), "t")
    path = eng._table_path("t")
    t1 = versioning.read_manifest(path, 1)["ts_ms"]
    _time.sleep(0.05)
    eng.write_table_version(_df(spark, 0, 25), "t")
    # a timestamp between the commits sees v1
    assert (
        eng.read_version("t", at_timestamp=t1).count() == 10
    )
    # epoch now sees v2
    now_ms = int(_time.time() * 1000) + 1000
    assert eng.read_version("t", at_timestamp=now_ms).count() == 25
    # SQL form (ISO string, UTC)
    import datetime

    iso = datetime.datetime.fromtimestamp(
        t1 / 1000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    n = eng.execute(
        f"SELECT COUNT(*) AS c FROM t TIMESTAMP AS OF '{iso}'"
    ).first().c
    assert n == 10
    # predating the first commit raises
    with pytest.raises(TableNotFoundError):
        eng.read_version("t", at_timestamp=1)


def test_restore_table_sql_verb(eng, spark):
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.write_table_version(_df(spark, 0, 3), "t")
    eng.execute("RESTORE TABLE t TO VERSION AS OF 1")
    assert eng.read_version("t").count() == 10
    # append-only: the bad version is still in history
    assert eng.read_version("t", 2).count() == 3


def test_append_type_conflict_refused(eng, spark):
    """Schema enforcement on append: same column, different type is
    unrecoverable (mixed parquet reads crash or null) -> refused loudly.
    Column add/remove stays allowed — that is the merge-schema path."""
    eng.write_table_version(_df(spark, 0, 5), "t")
    from cubefs_hadoop_spark.errors import EngineIOError

    with pytest.raises(EngineIOError, match="type conflict"):
        eng.write_table_version(
            spark.range(5, 8).selectExpr(
                "id", "CAST(id AS STRING) AS v"
            ),
            "t",
            mode="append",
        )
    # additive append still lands and reconciles through the merge read
    eng.write_table_version(
        spark.range(5, 8).selectExpr("id", "id * 2 AS v", "id AS extra"),
        "t",
        mode="append",
    )
    merged = versioning.read_version(
        spark, eng._table_path("t"), merge_schema=True
    )
    assert set(merged.columns) == {"id", "v", "extra"}
    assert merged.count() == 8


def test_clone_table_deep_at_version(eng, spark):
    """CLONE: independent deep copy of a snapshot — fresh history,
    properties carried, source history untouched."""
    eng.write_table_version(_df(spark, 0, 10), "t")
    eng.set_table_properties("t", {"cfs.stats.cols": "id"})
    eng.write_table_version(_df(spark, 0, 4), "t")
    eng.execute("CREATE TABLE t2 CLONE t VERSION AS OF 1")
    assert eng.read_version("t2").count() == 10
    assert eng.table_versions("t2") == [1]  # fresh history
    assert eng.table_properties("t2") == {"cfs.stats.cols": "id"}
    # clones are independent: dropping the source leaves the clone
    eng.drop_table("t")
    assert eng.read_version("t2").count() == 10
    from cubefs_hadoop_spark.errors import TableAlreadyExistsError

    eng.write_table_version(_df(spark, 0, 2), "t3")
    with pytest.raises(TableAlreadyExistsError):
        eng.clone_table("t3", "t2")


def test_clone_carries_layout_contract(eng, spark):
    """The clone's FIRST commit already has the source's partition dirs,
    stats tier and properties (r6 review fix) — not one rewrite later."""
    df = spark.range(40).selectExpr(
        "id", "CAST(id % 2 AS INT) AS p", "id * 2 AS v"
    )
    eng.write_table_version(
        df, "src", partition_by=["p"], stats_cols=["id"]
    )
    eng.set_table_properties("src", {"cfs.stats.cols": "id"})
    eng.clone_table("src", "dst")
    m = versioning.read_manifest(eng._table_path("dst"), 1)
    assert m["partition_by"] == ["p"]
    assert all("id" in st for st in m["stats"].values())
    assert eng.table_properties("dst") == {"cfs.stats.cols": "id"}
    assert eng.read_version("dst").filter("p = 1").count() == 20
