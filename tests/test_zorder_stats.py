"""Z-order layout (plans/zorder.py) + manifest file-skipping stats
(versioning.py stats_cols/predicates/optimize_table): the 100 TB
scan-pruning mechanism, end to end."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cubefs_hadoop_spark import versioning
from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.engine import Engine
from cubefs_hadoop_spark.plans.zorder import with_zorder_key, zorder_layout
from tests.conftest import SF_SMOKE


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_zorder_key_locality(spark):
    """Chunking the Z-sorted order into 8 runs must give tighter
    per-chunk n_chars ranges than chunking a doc_id sort — the
    NON-leading dimension is where a linear sort gives pruning nothing
    (every chunk spans the full range) and the curve must beat it."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")

    def chars_span(rows, k=8):
        n = len(rows)
        total = 0
        for i in range(k):
            part = rows[i * n // k : (i + 1) * n // k]
            chars = [r.n_chars for r in part]
            total += max(chars) - min(chars)
        return total

    z = with_zorder_key(docs, ["doc_id", "n_chars"]).orderBy("zkey").collect()
    linear = docs.orderBy("doc_id").collect()
    assert chars_span(z) < 0.8 * chars_span(linear)


def test_stats_recorded_and_pruned_scan_exact(spark, tmp_path):
    """Commit with stats_cols -> per-file [min, max] in the manifest;
    a predicate scan prunes files AND returns exactly the full-filter
    rows.  Range layout makes per-file doc_id ranges disjoint, so a
    narrow doc_id predicate must drop most files."""
    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    path = str(tmp_path / "t")
    versioning.commit_version(
        docs.repartitionByRange(8, "doc_id"),
        path,
        stats_cols=["doc_id", "n_chars"],
    )
    m = versioning.read_manifest(path, 1)
    assert len(m["files"]) == 8
    assert set(m["stats"]) == set(m["files"])
    for st in m["stats"].values():
        assert set(st) == {"doc_id", "n_chars"}
        assert st["doc_id"][0] <= st["doc_id"][1]

    preds = [("doc_id", ">=", 100), ("doc_id", "<", 150)]
    assert len(versioning.prune_files(m, preds)) < len(m["files"])
    got = versioning.read_version(spark, path, predicates=preds).collect()
    want = (
        versioning.read_version(spark, path)
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_unstatted_files_never_pruned(spark, tmp_path):
    """Appends without stats stay conservative: their files survive every
    prune, and predicate reads stay exact across the mixed set."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "t")
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)
    versioning.commit_version(
        lo.repartitionByRange(4, "doc_id"), path, stats_cols=["doc_id"]
    )
    versioning.commit_version(hi.coalesce(2), path, mode="append")  # no stats
    m = versioning.read_manifest(path, 2)
    statted = set(m["stats"])
    pruned = versioning.prune_files(m, [("doc_id", "<", 10)])
    # every un-statted file kept; at least one statted file dropped
    assert set(m["files"]) - statted <= set(pruned)
    assert len(pruned) < len(m["files"])
    got = versioning.read_version(
        spark, path, predicates=[("doc_id", "<", 10)]
    ).collect()
    assert sorted(r.doc_id for r in got) == list(range(10))


def test_optimize_zorder_prunes_both_dims(eng, spark):
    """The OPTIMIZE ZORDER story end to end: after optimize_table, a
    selective predicate on EITHER clustered column prunes files; a
    doc_id-linear layout prunes only the leading column.  Content is
    byte-identical across the rewrite."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    eng.write_table_version(
        docs.repartitionByRange(8, "doc_id"), "t", stats_cols=["n_chars"]
    )
    m1 = versioning.read_manifest(eng._table_path("t"), 1, eng.fs)
    # doc_id-sorted layout: n_chars ranges per file are wide -> a narrow
    # n_chars predicate prunes nothing
    chars_pred = [("n_chars", ">=", 100), ("n_chars", "<", 120)]
    kept_linear = versioning.prune_files(m1, chars_pred)
    assert len(kept_linear) == len(m1["files"])

    v = eng.optimize_table(
        "t", zorder_by=["doc_id", "n_chars"], target_file_bytes=1 << 10
    )
    m2 = versioning.read_manifest(eng._table_path("t"), v, eng.fs)
    assert m2["mode"] == "compact"
    kept_z_chars = versioning.prune_files(m2, chars_pred)
    kept_z_ids = versioning.prune_files(
        m2, [("doc_id", ">=", 100), ("doc_id", "<", 150)]
    )
    assert len(kept_z_chars) < len(m2["files"])
    assert len(kept_z_ids) < len(m2["files"])
    # rewrite preserved content exactly
    a = sorted(map(tuple, eng.read_version("t", 1).collect()))
    b = sorted(map(tuple, eng.read_version("t", v).collect()))
    assert a == b
    # engine-surface pruned read matches the exact filter
    got = eng.read_version("t", predicates=chars_pred).collect()
    want = [
        r
        for r in docs.collect()
        if 100 <= r.n_chars < 120
    ]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stats_survive_mor_delete_and_rollback(spark, tmp_path):
    """Stats ride through merge-on-read deletes and rollback commits, and
    predicate reads stay exact with pending deletes applied."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "t")
    versioning.commit_version(
        docs.repartitionByRange(6, "doc_id"), path, stats_cols=["doc_id"]
    )
    versioning.commit_delete(path, "doc_id % 2 = 0")
    m = versioning.read_manifest(path, 2)
    assert "stats" in m
    got = versioning.read_version(
        spark, path, predicates=[("doc_id", "<", 20)]
    ).collect()
    assert sorted(r.doc_id for r in got) == [i for i in range(20) if i % 2]
    versioning.rollback(path, 1)
    m3 = versioning.read_manifest(path, 3)
    assert "stats" in m3
    got = versioning.read_version(
        spark, path, predicates=[("doc_id", "<", 5)]
    ).collect()
    assert sorted(r.doc_id for r in got) == [0, 1, 2, 3, 4]


def test_stats_cols_on_partition_column_refused(spark, tmp_path):
    """stats_cols naming a dir-encoded partition column fails loudly at
    commit (partition columns are path-prunable, not stats-prunable)."""
    import pytest as _pytest

    from cubefs_hadoop_spark.errors import EngineIOError

    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    with _pytest.raises(EngineIOError, match="path-prunable"):
        versioning.commit_version(
            docs,
            str(tmp_path / "t"),
            partition_by=["lang"],
            stats_cols=["lang"],
        )


def test_prune_type_mismatch_is_conservative(spark, tmp_path):
    """A predicate whose value cannot compare against the stored bounds
    (str vs int) keeps every file and the exact filter still runs."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    path = str(tmp_path / "t")
    versioning.commit_version(
        docs.repartitionByRange(4, "doc_id"), path, stats_cols=["doc_id"]
    )
    m = versioning.read_manifest(path, 1)
    kept = versioning.prune_files(m, [("doc_id", "<", "not-a-number")])
    assert kept == m["files"]


def test_prune_timestamp_predicates(spark, tmp_path):
    """Timestamp stats serialize as ISO strings (ISO order == time
    order); datetime predicate values normalize the same way, so pruning
    and the exact filter agree."""
    import datetime

    ev = load(spark, SF_SMOKE, "events").select("event_id", "ts")
    path = str(tmp_path / "t")
    versioning.commit_version(
        ev.repartitionByRange(6, "ts"), path, stats_cols=["ts"]
    )
    m = versioning.read_manifest(path, 1)
    cut = datetime.datetime(2024, 1, 1, 12, 0, 0)
    kept = versioning.prune_files(m, [("ts", "<", cut)])
    assert 0 < len(kept) < len(m["files"])
    got = versioning.read_version(
        spark, path, predicates=[("ts", "<", cut)]
    ).count()
    assert got == ev.filter(F.col("ts") < F.lit(cut)).count()


def test_stats_union_across_compact_then_append(spark, tmp_path):
    """Mixed manifests: appends landing AFTER an OPTIMIZE carry their own
    stats and union with the compact files' stats — pruning stays exact
    across both generations of files."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "t")
    lo = docs.filter("doc_id < 400")
    late = docs.filter("doc_id >= 400")
    versioning.commit_version(
        lo.repartitionByRange(4, "doc_id"), path, stats_cols=["doc_id"]
    )
    versioning.compact_version(
        spark,
        path,
        target_file_bytes=1 << 10,
        zorder_by=["doc_id", "n_chars"],
        stats_cols=["doc_id"],
    )
    versioning.commit_version(
        late.repartitionByRange(2, "doc_id"),
        path,
        mode="append",
        stats_cols=["doc_id"],
    )
    m = versioning.read_manifest(path, 3)
    assert set(m["stats"]) == set(m["files"])  # both generations statted
    # a predicate inside the compact generation prunes the late appends
    kept = versioning.prune_files(m, [("doc_id", "<", 100)])
    assert len(kept) < len(m["files"])
    got = versioning.read_version(
        spark, path, predicates=[("doc_id", "<", 100)]
    ).count()
    assert got == 100
    # and one inside the append generation prunes the compact files
    kept_hi = versioning.prune_files(m, [("doc_id", ">=", 450)])
    assert len(kept_hi) < len(m["files"])
    got_hi = versioning.read_version(
        spark, path, predicates=[("doc_id", ">=", 450)]
    ).count()
    assert got_hi == 50


def test_footer_stats_match_scan_and_cover_types(spark, tmp_path):
    """Commit-time stats for numeric/date/timestamp columns harvest from
    parquet footers (metadata-only); string columns fall back to the
    exact scan.  Both paths must record identical manifest values
    (VERDICT r05 #5)."""
    df = spark.sql(
        """SELECT id,
                  CAST(id * 1.5 AS DOUBLE) AS score,
                  DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS d,
                  TIMESTAMP'2024-06-01 00:00:00' + MAKE_INTERVAL(0,0,0,0,0,0,id) AS ts,
                  CONCAT('name-', LPAD(CAST(id AS STRING), 4, '0')) AS s
           FROM RANGE(0, 200)"""
    )
    path = str(tmp_path / "t")
    cols = ["id", "score", "d", "ts", "s"]
    versioning.commit_version(
        df.repartitionByRange(4, "id"), path, stats_cols=cols
    )
    m = versioning.read_manifest(path, 1)
    stats = m["stats"]
    assert len(stats) == 4
    # footer split: numeric/date/timestamp are footer-harvestable; the
    # string column must have come from the scan fallback
    _, fb = versioning._footer_stats(
        path, m["files"], cols, versioning._fs(None)
    )
    assert "s" in fb and "id" not in fb and "score" not in fb
    # whatever the source, the recorded bounds are the exact per-file
    # min/max (cross-checked by a fresh scan)
    rows = (
        spark.read.parquet(*(f"{path}/{f}" for f in m["files"]))
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("id"), F.max("id"), F.min("score"), F.max("score"),
            F.min("d"), F.max("d"), F.min("ts"), F.max("ts"),
            F.min("s"), F.max("s"),
        )
        .collect()
    )
    for r in rows:
        rel = r["f"][r["f"].find("/data/") + 1 :]
        st = stats[rel]
        assert st["id"] == [r["min(id)"], r["max(id)"]]
        assert st["score"] == [r["min(score)"], r["max(score)"]]
        assert st["d"] == [
            r["min(d)"].isoformat(), r["max(d)"].isoformat()
        ]
        assert st["ts"] == [
            r["min(ts)"].isoformat(sep=" "),
            r["max(ts)"].isoformat(sep=" "),
        ]
        assert st["s"] == [r["min(s)"], r["max(s)"]]
    # and the stats actually prune
    kept = versioning.prune_files(m, [("id", "<", 50)])
    assert 0 < len(kept) < 4
    kept = versioning.prune_files(m, [("ts", ">", "2024-06-01 00:02:30")])
    assert 0 < len(kept) < 4
