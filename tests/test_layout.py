"""Layout maintenance (plans/layout.py): compaction, range clustering, and
z-order — asserted against parquet footer stats, the same metadata the
scan's row-group skipping reads."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.plans import layout
from tests.conftest import SF_SMOKE


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "frag")
    # fragment: 40 tiny files
    load(spark, SF_SMOKE, "orders").repartition(40).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 40
    dst = str(tmp_path / "compact")
    layout.compact(spark.read.parquet(src), dst, target_file_bytes=64 << 20)
    files = glob.glob(dst + "/*.parquet")
    assert len(files) == 1  # sf0.001 orders << 64 MiB
    assert spark.read.parquet(dst).count() == load(
        spark, SF_SMOKE, "orders"
    ).count()


def test_cluster_by_gives_disjoint_rowgroup_ranges(spark, tmp_path):
    rnd = str(tmp_path / "random")
    srt = str(tmp_path / "clustered")
    orders = load(spark, SF_SMOKE, "orders")
    orders.repartition(8).write.parquet(rnd)  # round-robin: full overlap
    layout.cluster_by(orders, srt, ["o_orderkey"], n_files=8)

    lo, hi = 100, 200  # narrow key band
    f_rnd = layout.overlap_fraction(
        layout.rowgroup_ranges(rnd, "o_orderkey"), lo, hi
    )
    f_srt = layout.overlap_fraction(
        layout.rowgroup_ranges(srt, "o_orderkey"), lo, hi
    )
    assert f_rnd == 1.0  # every random file spans the whole key space
    assert f_srt <= 0.25  # clustered: at most 2 of 8 files touched


def test_zorder_skips_in_both_dimensions(spark, tmp_path):
    rnd = str(tmp_path / "rand2")
    zrd = str(tmp_path / "zord")
    df = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df.repartition(8).write.parquet(rnd)
    layout.cluster_by_zorder(df, zrd, "o_orderkey", "o_custkey", n_files=8)

    k_lo, k_hi = 0, 120
    c_lo, c_hi = 0, 40
    for col, lo, hi in (
        ("o_orderkey", k_lo, k_hi),
        ("o_custkey", c_lo, c_hi),
    ):
        f_rnd = layout.overlap_fraction(layout.rowgroup_ranges(rnd, col), lo, hi)
        f_z = layout.overlap_fraction(layout.rowgroup_ranges(zrd, col), lo, hi)
        assert f_rnd == 1.0
        assert f_z < 1.0, col  # z-order narrows BOTH dimensions
    # single-column sort would fail this for the second column
    assert spark.read.parquet(zrd).count() == df.count()


def test_zorder_key_locality():
    """Interleaved key: nearby (a, b) points get nearby keys; distant b
    with equal a does not collapse to adjacent keys (unlike concat sort)."""
    from pyspark.sql import Row, SparkSession

    spark = SparkSession.getActiveSession()
    rows = [Row(a=a, b=b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows).withColumn(
        "z", layout.zorder_key(F.col("a"), F.col("b"), bits=2)
    )
    z = {(r.a, r.b): r.z for r in df.collect()}
    assert z[(0, 0)] == 0
    assert z[(1, 0)] == 1  # a bit 0 -> weight 1
    assert z[(0, 1)] == 2  # b bit 0 -> weight 2
    assert z[(3, 3)] == 15
    assert len(set(z.values())) == 16  # bijective on the 4x4 grid


def test_engine_compact_table_atomic_swap(spark, tmp_path):
    from cubefs_hadoop_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    orders = load(spark, SF_SMOKE, "orders").repartition(25)
    eng.write_table(orders, "orders")
    before = eng.table_stats("orders")
    assert before["files"] == 25
    eng.compact_table("orders")
    after = eng.table_stats("orders")
    assert after["files"] == 1
    assert after["rows"] == before["rows"]
    assert not os.path.exists(
        os.path.join(str(tmp_path / "wh"), "default", "orders.__compacting")
    )


def test_vacuum_removes_orphans(spark, tmp_path):
    from cubefs_hadoop_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.write_table(load(spark, SF_SMOKE, "nation"), "nation")
    db = os.path.join(str(tmp_path / "wh"), "default")
    os.makedirs(os.path.join(db, "nation.__compacting"))
    os.makedirs(os.path.join(db, "nation.__old"))  # completed swap: garbage
    os.makedirs(os.path.join(db, "old_t.__old"))  # interrupted swap: restore
    os.makedirs(os.path.join(db, "nation", "_temporary", "0"))
    removed = eng.vacuum()
    assert sorted(removed) == [
        "nation.__compacting",
        "nation.__old",
        "nation/_temporary",
        "old_t.__old -> restored old_t",
    ]
    assert eng.list_tables() == ["nation", "old_t"]
    assert eng.table("nation").count() > 0
    assert eng.vacuum() == []


def test_zorder_key_n_matches_two_col_form():
    """N-column weave reduces to the classic a0 b0 a1 b1 layout at N=2,
    and is bijective on a 3-column grid."""
    from pyspark.sql import Row, SparkSession

    spark = SparkSession.getActiveSession()
    rows = [Row(a=a, b=b) for a in range(4) for b in range(4)]
    df = (
        spark.createDataFrame(rows)
        .withColumn("z2", layout.zorder_key(F.col("a"), F.col("b"), bits=2))
        .withColumn(
            "zn", layout.zorder_key_n([F.col("a"), F.col("b")], bits=2)
        )
    )
    assert all(r.z2 == r.zn for r in df.collect())

    rows3 = [Row(a=a, b=b, c=c) for a in range(4) for b in range(4) for c in range(4)]
    df3 = spark.createDataFrame(rows3).withColumn(
        "z", layout.zorder_key_n([F.col("a"), F.col("b"), F.col("c")], bits=2)
    )
    zs = [r.z for r in df3.collect()]
    assert len(set(zs)) == 64  # bijective on the 4x4x4 grid
    assert min(zs) == 0 and max(zs) == 63

    with pytest.raises(ValueError):
        layout.zorder_key_n([F.col("a")] * 8, bits=8)  # 64 bits > signed long


def test_zorder_three_columns_skips_all_dimensions(spark, tmp_path):
    rnd = str(tmp_path / "rand3")
    zrd = str(tmp_path / "zord3")
    df = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df.repartition(8).write.parquet(rnd)
    layout.cluster_by_zorder(
        df, zrd, "o_orderkey", "o_custkey", "o_totalprice", n_files=8
    )
    bounds = df.selectExpr(
        "min(o_totalprice) AS lo", "max(o_totalprice) AS hi"
    ).first()
    p_span = (bounds.lo, bounds.lo + (bounds.hi - bounds.lo) / 4)
    for col, lo, hi in (
        ("o_orderkey", 0, 120),
        ("o_custkey", 0, 40),
        ("o_totalprice", *p_span),
    ):
        f_rnd = layout.overlap_fraction(layout.rowgroup_ranges(rnd, col), lo, hi)
        f_z = layout.overlap_fraction(layout.rowgroup_ranges(zrd, col), lo, hi)
        assert f_rnd == 1.0
        assert f_z < 1.0, col  # narrowed in ALL THREE dimensions
    assert spark.read.parquet(zrd).count() == df.count()
