"""Tests for multi-format sources/sinks, bucketed joins, and skew salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubefs_hadoop_spark.errors import EngineIOError
from cubefs_hadoop_spark.plans.bucketing import (
    read_bucketed_table,
    write_bucketed_table,
)
from cubefs_hadoop_spark.plans.skew import salted_join
from cubefs_hadoop_spark.sources.formats import read_any, write_any
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF_SMOKE}/nation.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_roundtrip(spark, nation, tmp_path, fmt):
    """N6/N3 analog in every sink format: write, read back, same content.
    (CSV/JSON lose type nuance, so the read supplies the schema.)"""
    path = str(tmp_path / fmt)
    write_any(nation, path, fmt=fmt)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    back = read_any(
        spark, path, fmt=fmt, schema=schema if fmt in ("csv", "json") else None
    )
    assert back.count() == 25
    assert {r.n_name for r in back.collect()} == {
        r.n_name for r in nation.collect()
    }


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(EngineIOError, match="schema"):
        read_any(spark, str(tmp_path), fmt="csv")


def test_unknown_format_rejected(spark, nation, tmp_path):
    with pytest.raises(EngineIOError, match="unsupported"):
        write_any(nation, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(EngineIOError, match="unsupported"):
        read_any(spark, str(tmp_path), fmt="sequence")


def test_binaryfile_read(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01\x02")
    df = read_any(spark, str(tmp_path), fmt="binaryFile")
    row = df.first()
    assert row.length == 3 and bytes(row.content) == b"\x00\x01\x02"


def test_bucketed_join_has_no_exchange(spark):
    """Two same-bucketed tables must sort-merge join with ZERO Exchange —
    the co-located join the reference's storage layer cannot offer."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", "o_orderkey", 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    # force sort-merge (tiny tables would auto-broadcast, which trivially
    # avoids shuffles and proves nothing about bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed_table(spark, "b_orders")
        b = read_bucketed_table(spark, "b_lineitem")
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        expect = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_salted_join_matches_plain_join(spark):
    """Salting must be semantics-preserving, including under a pathological
    hot key (90% of the large side on one key)."""
    large = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    plain = large.join(small, "k").select("k", "payload", "v")
    salted = salted_join(large, small, "k", salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left(spark):
    large = spark.range(0, 100).select((F.col("id") % 5).alias("k"), "id")
    small = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(large, small, "k", salt=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("v").isNull()).count() == 40  # k in {3,4}


def test_compression_codecs_roundtrip(spark, tmp_path):
    """Compression is a first-class 100 TB knob: parquet zstd/snappy/gzip
    and csv gzip all round-trip bit-identical values, and the codec is
    visible in the part-file names (prove it actually applied)."""
    import os

    from cubefs_hadoop_spark.sources.formats import read_any, write_any

    df = spark.range(1000).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
    rows = sorted(map(tuple, df.collect()))
    for fmt, codec, marker in [
        ("parquet", "zstd", ".zstd."),
        ("parquet", "snappy", ".snappy."),
        ("parquet", "gzip", ".gz."),
        ("csv", "gzip", ".csv.gz"),
    ]:
        out = str(tmp_path / f"t_{fmt}_{codec}")
        write_any(df, out, fmt=fmt, compression=codec)
        names = [f for f in os.listdir(out) if f.startswith("part-")]
        assert names and all(marker in n for n in names), (codec, names)
        back = read_any(
            spark, out, fmt=fmt, schema="id bigint, v bigint, s string"
        )
        assert sorted(map(tuple, back.collect())) == rows
