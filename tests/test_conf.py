"""cfspark.* config surface (SURVEY Appendix B): apply_conf mapping,
conf_report inventory, and the bcache cache tier."""

from __future__ import annotations

import pytest

from cubefs_hadoop_spark import conf as cconf
from cubefs_hadoop_spark.engine import Engine


def test_apply_conf_maps_keys(spark):
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    try:
        spark.conf.set("cfspark.block.size", str(64 << 20))
        spark.conf.set("cfspark.access.key", "AKTEST")
        spark.conf.set("cfspark.secret.key", "SKTEST")
        spark.conf.set("cfspark.min.read.buffersize", str(256 << 10))
        spark.conf.set("cfspark.min.buffersize", str(4 << 20))
        applied = cconf.apply_conf(spark)
        assert applied["cfspark.block.size"] == "spark.sql.files.maxPartitionBytes"
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(64 << 20)
        assert hconf.get("fs.s3a.access.key") == "AKTEST"
        assert hconf.get("fs.s3a.secret.key") == "SKTEST"
        assert hconf.get("io.file.buffer.size") == str(256 << 10)
        assert hconf.get("parquet.block.size") == str(4 << 20)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
        for k in ("cfspark.block.size", "cfspark.access.key",
                  "cfspark.secret.key", "cfspark.min.read.buffersize",
                  "cfspark.min.buffersize"):
            spark.conf.unset(k)


def test_conf_report_covers_inventory(spark):
    rep = cconf.conf_report(spark)
    # every Appendix-B key is inventoried with default + description
    for key in (
        "cfspark.warehouse.root", "cfspark.block.size", "cfspark.log.level",
        "cfspark.access.key", "cfspark.secret.key",
        "cfspark.min.read.buffersize", "cfspark.min.buffersize",
        "cfspark.enable.bcache", "cfspark.super.user.name",
        "cfspark.superuser.group", "cfspark.checkpoint.dir",
        "cfspark.reliable.barriers",
    ):
        assert key in rep and rep[key]["description"]
    assert rep["cfspark.block.size"]["default"] == str(128 << 20)


def test_bcache_tier(spark, tmp_warehouse):
    eng = Engine(spark, tmp_warehouse)
    eng.write_table(spark.range(10).selectExpr("id"), "t")

    # disabled (default): cache_table is a no-op pass-through
    df = eng.cache_table("t")
    assert not df.storageLevel.useMemory

    spark.conf.set("cfspark.enable.bcache", "true")
    try:
        cached = eng.cache_table("t")
        assert cached.storageLevel.useMemory
        assert eng.table("t") is cached  # reads served from the pinned handle
        assert cached.count() == 10

        # a write through the engine invalidates the tier
        eng.append(spark.range(5).selectExpr("id"), "t")
        fresh = eng.table("t")
        assert fresh is not cached
        assert fresh.count() == 15

        eng.cache_table("t")
        eng.uncache_table("t")
        assert not eng.table("t").storageLevel.useMemory
    finally:
        spark.conf.unset("cfspark.enable.bcache")
