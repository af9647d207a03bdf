"""Custom Python DataSource `cfsfiles` (sources/cfs_source.py): the
reference connector's list/stat/split/read contract as a Spark source."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubefs_hadoop_spark.sources import cfs_source


def _mkfiles(tmp_path, sizes: dict[str, int]) -> str:
    d = tmp_path / "files"
    d.mkdir()
    for name, size in sizes.items():
        (d / name).write_bytes(bytes(range(256)) * (size // 256) + b"x" * (size % 256))
    return str(d)


def test_listing_stat_and_content(spark, tmp_path):
    d = _mkfiles(tmp_path, {"a.bin": 100, "b.bin": 300})
    df = cfs_source.read_files(spark, d)
    rows = {r.name: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"].size == 100 and len(rows["a.bin"].content) == 100
    assert rows["b.bin"].mtime_ms > 0
    # content round-trips byte-exact through the executor read path
    assert bytes(rows["b.bin"].content) == bytes(range(256)) + b"x" * 44


def test_block_splits_parallelize_large_files(spark, tmp_path):
    """N15 analog: a file larger than blockSize yields one row (= one input
    partition) per stride, reassemblable by (path, block_start)."""
    d = _mkfiles(tmp_path, {"big.bin": 1000})
    df = cfs_source.read_files(spark, d, block_size=256)
    rows = sorted(df.collect(), key=lambda r: r.block_start)
    assert [r.block_start for r in rows] == [0, 256, 512, 768]
    assert [r.block_len for r in rows] == [256, 256, 256, 232]
    whole = b"".join(bytes(r.content) for r in rows)
    assert len(whole) == 1000
    assert whole == (tmp_path / "files" / "big.bin").read_bytes()


def test_source_composes_with_sql(spark, tmp_path):
    """The source is a real DataFrame relation: filters/aggregates over the
    StatInfo columns run in Spark like any other source."""
    d = _mkfiles(tmp_path, {"s.bin": 10, "m.bin": 200, "l.bin": 400})
    df = cfs_source.read_files(spark, d)
    agg = (
        df.filter(F.col("size") >= 100)
        .agg(F.count("*").alias("n"), F.sum("size").alias("bytes"))
        .first()
    )
    assert agg.n == 2 and agg.bytes == 600
    # hidden/marker files are skipped like the warehouse listing
    (tmp_path / "files" / "_SUCCESS").write_bytes(b"")
    (tmp_path / "files" / ".crc").write_bytes(b"zz")
    assert cfs_source.read_files(spark, d).count() == 3
