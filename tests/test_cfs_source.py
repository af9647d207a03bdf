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


def test_streaming_file_arrival(spark, tmp_path):
    """simpleStreamReader: files landed between micro-batches arrive as new
    rows; the offset (seen-file set) makes replay deterministic."""
    d = tmp_path / "landing"
    d.mkdir()
    (d / "f0.bin").write_bytes(b"one")
    cfs_source.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    sdf = spark.readStream.format("cfsfiles").option("path", str(d)).load()
    q = (
        sdf.select("name", "size")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {r.name for r in spark.read.parquet(out).collect()} == {"f0.bin"}

    # second arrival: only the new file lands in the next run
    (d / "f1.bin").write_bytes(b"two-two")
    q = (
        spark.readStream.format("cfsfiles").option("path", str(d)).load()
        .select("name", "size")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert sorted(r.name for r in rows) == ["f0.bin", "f1.bin"]
    assert {r.name: r.size for r in rows}["f1.bin"] == 7
