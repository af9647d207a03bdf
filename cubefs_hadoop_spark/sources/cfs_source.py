"""`cfsfiles` — a custom Python DataSource re-expressing the reference
connector's contract as a first-class Spark source.

The reference (io.cubefs.CubefsFileSystem) gives a host engine four things:
directory listing (N12 listStatus), per-file metadata (N13 getFileStatus /
StatInfo), split planning (N15 getFileBlockLocations: one synthetic split
per 128 MiB stride), and positional byte reads (N3/N4/N5).  This source
implements exactly that surface through Spark 4's Python DataSource API:

    spark.dataSource.register(CfsFilesDataSource)
    df = (spark.read.format("cfsfiles")
          .option("path", "/data/dir")
          .option("blockSize", 128 << 20)   # reference default, :97
          .load())
    # one row per (file x 128 MiB block):
    # path, name, size, mtime_ms, block_start, block_len, content

Schema mirrors the StatInfo fields the connector surfaces (size, ms-epoch
mtime — CubefsFileSystem.java:388-391) plus the block geometry that N15
fabricates.  Each InputPartition is one block, so Spark parallelizes per
128 MiB exactly as host engines do over the reference's synthetic
BlockLocations; the executor-side read seeks to block_start and reads
block_len bytes (the N5 seek + N4 buffered-read path).

This is the faithful "connector in Spark" demonstration; for real tables
use the parquet warehouse (Engine) — this source is for opaque byte
payloads (multimodal columns X06) and connector parity.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_BLOCK_SIZE = 128 << 20  # CubefsFileSystem.java:97


class _FileBlock(InputPartition):
    def __init__(self, path: str, size: int, mtime_ms: int, start: int, length: int):
        self.path = path
        self.size = size
        self.mtime_ms = mtime_ms
        self.start = start
        self.length = length


class CfsFilesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("cfsfiles: option 'path' is required")
        self.block_size = int(options.get("blocksize", DEFAULT_BLOCK_SIZE))
        self.recursive = options.get("recursive", "true").lower() == "true"

    # -- N12 listStatus + N13 getFileStatus + N15 split planning (driver) --
    def partitions(self) -> list[_FileBlock]:
        blocks: list[_FileBlock] = []
        for dirpath, _dirs, files in os.walk(self.root):
            for f in sorted(files):
                if f.startswith((".", "_")):
                    continue
                fp = os.path.join(dirpath, f)
                st = os.stat(fp)
                size, mtime_ms = st.st_size, int(st.st_mtime * 1000)
                # one split per blockSize stride covering [0, size)
                # (empty file still yields one empty split)
                start = 0
                while True:
                    length = min(self.block_size, size - start)
                    blocks.append(_FileBlock(fp, size, mtime_ms, start, length))
                    start += self.block_size
                    if start >= size:
                        break
            if not self.recursive:
                break
        return blocks

    # -- N3 open + N5 seek + N4 read (executor) ----------------------------
    def read(self, partition: _FileBlock) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            content = fh.read(partition.length)
        yield (
            partition.path,
            os.path.basename(partition.path),
            partition.size,
            partition.mtime_ms,
            partition.start,
            partition.length,
            content,
        )


class CfsFilesStreamReader(SimpleDataSourceStreamReader):
    """File-arrival micro-batch stream: the offset is the set of file names
    already emitted (exactly how host engines tail a landing directory on
    the reference's listStatus contract).  Each batch emits whole files that
    appeared since the last offset; replays between offsets are
    deterministic, so checkpoint recovery re-reads the same files."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("cfsfiles: option 'path' is required")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _listing(self) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(self.root):
            for f in sorted(files):
                if not f.startswith((".", "_")):
                    out.append(os.path.join(dirpath, f))
        return sorted(out)

    def _rows(self, paths: list[str]) -> list[tuple]:
        # a LIST, not a generator: the simple-reader API pickles the batch
        # for prefetch/replay caching
        out = []
        for fp in paths:
            st = os.stat(fp)
            with open(fp, "rb") as fh:
                content = fh.read()
            out.append(
                (
                    fp,
                    os.path.basename(fp),
                    st.st_size,
                    int(st.st_mtime * 1000),
                    0,
                    st.st_size,
                    content,
                )
            )
        return out

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        now = self._listing()
        new = [p for p in now if p not in seen]
        return self._rows(new), {"seen": now}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        seen = set(start.get("seen", []))
        return self._rows([p for p in end.get("seen", []) if p not in seen])


class CfsFilesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cfsfiles"

    def schema(self) -> str:
        return (
            "path string, name string, size bigint, mtime_ms bigint, "
            "block_start bigint, block_len bigint, content binary"
        )

    def reader(self, schema) -> CfsFilesReader:
        return CfsFilesReader(self.options)

    def simpleStreamReader(self, schema) -> CfsFilesStreamReader:
        return CfsFilesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CfsFilesDataSource)


def read_files(spark, path: str, block_size: int = DEFAULT_BLOCK_SIZE):
    """Convenience: register + load in one call."""
    register(spark)
    return (
        spark.read.format("cfsfiles")
        .option("path", path)
        .option("blockSize", block_size)
        .load()
    )
