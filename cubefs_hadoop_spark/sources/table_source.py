"""`cfstable` — versioned tables as a first-class Spark source with
FILTER PUSHDOWN into manifest file skipping.

``Engine.read_version(predicates=...)`` prunes files when the caller
hands predicates over explicitly; this source closes the loop for plain
SQL: a ``WHERE`` on a ``cfstable`` scan reaches ``pushFilters`` during
planning, the reader prunes the manifest file list against the per-file
[min, max] stats (versioning.prune_files) BEFORE partitions are planned,
and Spark sees only the surviving files as input partitions.

    spark.dataSource.register(CfsTableDataSource)
    df = (spark.read.format("cfstable")
          .option("path", "/warehouse/db/t")
          .option("version", 3)              # optional time travel
          .load())
    df.filter("doc_id < 10")                  # -> file-skipped scan
    df.write.format("cfstable").option("path", p).mode("append").save()
    # ^ exactly-once write: tasks stage parquet via pyarrow, the driver
    #   publishes only successful tasks' files through the optimistic
    #   manifest commit (versioning.commit_staged_files)

Pushdown contract: every filter is RETURNED to Spark (stats pruning is
file-level, not row-level truth), so correctness never depends on the
stats; supported comparisons additionally become a pyarrow dataset
filter executor-side, which prunes row groups via parquet footer stats
and drops non-matching rows before the Arrow batches cross into the JVM.

At 100 TB the partitions() listing is manifest-metadata work (file count,
not data), each surviving file is one InputPartition, and the read path
is pyarrow's C++ parquet reader yielding Arrow batches — no Python
row-at-a-time loop anywhere.

Scope: local/posix table paths (the LocalFS warehouse tier); tables with
pending merge-on-read deletes are refused (``compact_table`` first —
applying sequence-scoped anti-joins is the Engine read path's job).
Schema-EVOLVED tables (ALTER add/rename/drop) are fully supported: each
file generation is conformed through the manifest's op chain
(versioning.file_column_map) executor-side — renamed columns are read
under their old physical names, post-alter additions materialize as
typed nulls, drops are column-pruned at the scan.
Hive-partitioned layouts are supported: dir-encoded columns are parsed
from the path, attached as constant Arrow arrays, and predicates on them
prune files straight from the path encoding (no stats needed).
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _translate(f) -> tuple | None:
    """A pushed Filter -> (col, op, value) prune predicate, or None if
    the shape is unsupported (multi-part column path, unknown class)."""
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    op = ops.get(type(f))
    if op is None or len(f.attribute) != 1:
        return None
    from cubefs_hadoop_spark.versioning import _stat_json

    return (f.attribute[0], op, _stat_json(f.value))


class _TableFile(InputPartition):
    def __init__(self, path: str, parts: dict | None = None):
        self.path = path
        self.parts = parts or {}  # dir-encoded partition column values


def _path_partitions(rel: str) -> dict:
    """Hive-style ``key=value`` dir segments of a table-relative path ->
    {col: raw string value} (un-escaped; __HIVE_DEFAULT_PARTITION__ ->
    None)."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in rel.split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            v = unquote(v)
            out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
    return out


def _parse_part_value(raw: str | None, spark_type):
    """A dir-encoded partition value string -> a Python value of the
    column's declared type."""
    import datetime

    from pyspark.sql import types as T

    if raw is None:
        return None
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType,
                               T.LongType)):
        return int(raw)
    if isinstance(spark_type, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(spark_type, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(spark_type, T.DateType):
        return datetime.date.fromisoformat(raw)
    return raw


def _iso_to_ms(ts: str) -> int:
    from cubefs_hadoop_spark import versioning

    return versioning.ts_to_ms(ts)


class CfsTableReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cfstable: option 'path' is required")
        v = options.get("version")
        ts = options.get("timestamp")
        self.branch = options.get("branch")
        if ts is not None and self.branch is not None:
            # the timestamp resolves on the MAIN chain; reading that
            # version number from a branch chain would be a different
            # snapshot entirely (same refusal as Engine.read_version)
            raise ValueError(
                "cfstable: options 'timestamp' and 'branch' are "
                "mutually exclusive"
            )
        if v is None and ts is not None:
            from cubefs_hadoop_spark import versioning as _v

            v = _v.resolve_timestamp(self.path, _iso_to_ms(ts))
        self.version = int(v) if v is not None else None
        self.schema = schema
        self.cols = [f.name for f in schema.fields]
        self.predicates: list[tuple] = []
        # resolve the schema-op chain HERE: __init__ runs at planning and
        # the instance is pickled to executors as-is, whereas mutations
        # made inside partitions() are NOT visible to read() (the reader
        # is serialized independently of the partition-planning call)
        from cubefs_hadoop_spark import versioning

        pinned = (
            versioning.current_version(self.path, branch=self.branch)
            if self.version is None
            else self.version
        )
        # light read: the op chain lives in the root; no page assembly
        self.ops = (
            versioning.read_manifest(
                self.path, pinned, light=True, branch=self.branch
            ).get("schema_ops")
            or []
        )

    def pushFilters(self, filters):
        for f in filters:
            t = _translate(f)
            if t is not None:
                self.predicates.append(t)
            # stats pruning is file-level only: Spark must still apply
            # EVERY filter row-level, so all of them are handed back
            yield f

    # -- driver: manifest -> pruned file list -> one partition per file --
    def partitions(self) -> list[_TableFile]:
        from cubefs_hadoop_spark import versioning

        v = (
            versioning.current_version(self.path, branch=self.branch)
            if self.version is None
            else self.version
        )
        # paged manifests: pushed predicates skip whole pages before any
        # page JSON loads; prune_files below sees only survivors
        m = versioning.read_manifest(
            self.path,
            v,
            predicates=self.predicates or None,
            branch=self.branch,
        )
        if m.get("deletes"):
            raise ValueError(
                "cfstable: table has pending merge-on-read deletes; "
                "compact_table first or read through Engine.read_version"
            )
        # schema-evolved tables mix file generations with different
        # physical column names; read() conforms each file through the
        # op chain (versioning.file_column_map, resolved in __init__).
        # Manifest prune stats already carry post-alter names
        # (alter_schema remaps them), so stats pruning stays
        # generation-correct as-is.
        import os

        files = versioning.prune_files(m, self.predicates)
        out = []
        types = {f.name: f.dataType for f in self.schema.fields}
        for f in files:
            raw = _path_partitions(f)
            # dir-encoded keys are the WRITING generation's physical
            # names; resolve them to target names before probing
            pmap = (
                versioning.file_column_map(list(raw), self.ops)
                if self.ops
                else {k: k for k in raw}
            )
            parts = {
                t: _parse_part_value(raw[src], types[t])
                for t, src in pmap.items()
                if src is not None and t in types
            }
            # partition columns are PATH-prunable: a predicate on one is
            # decided per file from its dir encoding, no stats needed
            if parts and self.predicates:
                probe = {
                    f: {
                        k: [
                            versioning._stat_json(v),
                            versioning._stat_json(v),
                        ]
                        for k, v in parts.items()
                        if v is not None
                    }
                }
                if not versioning.prune_files(
                    {"files": [f], "stats": probe}, self.predicates
                ):
                    continue
            out.append(_TableFile(os.path.join(self.path, f), parts))
        return out

    # -- executor: pyarrow dataset scan with row-group + row filtering --
    def read(self, partition: _TableFile) -> Iterator:
        import pyarrow as pa
        import pyarrow.dataset as pads

        from pyspark.sql.pandas.types import to_arrow_type

        types = {f.name: f.dataType for f in self.schema.fields}
        need = [c for c in self.cols if c not in partition.parts]
        ds = pads.dataset(partition.path, format="parquet")
        ops = getattr(self, "ops", None) or []
        if ops:
            # per-file conformance: THIS file's physical names -> target
            from cubefs_hadoop_spark.versioning import file_column_map

            src = file_column_map(list(ds.schema.names), ops)
            # a predicate on a column this generation lacks (added after
            # the file was written) is null for every row -> no row of
            # this file can match; skip the scan entirely
            if any(
                src.get(c, c) is None
                for c, _op, _v in self.predicates
                if c not in partition.parts
            ):
                return
        else:
            src = {c: c for c in need}
        expr = None
        for col, op, val in self.predicates:
            if col in partition.parts:
                continue  # decided from the dir encoding in partitions()
            field = pads.field(src.get(col, col))
            term = {
                "=": field == val,
                ">": field > val,
                ">=": field >= val,
                "<": field < val,
                "<=": field <= val,
            }[op]
            expr = term if expr is None else expr & term
        file_cols = [src[c] for c in need if src.get(c) is not None]
        for batch in ds.to_batches(columns=file_cols, filter=expr):
            if ops or partition.parts:
                arrays = {}
                for c in need:
                    s = src.get(c)
                    at = to_arrow_type(types[c])
                    if s is None:
                        arrays[c] = pa.nulls(batch.num_rows, type=at)
                    else:
                        a = batch.column(batch.schema.get_field_index(s))
                        arrays[c] = a if a.type == at else a.cast(at)
                for k, v in partition.parts.items():
                    at = to_arrow_type(types[k])
                    arrays[k] = pa.array(
                        [v] * batch.num_rows, type=at
                    )
                batch = pa.RecordBatch.from_arrays(
                    [arrays[c] for c in self.cols], names=self.cols
                )
            yield batch


@dataclass
class _StagedFile(WriterCommitMessage):
    rels: list  # table-relative paths staged by this task (may be empty)


class CfsTableWriter(DataSourceArrowWriter):
    """Exactly-once writer onto the versioned-manifest protocol: each
    task stages parquet under ``data/<stage>/`` via pyarrow's C++ writer
    (Arrow batches in, never a Python row loop); the driver commit
    publishes ONLY the files of the tasks Spark reports as successful,
    through the same optimistic manifest commit every other writer uses.
    Retried/speculative task attempts leave unreferenced files that
    ``expire_versions`` reaps after the orphan grace — the exact failure
    story of the Spark+Iceberg committer.

    Hive-partitioned layout: Spark's Python DataSource API refuses
    ``df.write.partitionBy`` outright (the source reports no table
    partitioning), so partition columns ride an OPTION instead::

        df.write.format("cfstable").option("path", p)
          .option("partitionBy", "region,day").mode("append").save()

    Each task dir-encodes the partition columns (``region=EU/day=.../``)
    under its stage via pyarrow's Hive partitioning — partition columns
    leave the data files exactly like ``commit_version(partition_by=...)``
    — and the manifest commit records ``partition_by``, so reads recover
    the columns from the path and appends onto a mismatched layout are
    refused by the same commit-time check as every other writer."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cfstable: option 'path' is required")
        self.overwrite = overwrite
        self.branch = options.get("branch")
        self.schema_json = schema.jsonValue()
        pb = options.get("partitionby")
        self.partition_by = (
            [c.strip() for c in pb.split(",") if c.strip()] if pb else []
        )
        names = [f.name for f in schema.fields]
        missing = [c for c in self.partition_by if c not in names]
        if missing:
            raise ValueError(
                f"cfstable: partitionBy column(s) {missing} not in the "
                f"written schema {names}"
            )
        if self.partition_by and len(self.partition_by) == len(names):
            raise ValueError(
                "cfstable: partitionBy cannot cover every column (data "
                "files would be empty)"
            )
        import uuid

        self.stage = uuid.uuid4().hex[:8]

    # -- executor: stage parquet under data/<stage>[/k=v...] -------------
    def write(self, iterator) -> _StagedFile:
        import os
        import uuid

        import pyarrow.parquet as pq

        task = uuid.uuid4().hex
        stage_dir = os.path.join(self.path, "data", self.stage)
        if not self.partition_by:
            name = f"part-{task}.parquet"
            writer = None
            for batch in iterator:
                if writer is None:
                    os.makedirs(stage_dir, exist_ok=True)
                    writer = pq.ParquetWriter(
                        os.path.join(stage_dir, name), batch.schema
                    )
                writer.write_batch(batch)
            if writer is None:
                return _StagedFile([])
            writer.close()
            return _StagedFile([f"data/{self.stage}/{name}"])
        # Hive-partitioned: pyarrow splits each batch by partition value,
        # dir-encodes the keys, and DROPS the partition columns from the
        # data files (the committed layout contract).  One pass, C++-side.
        import pyarrow as pa
        import pyarrow.dataset as pads

        batches = iter(iterator)
        try:
            first = next(batches)
        except StopIteration:
            return _StagedFile([])
        part_schema = pa.schema(
            [first.schema.field(c) for c in self.partition_by]
        )
        written: list[str] = []

        def visit(f):
            written.append(os.path.relpath(f.path, self.path))

        import itertools

        pads.write_dataset(
            itertools.chain([first], batches),
            stage_dir,
            schema=first.schema,
            format="parquet",
            partitioning=pads.HivePartitioning(
                part_schema, null_fallback="__HIVE_DEFAULT_PARTITION__"
            ),
            basename_template=f"part-{task}-{{i}}.parquet",
            existing_data_behavior="overwrite_or_ignore",
            file_visitor=visit,
        )
        return _StagedFile(sorted(written))

    # -- driver: manifest publish ---------------------------------------
    def commit(self, messages):
        from cubefs_hadoop_spark import versioning

        files = sorted(r for m in messages if m for r in m.rels)
        versioning.commit_staged_files(
            self.path,
            files,
            self.schema_json,
            mode="overwrite" if self.overwrite else "append",
            partition_by=self.partition_by or None,
            stage=self.stage,
            branch=self.branch,
        )

    def abort(self, messages):
        import os
        import shutil

        shutil.rmtree(
            os.path.join(self.path, "data", self.stage), ignore_errors=True
        )


class CfsTableStreamReader(SimpleDataSourceStreamReader):
    """CDC tail of a versioned table: the stream OFFSET is the committed
    VERSION NUMBER, each micro-batch is exactly the rows the manifests
    added between two versions (versioning.read_changes' file-set diff).
    Offsets are replayable by construction — manifests are immutable, so
    readBetweenOffsets re-reads the identical files after a checkpoint
    recovery (exactly-once with an idempotent sink).

    Non-additive commits (overwrite/compact/rollback dropped files) fail
    the batch loudly rather than silently emitting nothing — at 100 TB a
    CDC consumer must renegotiate a new baseline after a rewrite, not
    miss one.

    Scale note: Spark's SIMPLE stream-reader tier materializes each
    batch driver-side by API design (prefetch/replay caching), which fits
    metadata-rate CDC (commit deltas), not bulk backfill.  For a
    corpus-sized catch-up, read the range as a BATCH instead —
    versioning.read_changes is fully distributed — then start the tail
    from that version."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cfstable: option 'path' is required")
        if options.get("branch"):
            # branches are audit staging, not a CDC source: their chains
            # are short-lived and fast-forward rewrites offsets
            raise ValueError(
                "cfstable streaming reads main only; read the branch as "
                "a batch (option 'branch') or publish it first"
            )
        start = options.get("startingversion")
        self._start = int(start) if start is not None else None

    def initialOffset(self) -> dict:
        from cubefs_hadoop_spark import versioning

        if self._start is not None:
            return {"v": self._start}
        vs = versioning.list_versions(self.path)
        # default: tail new commits only (current table state is the
        # baseline a batch read serves)
        return {"v": vs[-1] if vs else 0}

    def _added_rows(self, v_from: int, v_to: int) -> list[tuple]:
        from cubefs_hadoop_spark import versioning

        if v_to <= v_from:
            return []
        base_m = (
            versioning.read_manifest(self.path, v_from)
            if v_from > 0
            else {"files": [], "deletes": []}
        )
        base = set(base_m["files"])
        m = versioning.read_manifest(self.path, v_to)
        if not set(m["files"]) >= base:
            raise ValueError(
                f"cfstable stream: non-additive commit in ({v_from}, "
                f"{v_to}] (overwrite/compact dropped files); restart the "
                "stream from a new baseline"
            )
        if base_m.get("deletes", []) != m.get("deletes", []):
            # a merge-on-read delete removes ROWS without removing files;
            # the file-set diff would silently misreport the change set
            # (mirrors versioning.read_changes' refusal)
            raise ValueError(
                f"cfstable stream: pending merge-on-read deletes changed "
                f"in ({v_from}, {v_to}]; the added-files diff is not the "
                "row-level change set — restart from a new baseline"
            )
        import os

        import pyarrow.parquet as pq

        rows: list[tuple] = []
        names = [f["name"] for f in m["schema"]["fields"]]
        ops = m.get("schema_ops") or []
        for f in sorted(set(m["files"]) - base):
            t = pq.read_table(os.path.join(self.path, f))
            # a range crossing a schema alter adds files of BOTH
            # generations; conform each file through the op chain
            # (renamed columns read their old physical name, added
            # columns read as null) exactly like versioning.read_changes
            src = (
                versioning.file_column_map(t.column_names, ops)
                if ops
                else {n: n for n in t.column_names}
            )
            cols = []
            for n in names:
                s = src.get(n)
                cols.append(
                    t.column(s).to_pylist()
                    if s is not None
                    else [None] * t.num_rows
                )
            rows.extend(zip(*cols) if cols else [])
        return rows

    def read(self, start: dict):
        from cubefs_hadoop_spark import versioning

        vs = versioning.list_versions(self.path)
        cur = vs[-1] if vs else 0
        return self._added_rows(int(start["v"]), cur), {"v": cur}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._added_rows(int(start["v"]), int(end["v"]))


class CfsTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cfstable"

    def schema(self):
        from cubefs_hadoop_spark import versioning

        path = self.options.get("path")
        if not path:
            raise ValueError("cfstable: option 'path' is required")
        v = self.options.get("version")
        branch = self.options.get("branch")
        ts = self.options.get("timestamp")
        if ts is not None and branch is not None:
            raise ValueError(
                "cfstable: options 'timestamp' and 'branch' are "
                "mutually exclusive"
            )
        if v is None and ts is not None:
            v = versioning.resolve_timestamp(path, _iso_to_ms(ts))
        # Resolve "latest" ONCE and pin it: the reader must plan its file
        # list from the SAME manifest this schema came from, or a commit
        # landing between schema resolution and partition planning tears
        # the scan (v2 schema over v3 files).
        self._pinned_version = (
            int(v)
            if v is not None
            else versioning.current_version(path, branch=branch)
        )
        m = versioning.read_manifest(
            path, self._pinned_version, light=True, branch=branch
        )
        if not m.get("schema"):
            raise ValueError("cfstable: manifest records no schema")
        return StructType.fromJson(m["schema"])

    def reader(self, schema: StructType) -> CfsTableReader:
        opts = dict(self.options)
        pinned = getattr(self, "_pinned_version", None)
        if opts.get("version") is None and pinned is not None:
            opts["version"] = pinned
        return CfsTableReader(opts, schema)

    def writer(self, schema: StructType, overwrite: bool) -> CfsTableWriter:
        return CfsTableWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType) -> CfsTableStreamReader:
        return CfsTableStreamReader(self.options)


def register(spark) -> None:
    # pushFilters is refused outright when this conf is off (the driver
    # may run a vanilla session without session.py's defaults)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CfsTableDataSource)


def read_table(spark, path: str, version: int | None = None):
    """Convenience: register + load in one call."""
    register(spark)
    r = spark.read.format("cfstable").option("path", path)
    if version is not None:
        r = r.option("version", version)
    return r.load()
