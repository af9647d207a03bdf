"""Engine — the reference's HCFS storage contract re-expressed at table level.

The reference (io.cubefs.CubefsFileSystem) implements byte-level filesystem
verbs; a Spark-native engine exposes the same *capability* as a table
warehouse over parquet directories.  The mapping (SURVEY §2A):

    N1  initialize           -> Engine(spark, warehouse_root); cfspark.* conf
                                keys mirror cfs.* (CubefsConfigs.java:21-49)
    N3  open/scan            -> Engine.table -> spark.read.parquet
    N6  create (+overwrite)  -> write_table(mode='overwrite'|'errorifexists')
                                (create's EEXIST/O_TRUNC branch,
                                CubefsFileSystem.java:180-186)
    N8  append               -> write_table(mode='append')  — Spark appends
                                new part files to the table directory rather
                                than bytes to one file (CubefsFileSystem.java:195-209)
    N9  flush/sync           -> parquet committer + _SUCCESS marker
    N10 rename (commit)      -> rename_table; refuses when dst exists, the
                                reference's documented semantics
                                (CubefsFileSystem.java:221-223)
    N11 delete recursive     -> drop_table (CubefsFileSystem.java:248-277)
    N12 listStatus           -> list_tables / describe
                                (CubefsFileSystem.java:280-336)
    N13 getFileStatus        -> table_exists / describe (:382-393)
    N14 mkdirs               -> create_database (:355-380)
    N18 getContentSummary    -> table_stats (:432-436)
    N19 close                -> close (:443-447)
    N20 errno mapping        -> typed errors (errors.py)

Everything data-plane (buffering, batched listing, split planning) is
delegated to Spark's parquet source exactly the way the reference delegates
query compute to its host engines.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from cubefs_hadoop_spark.errors import (
    EngineIOError,
    NotATableError,
    TableAlreadyExistsError,
    TableNotFoundError,
)

_VALID_MODES = ("errorifexists", "overwrite", "append", "ignore")


class Engine:
    """Table warehouse over a root directory of parquet part-file tables.

    Layout convention: ``<warehouse_root>/<database>/<table>/part-*.parquet``
    with Spark's ``_SUCCESS`` commit marker — the same directory-of-parts
    shape the reference's host engines produce through the
    create/mkdirs/rename/delete contract (SURVEY §3 E2).
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        database: str = "default",
        create: bool = True,
    ):
        # N1 initialize: read cfspark.* conf (mirror of cfs.* keys,
        # CubefsConfigs.java:21-49); warehouse root is the volume analog.
        self.spark = spark
        conf_root = None
        try:
            conf_root = spark.conf.get("cfspark.warehouse.root", None)
        except Exception:
            pass
        self.warehouse_root = warehouse_root or conf_root
        if not self.warehouse_root:
            # missing-required-key behavior mirrors CubefsFileSystem.java:68-86
            raise EngineIOError("cfspark.warehouse.root / warehouse_root required")
        self.database = database
        self._closed = False
        if create:
            self.create_database(database)

    # -- namespace ---------------------------------------------------------

    def _check_open(self) -> None:
        # N19 fidelity: the reference's closed native client rejects every
        # subsequent call (cfs_close_client, CubefsFileSystem.java:443-447);
        # a closed Engine does the same instead of silently operating.
        if self._closed:
            raise EngineIOError("engine is closed")

    @staticmethod
    def _validate_name(name: str, kind: str) -> str:
        """Reject names that would resolve outside the warehouse root.

        EINVAL analog (CubefsMount.java:92-99): ``drop_table('../x')`` or a
        rename to an absolute path must fail loudly, never rmtree an
        arbitrary directory.  Every verb resolves through _db_path /
        _table_path, so this is the single enforcement point for the whole
        Python API (the SQL router's identifier regex is separate)."""
        if not isinstance(name, str) or not name:
            raise EngineIOError(f"invalid {kind} name (empty)", str(name))
        bad = (
            os.sep in name
            or (os.altsep is not None and os.altsep in name)
            or "/" in name
            or "\x00" in name
            or name in (".", "..")
            or name.startswith(".")
        )
        if bad:
            raise EngineIOError(f"invalid {kind} name", name)
        return name

    def _db_path(self, database: str | None = None) -> str:
        # single chokepoint: every verb resolves a path through here
        self._check_open()
        # substitute the session database only for None — an explicit ""
        # must fail validation, not silently mean "current database"
        db = self._validate_name(
            self.database if database is None else database, "database"
        )
        return os.path.join(self.warehouse_root, db)

    def _table_path(self, name: str, database: str | None = None) -> str:
        db_path = self._db_path(database)
        return os.path.join(db_path, self._validate_name(name, "table"))

    def create_database(self, database: str) -> None:
        """N14 mkdirs analog (CubefsFileSystem.java:355-380).  Idempotent,
        like the reference's re-mkdirs behavior (CubeFileSystemTest.java:44-61)."""
        os.makedirs(self._db_path(database), exist_ok=True)

    def use(self, database: str) -> None:
        """N16 working-directory analog (CubefsFileSystem.java:338-353)."""
        if not os.path.isdir(self._db_path(database)):
            raise TableNotFoundError("database not found", database)
        self.database = database

    # -- read path ---------------------------------------------------------

    def table(self, name: str, merge_schema: bool = False) -> DataFrame:
        """N3 open/scan analog.  Schema resolution performs the N13 stat
        check first so a missing table raises the typed ENOENT analog.

        ``merge_schema=True`` reconciles parts written with evolved schemas
        (new nullable columns appear as null in old parts) — reads every
        footer instead of one, so keep it off for stable-schema tables."""
        path = self._table_path(name)
        if not os.path.exists(path):
            raise TableNotFoundError("table not found", name)
        if not os.path.isdir(path):
            raise NotATableError("path is not a table directory", name)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(path)

    def sql(self, query: str) -> DataFrame:
        """Run SQL over the warehouse: registers every table (and saved
        view) as a temp view then delegates to Catalyst (the host-engine
        delegation the reference exists for, README.md:61-88)."""
        for name in self.list_tables():
            self.table(name).createOrReplaceTempView(name)
        for name, text in self._views().items():
            self.spark.sql(text).createOrReplaceTempView(name)
        return self.spark.sql(query)

    # -- views (Hive-metastore parity: named saved queries) ----------------

    def _views_path(self) -> str:
        return os.path.join(self._db_path(), "_views.json")

    def _views(self) -> dict[str, str]:
        import json

        try:
            with open(self._views_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def create_view(self, name: str, select: str, replace: bool = False) -> None:
        """Persist a named view definition in the database ( _views.json —
        metadata-only, like a metastore entry; expanded lazily at sql()
        time so views always see current table data)."""
        import json

        views = self._views()
        if name in views and not replace:
            raise TableAlreadyExistsError("view already exists", name)
        if self.table_exists(name):
            raise TableAlreadyExistsError("table with this name exists", name)
        views[name] = select
        os.makedirs(self._db_path(), exist_ok=True)
        with open(self._views_path(), "w") as f:
            json.dump(views, f)

    def drop_view(self, name: str, ignore_missing: bool = False) -> bool:
        import json

        views = self._views()
        if name not in views:
            if ignore_missing:
                return False
            raise TableNotFoundError("view not found", name)
        del views[name]
        with open(self._views_path(), "w") as f:
            json.dump(views, f)
        return True

    def list_views(self) -> list[str]:
        return sorted(self._views())

    # -- session-catalog integration (metastore parity, SURVEY §3 E3) ------

    def sync_catalog(self, database: str | None = None) -> list[str]:
        """Register every warehouse table into Spark's SESSION CATALOG as
        an external parquet table, and every saved view as a catalog view —
        the Hive-metastore-parity path (the reference carries hive-metastore
        deps for exactly this, reference pom.xml:147-160).

        After syncing, plain ``spark.sql("SELECT ... FROM db.t")`` and the
        ``spark.catalog`` API (and therefore any Spark-connected tool —
        thriftserver, notebooks) see the warehouse without going through
        ``Engine.sql()``'s temp-view bridge.  Tables are EXTERNAL (LOCATION
        = the warehouse path): dropping the catalog entry never deletes
        data, and appends through the Engine are visible after the refresh
        this method performs.  Returns the qualified names registered.
        """
        db = self._validate_name(
            self.database if database is None else database, "database"
        )
        spark = self.spark
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        registered = []
        for name in self.list_tables():
            path = self._table_path(name).replace("'", "''")
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {db}.{name} "
                f"USING parquet LOCATION '{path}'"
            )
            # external location: new part files (Engine.append) appear on
            # refresh; without it Spark may serve cached file listings
            spark.catalog.refreshTable(f"{db}.{name}")
            registered.append(f"{db}.{name}")
        # Saved-view SQL references bare warehouse names.  Persistent views
        # may not reference temp objects, and Engine.sql()'s temp views
        # shadow catalog tables — so qualify every known table/view name in
        # the view text with the target database.  (Word-boundary rewrite;
        # a column literally named like a table would be over-qualified —
        # acceptable for the metastore-parity surface, noted here.)
        views = self._views()
        known = sorted(set(self.list_tables()) | set(views), key=len, reverse=True)
        pending = dict(views)
        for _ in range(max(len(pending), 1)):
            if not pending:
                break
            failed: dict[str, str] = {}
            for vname, text in pending.items():
                q = text
                for name in known:
                    q = re.sub(rf"\b{re.escape(name)}\b", f"{db}.{name}", q)
                try:
                    spark.sql(f"CREATE OR REPLACE VIEW {db}.{vname} AS {q}")
                    registered.append(f"{db}.{vname}")
                except Exception:
                    failed[vname] = text  # may depend on a not-yet-created view
            if len(failed) == len(pending):
                # no progress: surface the first real error
                vname, text = next(iter(failed.items()))
                q = text
                for name in known:
                    q = re.sub(rf"\b{re.escape(name)}\b", f"{db}.{name}", q)
                spark.sql(f"CREATE OR REPLACE VIEW {db}.{vname} AS {q}")
            pending = failed
        return registered

    def unsync_catalog(self, database: str | None = None) -> None:
        """Remove this warehouse's entries from the session catalog
        (metadata only — external tables, data untouched)."""
        db = self._validate_name(
            self.database if database is None else database, "database"
        )
        if not any(d.name == db for d in self.spark.catalog.listDatabases()):
            return
        for t in self.spark.catalog.listTables(db):
            if t.isTemporary:
                continue  # session temp views are not ours to drop
            kind = "VIEW" if t.tableType == "VIEW" else "TABLE"
            self.spark.sql(f"DROP {kind} IF EXISTS {db}.{t.name}")

    def execute(self, stmt: str) -> DataFrame | None:
        """Hive/FsShell-parity statement router (the E3 metadata path plus
        Hive's CTAS/INSERT DML, SURVEY §3).  DDL/DML statements map onto the
        storage contract; anything else is a query delegated to sql().

          CREATE TABLE [IF NOT EXISTS] t AS <select>   -> write_table
          CREATE [OR REPLACE] VIEW v AS <select>       -> create_view
          INSERT INTO t <select>                       -> append
          DROP TABLE [IF EXISTS] t                     -> drop_table
          DROP VIEW [IF EXISTS] v                      -> drop_view
          SHOW TABLES                                  -> list_tables
          DESCRIBE t                                   -> describe
        """
        s = stmt.strip().rstrip(";")
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            self.create_view(m.group(2), m.group(3), replace=bool(m.group(1)))
            return None
        m = re.match(r"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(\w+)", s, re.IGNORECASE)
        if m:
            self.drop_view(m.group(2), ignore_missing=bool(m.group(1)))
            return None
        m = re.match(
            r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(.+)",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            if_not_exists, name, select = m.group(1), m.group(2), m.group(3)
            if if_not_exists and self.table_exists(name):
                return None
            self.write_table(self.sql(select), name)
            return None
        m = re.match(
            r"INSERT\s+INTO\s+(\w+)\s+(.+)", s, re.IGNORECASE | re.DOTALL
        )
        if m:
            name, select = m.group(1), m.group(2)
            df = self.sql(select)
            target = set(self.table(name).columns)
            if set(df.columns) != target:
                raise EngineIOError(
                    f"INSERT INTO {name}: column mismatch "
                    f"{sorted(df.columns)} vs {sorted(target)}"
                )
            self.append(df, name)
            return None
        m = re.match(
            r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+)", s, re.IGNORECASE
        )
        if m:
            self.drop_table(m.group(2), ignore_missing=bool(m.group(1)))
            return None
        if re.match(r"SHOW\s+TABLES$", s, re.IGNORECASE):
            return self.spark.createDataFrame(
                [(t,) for t in self.list_tables()], "table string"
            )
        m = re.match(r"DESCRIBE\s+(\w+)$", s, re.IGNORECASE)
        if m:
            return self.describe(m.group(1))
        return self.sql(s)

    # -- write path --------------------------------------------------------

    def write_table(
        self,
        df: DataFrame,
        name: str,
        mode: str = "errorifexists",
        partition_by: list[str] | None = None,
    ) -> None:
        """N6 create + N7 buffered write + N9 flush + N10 rename-commit,
        all delegated to Spark's parquet committer.

        Mode mapping to the reference's create() flags
        (CubefsFileSystem.java:158-193):
          errorifexists -> plain O_CREAT; EEXIST raises (ref :180-183)
          overwrite     -> O_CREAT|O_TRUNC (ref :184-186)
          append        -> N8 append (ref :195-209), as new part files
        """
        if mode not in _VALID_MODES:
            raise EngineIOError(f"invalid write mode {mode!r}")
        path = self._table_path(name)
        if mode == "errorifexists" and os.path.exists(path):
            raise TableAlreadyExistsError("table already exists", name)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    def append(self, df: DataFrame, name: str) -> None:
        self.write_table(df, name, mode="append")

    def rename_table(self, src: str, dst: str) -> bool:
        """N10 rename with the reference's exact semantics: returns False when
        dst exists (CubefsFileSystem.java:221-223), True on success, raises
        ENOENT analog when src is missing."""
        src_path = self._table_path(src)
        dst_path = self._table_path(dst)
        if not os.path.exists(src_path):
            raise TableNotFoundError("table not found", src)
        if os.path.exists(dst_path):
            return False
        os.rename(src_path, dst_path)
        return True

    def drop_table(self, name: str, ignore_missing: bool = False) -> bool:
        """N11 recursive delete (CubefsFileSystem.java:248-277)."""
        path = self._table_path(name)
        if not os.path.exists(path):
            if ignore_missing:
                return False
            raise TableNotFoundError("table not found", name)
        shutil.rmtree(path)
        return True

    def compact_table(
        self, name: str, target_file_bytes: int = 128 << 20
    ) -> int:
        """Rewrite a table's parts toward target-sized files (the small-
        files maintenance op; default = the reference's 128 MiB block size,
        CubefsFileSystem.java:97).  Committed via the N10 rename primitive:
        the rewrite lands in a temp dir and swaps in atomically, so readers
        never see a half-compacted table."""
        from cubefs_hadoop_spark.plans.layout import compact

        path = self._table_path(name)
        if not os.path.isdir(path):
            raise TableNotFoundError("table not found", name)
        tmp = path + ".__compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        n = compact(self.table(name), tmp, target_file_bytes)
        old = path + ".__old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        return n

    # -- versioned tables (Iceberg-capability analog, versioning.py) -------

    def write_table_version(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> int:
        """Commit ``df`` as a new snapshot version of ``name`` (atomic
        multi-file commit; old versions stay readable).  Returns the
        committed version number.  See versioning.py for the protocol —
        the reference's Iceberg path (README.md:79-83) re-expressed on the
        N10 rename/create-if-absent primitive."""
        from cubefs_hadoop_spark import versioning

        return versioning.commit_version(
            df, self._table_path(name), mode=mode, partition_by=partition_by
        )

    def read_version(self, name: str, version: int | None = None) -> DataFrame:
        """Time-travel read: the exact file set version ``version`` (default
        latest) committed — concurrent commits can never tear the read."""
        from cubefs_hadoop_spark import versioning

        return versioning.read_version(
            self.spark, self._table_path(name), version
        )

    def table_versions(self, name: str) -> list[int]:
        from cubefs_hadoop_spark import versioning

        return versioning.list_versions(self._table_path(name))

    def rollback_table(self, name: str, to_version: int) -> int:
        """Append-only rollback: commits a new version duplicating
        ``to_version``'s file set."""
        from cubefs_hadoop_spark import versioning

        return versioning.rollback(self._table_path(name), to_version)

    def expire_table_versions(self, name: str, keep_last: int = 1) -> dict:
        """GC manifests + unreferenced data files beyond ``keep_last``."""
        from cubefs_hadoop_spark import versioning

        return versioning.expire_versions(self._table_path(name), keep_last)

    def vacuum(self) -> list[str]:
        """Remove orphaned work dirs left by interrupted maintenance ops
        (``*.__compacting`` / ``*.__old`` from compact_table) and Spark
        ``_temporary`` attempt dirs from crashed writes.  Safe any time:
        live tables never have these suffixes."""
        removed = []
        root = self._db_path()
        if not os.path.isdir(root):
            return removed
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if d.endswith((".__compacting", ".__old")):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(d)
            elif os.path.isdir(p):
                tmp = os.path.join(p, "_temporary")
                if os.path.isdir(tmp):
                    shutil.rmtree(tmp, ignore_errors=True)
                    removed.append(os.path.join(d, "_temporary"))
        return removed

    # -- metadata path -----------------------------------------------------

    def list_tables(self) -> list[str]:
        """N12 listStatus analog (CubefsFileSystem.java:280-336): table names
        are the directories under the database root."""
        root = self._db_path()
        if not os.path.isdir(root):
            return []
        return sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )

    def table_exists(self, name: str) -> bool:
        """N13 getFileStatus-as-existence-probe (CubefsFileSystem.java:382-393)."""
        return os.path.isdir(self._table_path(name))

    def describe(self, name: str) -> DataFrame:
        """FileStatus-shaped listing of a table's part files — the N12/N13
        StatInfo surface (ino,size,mtime,... CubefsLib.java:25-52) as a
        DataFrame."""
        path = self._table_path(name)
        if not os.path.isdir(path):
            raise TableNotFoundError("table not found", name)
        rows = []
        for root, _dirs, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                st = os.stat(fp)
                rows.append(
                    (
                        os.path.relpath(fp, path),
                        int(st.st_size),
                        # ms-precision mtime, matching the reference's
                        # mtime*1000 + nsec/1e6 (CubefsFileSystem.java:327-329)
                        int(st.st_mtime * 1000),
                        f == "_SUCCESS",
                    )
                )
        return self.spark.createDataFrame(
            rows, "file string, size bigint, mtime_ms bigint, is_marker boolean"
        )

    def is_committed(self, name: str) -> bool:
        """N9 durability analog: Spark's parquet job commit writes _SUCCESS."""
        return os.path.exists(os.path.join(self._table_path(name), "_SUCCESS"))

    def table_stats(self, name: str) -> dict:
        """N18 getContentSummary analog (CubefsFileSystem.java:432-436):
        recursive walk summing file count and bytes; row count via a
        parquet-metadata-only Spark count."""
        path = self._table_path(name)
        if not os.path.isdir(path):
            raise TableNotFoundError("table not found", name)
        n_files, n_bytes = 0, 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                # skip commit markers (_SUCCESS) and hidden checksum files
                # (.part-*.crc) — stats cover data content, not bookkeeping
                if f.startswith(("_", ".")):
                    continue
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(root, f))
        return {
            "files": n_files,
            "bytes": n_bytes,
            "rows": self.table(name).count(),
        }

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        """N19 close analog (CubefsFileSystem.java:443-447).  Does NOT stop
        the SparkSession (it is caller-owned, like the Hadoop FileSystem
        cache); just marks the engine unusable."""
        self._closed = True
