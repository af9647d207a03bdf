"""Warehouse filesystem backends — the metadata plane behind one interface.

The reference is a Hadoop ``FileSystem`` over a distributed store (its
whole point is that ``cfs://`` URIs work wherever a Hadoop FS works,
CubefsFileSystem.java:43,58,120-122).  The rebuild's *data* plane already
rides Spark (which reads/writes any Hadoop FS); this module gives the
*metadata* plane — mkdirs / rename / delete / listStatus / getFileStatus /
getContentSummary, i.e. N10-N14, N12/N13, N18 — the same property:

  ``LocalFS``   os/shutil for plain local paths.  Fast (no JVM
                round-trips) and the ONLY place POSIX calls live.
  ``HadoopFS``  ``org.apache.hadoop.fs.FileSystem`` through the session's
                JVM (py4j) — works for any scheme the session's Hadoop
                conf resolves (``file://``, ``hdfs://``, ``s3a://``, or a
                ``cfs://`` connector like the reference), no new deps.

``warehouse_fs(spark, root)`` picks the backend from the root: URIs with a
scheme go to HadoopFS, bare paths stay on LocalFS.

Contract notes (shared by both backends):
  - ``rename`` returns **False when dst exists** — the reference's N10
    semantics (CubefsFileSystem.java:221-223).  The pre-check also guards
    against Hadoop's move-*into*-existing-directory rename behavior.
  - ``create_if_absent`` is the atomic no-overwrite publish primitive the
    versioning commit rides (versioning.py).  Both backends write the
    full content to a hidden tmp name first and publish in one step —
    ``os.link`` on LocalFS (atomic on POSIX), rename-without-overwrite on
    HadoopFS (atomic server-side on HDFS-like stores) — so the final path
    can NEVER be observed empty or torn.  On ``file://`` through HadoopFS
    the no-overwrite refusal is a client-side pre-check (a small race
    window) — fine for tests, and real deployments of this path are
    hdfs://-or-object-store-backed by definition.
  - ``walk_files`` yields ``(relpath, size, mtime_ms)`` with ``/``
    separators; mtime is milliseconds (the reference surfaces ms,
    CubefsFileSystem.java:327-329).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

__all__ = ["WarehouseFS", "LocalFS", "HadoopFS", "warehouse_fs", "has_scheme"]


def has_scheme(path: str) -> bool:
    """True when ``path`` is a URI with a scheme (``file:///x``,
    ``hdfs://nn/x``, and Hadoop's single-slash ``file:/x`` form) rather
    than a bare local path.  Single-letter schemes are treated as paths so
    Windows-style ``C:\\x`` never routes to Hadoop."""
    import re as _re

    return bool(_re.match(r"^[A-Za-z][A-Za-z0-9+.\-]+:/", path))


class WarehouseFS:
    """Interface: every Engine/versioning metadata verb goes through one of
    these methods, so a backend swap touches nothing else."""

    def join(self, *parts: str) -> str:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[tuple[str, bool]]:
        """[(name, is_dir)] for direct children; [] when path is missing."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> bool:
        """False when dst exists (N10); raises FileNotFoundError on src."""
        raise NotImplementedError

    def delete(self, path: str, recursive: bool = True) -> bool:
        """True if something was removed; False when path was missing."""
        raise NotImplementedError

    def walk_files(self, path: str) -> Iterator[tuple[str, int, int]]:
        """Yield (relpath, size_bytes, mtime_ms) for every file under path."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        """Raises FileNotFoundError when missing."""
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Overwrite ``path`` with ``text`` (parent must exist)."""
        raise NotImplementedError

    def create_if_absent(self, path: str, text: str) -> bool:
        """Atomically publish ``text`` at ``path`` iff absent; False on
        EEXIST.  Durable before visible (N9)."""
        raise NotImplementedError

    def cleanup_empty_dirs(self, root: str, min_age_ms: int = 0) -> None:
        """Remove now-empty directories under ``root`` (GC housekeeping).
        ``min_age_ms``: spare dirs modified more recently — an empty dir
        can be a concurrent writer's just-created staging/attempt dir
        (Spark's ``_temporary`` tree), and pruning it crashes the write."""
        raise NotImplementedError

    def status(self, path: str) -> dict:
        """Store capacity report for the filesystem holding ``path``:
        {capacity, used, remaining} in bytes — the FsStatus/getStatus verb
        (reference testFsStatus, CubeFileSystemTest.java:30-36)."""
        raise NotImplementedError


class LocalFS(WarehouseFS):
    """POSIX backend — all ``os``/``shutil`` calls in the warehouse
    metadata plane live here."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_dir(self, path: str) -> list[tuple[str, bool]]:
        if not os.path.isdir(path):
            return []
        return [
            (d, os.path.isdir(os.path.join(path, d))) for d in os.listdir(path)
        ]

    def rename(self, src: str, dst: str) -> bool:
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        if os.path.exists(dst):
            return False
        os.rename(src, dst)
        return True

    def delete(self, path: str, recursive: bool = True) -> bool:
        if not os.path.exists(path):
            return False
        if os.path.isdir(path):
            if recursive:
                shutil.rmtree(path)
            else:
                os.rmdir(path)
        else:
            os.unlink(path)
        return True

    def walk_files(self, path: str) -> Iterator[tuple[str, int, int]]:
        for root, _dirs, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                st = os.stat(fp)
                yield (
                    os.path.relpath(fp, path),
                    int(st.st_size),
                    int(st.st_mtime * 1000),
                )

    def read_text(self, path: str) -> str:
        # newline="" disables universal-newline translation: a stored
        # "\r" must read back as "\r" (byte-faithful, matching the
        # Hadoop backend's raw UTF-8 read)
        with open(path, encoding="utf-8", newline="") as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        # tmp + atomic replace: readers never observe a torn write
        tmp = path + ".__tmp"
        with open(tmp, "w", encoding="utf-8", newline="") as fh:
            fh.write(text)
        os.replace(tmp, path)

    def create_if_absent(self, path: str, text: str) -> bool:
        import uuid

        parent = os.path.dirname(path)
        tmp = os.path.join(parent, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8", newline="") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())  # N9: durable before visible
        try:
            os.link(tmp, path)  # atomic create-if-absent
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def status(self, path: str) -> dict:
        du = shutil.disk_usage(path)
        return {
            "capacity": int(du.total),
            "used": int(du.used),
            "remaining": int(du.free),
        }

    def cleanup_empty_dirs(self, root: str, min_age_ms: int = 0) -> None:
        if not os.path.isdir(root):
            return
        import time as _time

        cutoff = _time.time() * 1000 - min_age_ms
        # Capture PRE-sweep mtimes: rmdir'ing a child updates the parent's
        # mtime, so reading mtimes during the bottom-up pass makes every
        # parent of a pruned dir look freshly touched and immune — one
        # sweep then peels only the deepest level.  A dir that existed
        # before the sweep and only lost children TO the sweep is provably
        # not a live writer's staging dir.
        pre: dict[str, float] = {}
        for cur, dirs, _files in os.walk(root):
            for d in dirs:
                fp = os.path.join(cur, d)
                try:
                    pre[fp] = os.stat(fp).st_mtime * 1000
                except OSError:
                    pass
        for cur, _dirs, _files in os.walk(root, topdown=False):
            # re-list: children removed earlier in this bottom-up pass
            # don't show in the walk's captured (stale) listings
            if cur != root and not os.listdir(cur):
                try:
                    if pre.get(cur, float("inf")) > cutoff:
                        continue  # freshly created: maybe a live stage
                    os.rmdir(cur)
                except OSError:
                    pass


class HadoopFS(WarehouseFS):
    """Hadoop FileSystem backend: metadata verbs as py4j calls into the
    session JVM — the same client API the reference implements the server
    side of.  One ``FileSystem`` handle per (scheme, authority), resolved
    once from the root URI (the Hadoop FS cache makes repeats cheap)."""

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(self._conf)

    # -- helpers -----------------------------------------------------------

    def _p(self, path: str):
        return self._Path(path)

    @staticmethod
    def _is_exc(ex, *class_names: str) -> bool:
        try:
            from py4j.protocol import Py4JJavaError
        except ImportError:  # pragma: no cover
            return False
        if not isinstance(ex, Py4JJavaError):
            return False
        jclass = ex.java_exception.getClass().getName()
        return any(jclass.endswith(n) for n in class_names)

    def join(self, *parts: str) -> str:
        out = parts[0].rstrip("/")
        for p in parts[1:]:
            out += "/" + p.strip("/")
        return out

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def mkdirs(self, path: str) -> None:
        try:
            self._fs.mkdirs(self._p(path))
        except Exception as ex:
            # contract parity with LocalFS: mkdirs over an existing file
            # (or under one) is FileExistsError, not a raw Java exception
            if self._is_exc(
                ex,
                "ParentNotDirectoryException",
                "FileAlreadyExistsException",
                "PathExistsException",
            ):
                raise FileExistsError(path) from ex
            raise

    def list_dir(self, path: str) -> list[tuple[str, bool]]:
        # contract parity with LocalFS: non-directories list as [] —
        # Hadoop's listStatus(file) would return the file itself
        if not self.is_dir(path):
            return []
        return [
            (st.getPath().getName(), bool(st.isDirectory()))
            for st in self._fs.listStatus(self._p(path))
        ]

    def rename(self, src: str, dst: str) -> bool:
        sp, dp = self._p(src), self._p(dst)
        if not self._fs.exists(sp):
            raise FileNotFoundError(src)
        # pre-check implements N10 false-if-dst-exists AND blocks Hadoop's
        # move-into-existing-dir rename semantics
        if self._fs.exists(dp):
            return False
        return bool(self._fs.rename(sp, dp))

    def delete(self, path: str, recursive: bool = True) -> bool:
        return bool(self._fs.delete(self._p(path), recursive))

    def walk_files(self, path: str) -> Iterator[tuple[str, int, int]]:
        p = self._p(path)
        if not self._fs.exists(p):
            return
        base = self._fs.makeQualified(p).toString().rstrip("/")
        it = self._fs.listFiles(p, True)  # recursive RemoteIterator
        while it.hasNext():
            st = it.next()
            full = st.getPath().toString()
            rel = full[len(base) + 1 :] if full.startswith(base) else full
            yield (rel, int(st.getLen()), int(st.getModificationTime()))

    def read_text(self, path: str) -> str:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        stream = self._fs.open(p)
        try:
            # commons-io ships with Spark; avoids byte-at-a-time py4j reads
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        try:
            out = self._fs.create(self._p(path), True)
        except Exception as ex:
            if self._is_exc(
                ex, "FileAlreadyExistsException", "ParentNotDirectoryException"
            ):
                # LocalFS raises IsADirectoryError (an OSError) here
                raise IsADirectoryError(path) from ex
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_if_absent(self, path: str, text: str) -> bool:
        """Write to a hidden tmp name, then publish via rename — the final
        path NEVER exists partially written (a direct create(path) would
        expose a zero-length file before the bytes land, and a concurrent
        reader would parse a torn manifest).  HDFS-like stores make the
        rename-onto-existing-dst refusal atomic server-side; on ``file://``
        the exists pre-check is client-side (test-only caveat, as above)."""
        import uuid

        p = self._p(path)
        if self._fs.exists(p):
            return False
        parent, base = path.rsplit("/", 1)
        tmp = self.join(parent, f".tmp-{base}-{uuid.uuid4().hex}")
        tp = self._p(tmp)
        out = self._fs.create(tp, True)
        try:
            try:
                out.write(bytearray(text.encode("utf-8")))
                try:
                    out.hsync()  # durable before visible where supported
                except Exception:
                    pass
            finally:
                out.close()
        except Exception:
            # failed mid-write: don't leak the tmp file into the dir
            self._fs.delete(tp, False)
            raise
        try:
            if self._fs.exists(p) or not self._fs.rename(tp, p):
                self._fs.delete(tp, False)
                return False
        except Exception:
            self._fs.delete(tp, False)
            raise
        return True

    def status(self, path: str) -> dict:
        p = self._p(path)
        try:
            st = self._fs.getStatus(p)
        except Exception:
            # mount-routing filesystems (viewfs://) refuse getStatus(Path)
            # with "Wrong FS": resolve through the mount table to the
            # backing store and report ITS capacity — the same numbers a
            # direct client of the mount target would see
            resolved = self._fs.resolvePath(p)
            st = resolved.getFileSystem(self._conf).getStatus(resolved)
        return {
            "capacity": int(st.getCapacity()),
            "used": int(st.getUsed()),
            "remaining": int(st.getRemaining()),
        }

    def cleanup_empty_dirs(self, root: str, min_age_ms: int = 0) -> None:
        import time as _time

        p = self._p(root)
        if not self._fs.exists(p):
            return
        cutoff = _time.time() * 1000 - min_age_ms

        def _prune(dp, pre_mtime: float) -> bool:
            """Depth-first: returns True when dp ends up empty and removed.
            ``pre_mtime`` is the dir's mtime captured BEFORE this sweep
            touched its children — deleting a child updates the parent's
            mtime, which must not make the parent look freshly created."""
            children = list(self._fs.listStatus(dp))
            remaining = 0
            for st in children:
                if st.isDirectory() and _prune(
                    st.getPath(), st.getModificationTime()
                ):
                    continue
                remaining += 1
            if remaining == 0 and dp.toString() != self._fs.makeQualified(
                p
            ).toString():
                if pre_mtime > cutoff:
                    return False  # freshly created: maybe a live stage
                self._fs.delete(dp, False)
                return True
            return False

        _prune(self._fs.makeQualified(p), float("inf"))


def warehouse_fs(spark, root: str) -> WarehouseFS:
    """Backend from the warehouse root: URI scheme -> HadoopFS (any store
    the session's Hadoop conf resolves), bare path -> LocalFS."""
    if has_scheme(root):
        return HadoopFS(spark, root)
    return LocalFS()
