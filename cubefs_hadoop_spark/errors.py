"""Typed engine errors.

Re-expresses the reference's errno -> typed-IOException mapping (N20:
CubefsMount.error, /root/reference/src/main/java/io/cubefs/CubefsMount.java:54-62,82-103)
at table granularity:

    ENOENT  -> FileNotFoundException        -> TableNotFoundError
    EEXIST  -> FileAlreadyExistsException   -> TableAlreadyExistsError
    ENOTDIR -> ParentNotDirectoryException  -> NotATableError
    EACCESS -> AccessControlException       -> EngineAccessError
    EINVAL/EIO/ENOSPACE/EROFS -> IOException -> EngineIOError
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine errors; ``code`` mirrors the errno family."""

    code = "EIO"

    def __init__(self, message: str, path: str | None = None):
        self.path = path
        super().__init__(f"{message}" + (f": {path}" if path else ""))


class TableNotFoundError(EngineError):
    """ENOENT analog (CubefsMount.java:84-85)."""

    code = "ENOENT"


class TableAlreadyExistsError(EngineError):
    """EEXIST analog (CubefsMount.java:88-89)."""

    code = "EEXIST"


class VersionConflictError(TableAlreadyExistsError):
    """EEXIST on a version-manifest commit: another writer committed the
    same version number first (optimistic concurrency, versioning.py).
    Subclasses the EEXIST analog — same errno family, finer grain."""

    code = "EEXIST"


class NotATableError(EngineError):
    """ENOTDIR/EISDIR analog (CubefsMount.java:90-91)."""

    code = "ENOTDIR"


class EngineAccessError(EngineError):
    """EACCESS analog (CubefsMount.java:86-87)."""

    code = "EACCESS"


class EngineIOError(EngineError):
    """EINVAL/ENOSPACE/EROFS/EIO analog (CubefsMount.java:92-99)."""

    code = "EIO"
