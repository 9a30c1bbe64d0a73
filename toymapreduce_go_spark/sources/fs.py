"""Pluggable scheme→filesystem registry — the F16 twin of the
reference's FsClient factory map (pkg/fsutil/fsclient.go:14-45:
``SupportedFS`` maps a URL scheme to a client factory, ``Register``
adds schemes, ``NewFsClient`` parses the URL and dispatches; only
"file" ships built in).

Spark's own sources get this for free from the Hadoop FileSystem URI
registry; this module exists for the *Python* DataSource path
(``sources.kvtext``), whose reader/writer would otherwise be welded to
local ``open()``. The client resolved at plan-build time is pickled
with the reader/writer to executors (cloudpickle ships a
test-registered client class by value), so a registered scheme works
cluster-wide without any executor-side import hook — the same property
the reference gets from compiling the factory into the worker binary.

The interface is a superset of the reference's Open/Append/Create:
our sink's rename-on-commit protocol (task-unique temp file, commit
renames winners — worker.go:286-299) additionally needs list/replace/
remove, so those are first-class rather than smuggled through
local-only os calls.
"""

from __future__ import annotations

import abc
from collections.abc import Callable

__all__ = ["FsClient", "LocalFsClient", "UnsupportedScheme",
           "register_fs", "fs_for", "split_scheme"]


class UnsupportedScheme(ValueError):
    """Twin of fsutil.ErrUnsupportFS."""


def split_scheme(path: str) -> tuple[str, str]:
    """("scheme", "rest") for 'scheme://rest'; ("", path) for bare local
    paths (the reference's url.Parse treats those as scheme-less too)."""
    if "://" in path:
        scheme, _, rest = path.partition("://")
        return scheme, rest
    return "", path


class FsClient(abc.ABC):
    """Minimal filesystem surface the kvtext source needs. Paths passed
    in are FULL URLs (or bare local paths); each client strips its own
    scheme prefix, like the reference's getFilePath TrimPrefix."""

    @abc.abstractmethod
    def open(self, path: str, mode: str = "r"):
        """Open for streaming read ('r') or create-for-write ('w') —
        the reference's Open/Create pair keyed by mode."""

    @abc.abstractmethod
    def listdir(self, path: str) -> list[str]:
        """Names (not full paths) of entries in a directory."""

    @abc.abstractmethod
    def isdir(self, path: str) -> bool: ...

    @abc.abstractmethod
    def isfile(self, path: str) -> bool: ...

    @abc.abstractmethod
    def makedirs(self, path: str) -> None:
        """mkdir -p; no error if it exists."""

    @abc.abstractmethod
    def replace(self, src: str, dst: str) -> None:
        """Atomic rename — the commit step of rename-on-commit."""

    @abc.abstractmethod
    def remove(self, path: str) -> None:
        """Delete a file; no error if already gone (abort cleanup)."""

    def join(self, path: str, name: str) -> str:
        return path.rstrip("/") + "/" + name


class LocalFsClient(FsClient):
    """The built-in "file" (and bare-path) client, stdlib-backed —
    NewLocalFsClient's twin."""

    @staticmethod
    def _p(path: str) -> str:
        scheme, rest = split_scheme(path)
        return rest if scheme == "file" else path

    def open(self, path: str, mode: str = "r"):
        return open(self._p(path), mode, encoding="utf-8")

    def listdir(self, path: str) -> list[str]:
        import os
        return os.listdir(self._p(path))

    def isdir(self, path: str) -> bool:
        import os
        return os.path.isdir(self._p(path))

    def isfile(self, path: str) -> bool:
        import os
        return os.path.isfile(self._p(path))

    def makedirs(self, path: str) -> None:
        import os
        os.makedirs(self._p(path), exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        import os
        os.replace(self._p(src), self._p(dst))

    def remove(self, path: str) -> None:
        import os
        try:
            os.remove(self._p(path))
        except FileNotFoundError:
            pass


# scheme -> zero-arg factory (the reference passes the parsed URL to
# its factories; ours receive the full URL per-call instead, so the
# factory needs no arguments). "" covers bare local paths.
_SUPPORTED_FS: dict[str, Callable[[], FsClient]] = {
    "file": LocalFsClient,
    "": LocalFsClient,
}


def register_fs(scheme: str, factory: Callable[[], FsClient]) -> None:
    """fsutil.Register twin: make ``scheme://...`` paths usable by the
    kvtext source (read, write, and the rename-on-commit protocol).

    Ordering contract: Spark pickles the Python DataSource class — and
    with it, by-value, this registry's current contents — when
    ``kvtext.register(spark)`` runs, and data-source planning executes
    in a separate Python runner process that sees only that snapshot.
    So register schemes BEFORE ``kvtext.register(spark)``, or call it
    again afterwards (re-registration re-snapshots). The reference has
    the same shape: fsutil.Register must run before NewFsClient, both
    compiled into the worker binary."""
    _SUPPORTED_FS[scheme] = factory


def fs_for(path: str) -> FsClient:
    """NewFsClient twin: resolve the client for a path's scheme."""
    if not path:
        raise UnsupportedScheme("path can't be empty")
    scheme, _ = split_scheme(path)
    factory = _SUPPORTED_FS.get(scheme)
    if factory is None:
        raise UnsupportedScheme(f"unsupported fs scheme {scheme!r} "
                                f"(registered: {sorted(_SUPPORTED_FS)})")
    return factory()
