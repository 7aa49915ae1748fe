"""Object-store semantics shim: S3-like behavior over the local FS.

Round-15 verdict task 4 (carried since round 11). The sandbox has no
cloud connector jars or credentials, so the genuinely-remote leg is
``webhdfs://`` (:mod:`qafs_spark.testing.webhdfs`) — a real Hadoop
FileSystem over HTTP, but one with POSIX-ish atomic rename and atomic
create. What that leg can NOT exercise are the semantics that make
object stores hard for commit protocols. This shim emulates exactly
those, as a drop-in monkeypatch over :mod:`qafs_spark.storage`:

* **Non-atomic create-if-absent** (S3 before conditional writes,
  GCS/ABFS variants): the "if absent" condition is an exists probe at
  open time and an unconditional PUT at close — two racers can BOTH
  return True, last PUT wins the content. An injectable ``interleave``
  hook runs between the probe and the PUT so tests schedule races
  deterministically instead of spinning threads and hoping.
  ``conditional_put=True`` models the modern alternative — S3
  ``PUT If-None-Match:*`` (GA Aug 2024), GCS
  ``if-generation-match: 0``, ABFS ETag preconditions — where the
  condition is checked atomically at PUT time server-side, so the SAME
  race schedule yields exactly one winner (the loser's PUT fails like
  a 412). Tests pin both worlds: the double-hold exists without it,
  vanishes with it.
* **Copy+delete rename**: object stores have no rename; S3A emulates
  it per object. During the window both source and destination are
  visible (hook ``rename_window``), and a crash inside it leaves both.
  Rename onto an existing destination OVERWRITES (a PUT), unlike
  HDFS/POSIX where it fails — protocols relying on rename-fails-if-
  dst-exists must not (the lease protocol's aside names are
  owner-unique for exactly this reason).
* **Listing/visibility lag** (``lag_sec``): a newly PUT object stays
  invisible to ``path_exists``/``list_dirs``/``list_files`` and an
  overwritten object serves its OLD bytes to ``read_small_file`` until
  the lag expires — classic eventual LIST/read-after-overwrite
  consistency. Modern S3 (Dec 2020+) is strongly consistent, so the
  default is 0; tests turn it on to pin which protocol steps survive
  staleness and which are documented residuals.

Scope: this is a SEMANTICS shim for the small-file protocol surface
(lease, fence, manifest markers) — the functions :mod:`pipeline.lease`
and :mod:`pipeline.manifest` call. Spark dataset reads/writes still go
through Hadoop's real local FS (parquet jobs don't route through
qafs_spark.storage), which matches reality: the commit-protocol
metadata is where object-store semantics bite; the data files are
immutable-once-written under unique names in both worlds.

Residual after this shim: ONLY behaviors that need real credentials —
runtime DETECTION of a store's conditional-write support (both
behaviors are modeled here; picking one per deployment needs a live
endpoint), real LIST pagination timing, and connector-jar
configuration. See SCALE.md §object-stores.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import time
from typing import Callable, Dict, Optional, Tuple

from .. import storage as _real

_PATCHED = (
    "create_file_atomic",
    "rename_path",
    "path_exists",
    "read_small_file",
    "list_dirs",
    "list_files",
    "delete_path",
)


def _local(path: str) -> str:
    """The shim runs on local paths only (tests); strip a file: scheme."""
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
    return path


class ObjectStoreShim:
    """S3-semantics implementations of the storage-module functions.

    ``hooks``: name -> callable(path) invoked at the labeled interleave
    point (``create_race`` between exists-probe and PUT;
    ``rename_window`` between copy and delete). ``lag_sec`` > 0 turns
    on eventual visibility for creates and overwrites.
    """

    def __init__(
        self,
        lag_sec: float = 0.0,
        hooks: Optional[Dict[str, Callable]] = None,
        conditional_put: bool = False,
    ) -> None:
        self.lag_sec = float(lag_sec)
        self.hooks = dict(hooks or {})
        # S3 conditional writes (PUT If-None-Match:*, GA Aug 2024; GCS
        # x-goog-if-generation-match:0, ABFS If-None-Match ETag): the
        # if-absent condition is evaluated ATOMICALLY at PUT time
        # against the strongly-consistent object index — a losing racer
        # gets 412, regardless of what any earlier (possibly stale)
        # HEAD said. Modeled with O_CREAT|O_EXCL on the backing file.
        self.conditional_put = bool(conditional_put)
        # abspath -> (visible_at, old_bytes or None). old None = fresh
        # create (invisible until visible_at); old bytes = overwrite
        # (old content served until visible_at).
        self._pending: Dict[str, Tuple[float, Optional[bytes]]] = {}

    # -- internals -----------------------------------------------------
    def _hook(self, name: str, path: str) -> None:
        cb = self.hooks.get(name)
        if cb is not None:
            cb(path)

    def _fresh_invisible(self, p: str) -> bool:
        ent = self._pending.get(p)
        return (
            ent is not None and ent[1] is None and time.time() < ent[0]
        )

    def _stale_old(self, p: str) -> Optional[bytes]:
        ent = self._pending.get(p)
        if ent is not None and ent[1] is not None and time.time() < ent[0]:
            return ent[1]
        return None

    def _put(self, p: str, data: bytes) -> None:
        old = None
        if os.path.exists(p):
            with open(p, "rb") as f:
                old = f.read()
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
        if self.lag_sec > 0:
            self._pending[p] = (time.time() + self.lag_sec, old)

    # -- patched surface -------------------------------------------------
    def create_file_atomic(self, spark, path: str, content: str) -> bool:
        p = os.path.abspath(_local(path))
        # the "if absent" probe — subject to visibility lag, like a
        # HEAD against an eventually-consistent index
        if self.path_exists(spark, path):
            return False
        self._hook("create_race", p)
        if self.conditional_put:
            # conditional-write mode: the PUT carries If-None-Match:* and
            # the store checks it atomically server-side — the hook above
            # still marks the probe→PUT window, but a racer who PUT in
            # that window now makes THIS put fail (412) instead of being
            # overwritten. Note the check is against the real object
            # index, NOT the lagged HEAD view (S3 evaluates conditions
            # strongly consistently even where LIST views lag).
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            try:
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            with os.fdopen(fd, "wb") as f:
                f.write(content.encode("utf-8"))
            if self.lag_sec > 0:
                # the object itself exists atomically; only HEAD/LIST
                # views lag, same as an unconditional fresh PUT
                self._pending[p] = (time.time() + self.lag_sec, None)
            return True
        # condition is NOT re-checked at close: unconditional PUT
        self._put(p, content.encode("utf-8"))
        return True

    def rename_path(self, spark, src: str, dst: str) -> bool:
        s, d = os.path.abspath(_local(src)), os.path.abspath(_local(dst))
        if not os.path.exists(s):
            return False
        # copy phase (PUT to destination — overwrites, never fails on
        # an existing object)
        if os.path.isdir(s):
            if os.path.exists(d):
                shutil.rmtree(d)
            shutil.copytree(s, d)
        else:
            with open(s, "rb") as f:
                self._put(d, f.read())
        self._hook("rename_window", s)
        # delete phase
        if os.path.isdir(s):
            shutil.rmtree(s, ignore_errors=True)
        else:
            try:
                os.remove(s)
            except OSError:
                return False
        return True

    def path_exists(self, spark, path: str) -> bool:
        p = os.path.abspath(_local(path))
        if self._fresh_invisible(p):
            return False
        return os.path.exists(p)

    def read_small_file(self, spark, path: str):
        # GET of a NEW object is strongly consistent (S3 always was —
        # read-after-write for fresh keys); only OVERWRITES serve stale
        # bytes during the lag. HEAD/LIST staleness is modeled in
        # path_exists/list_* instead.
        p = os.path.abspath(_local(path))
        old = self._stale_old(p)
        if old is not None:
            return old.decode("utf-8")
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            return f.read().decode("utf-8")

    def list_dirs(self, spark, path: str):
        p = os.path.abspath(_local(path))
        if not os.path.isdir(p):
            return []
        return sorted(
            e for e in os.listdir(p)
            if os.path.isdir(os.path.join(p, e))
            and not self._fresh_invisible(os.path.join(p, e))
        )

    def list_files(self, spark, path: str):
        p = os.path.abspath(_local(path))
        out = []
        for root, _dirs, files in os.walk(p):
            for f in files:
                fp = os.path.join(root, f)
                if not self._fresh_invisible(fp):
                    out.append(fp)
        return sorted(out)

    def delete_path(self, spark, path: str) -> bool:
        p = os.path.abspath(_local(path))
        self._pending.pop(p, None)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            return True
        try:
            os.remove(p)
            return True
        except OSError:
            return False

    # -- patch management -------------------------------------------------
    def patch(self, monkeypatch) -> "ObjectStoreShim":
        """Install over qafs_spark.storage via pytest's monkeypatch
        (auto-restored at test teardown)."""
        for name in _PATCHED:
            monkeypatch.setattr(_real, name, getattr(self, name))
        return self
