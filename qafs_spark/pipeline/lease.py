"""Maintenance writer lease: turn the indexes' "run maintenance
quiesced" CONVENTION into an enforced mutual-exclusion protocol.

Round-11 verdict task 2. ``fold()`` / ``compact()`` / ``rebuild()`` /
``retrain()`` / ``scrub*()`` rewrite datasets via the stage → rename-aside
protocol; each is crash-finishable alone, but two CONCURRENT maintenance
writers can interleave the stage/rename steps (writer A renames the live
dataset aside while writer B's staging write is still pointed at it) and
an ingest writer can land a batch directory in a tree that maintenance is
about to rename aside. The reference has no story here (single-process
SQLite registry, qafs src/qafs/core.py); a 100-TB deployment with a
scheduler needs the loser to ABORT LOUDLY instead of corrupting silently.

Protocol — a single lease FILE per index root (``<root>/_maintenance_lease``)
holding JSON ``{owner, op, acquired_at, expires_at}``:

* **acquire** — one ``FileSystem.create(path, overwrite=false)`` — the FS
  namespace's compare-and-swap (atomic on HDFS/local; object stores check
  at close, hence the read-back verify below). Exactly one of N racers
  creates the file; the rest read the holder and raise
  :class:`LeaseHeldError`.
* **expiry takeover** — a crashed holder's lease times out (default TTL
  1h, maintenance-sized). Takeover renames the expired file to a
  taker-unique stale name FIRST (Hadoop rename: atomic, fails if the
  source vanished — i.e. if another taker already claimed it), then
  re-runs the atomic create. Rename-then-create means two racing takers
  can never both think they won, and a taker can never delete a lease a
  FASTER taker just re-created (the delete-then-create variant has
  exactly that bug).
* **read-back verify** — after create, the owner re-reads the file and
  checks its own token: on stores where create-if-absent is checked at
  close rather than open, last-writer-wins collisions surface here as a
  clean abort instead of two holders.
* **release** — delete iff the file still carries the owner's token; a
  lease lost to expiry takeover is NOT deleted (that would release the
  new holder's lease).

Ingest coexistence: :meth:`MaintenanceLease.held_by_other` is a one-read
probe that ``apply_batch`` calls to refuse new batches while maintenance
holds the lease (see the indexes' ``_refuse_if_maintenance``). The
reverse direction — maintenance starting while an ingest batch is
mid-flight — is narrowed, not closed: quiesce-before-maintenance remains
the documented operating procedure; the lease converts a violated
assumption from silent interleaving into a loud abort on the next batch.

Clock caveat: expiry compares the TAKER's clock against the HOLDER's
``expires_at``; the usual lease-vs-wall-clock skew bounds apply (a taker
whose clock runs minutes fast can take over a live-but-slow holder).
TTL defaults are hours while real skew is seconds — same trade every
lease-file system makes (e.g. Delta Lake's S3 LogStore put-if-absent).
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Optional

from pyspark.sql import SparkSession

from .. import storage as fs_storage

LEASE_FILE = "_maintenance_lease"
# Maintenance TTL sizing (round 11): the TTL must outlive the SLOWEST
# honest run of the op, because there is no renewal thread — a live
# maintenance op whose lease expires mid-run would get taken over and
# the two writers would interleave, the exact corruption the lease
# exists to prevent. Index rewrites (compact/rebuild/retrain) are
# minutes locally but HOURS at 100-TB scale, so their decorators use
# DEFAULT_REWRITE_TTL_SEC; the trade is that a CRASHED writer blocks
# the next maintenance window until expiry — operators who know the
# holder is dead break the glass with :func:`force_release`.
DEFAULT_TTL_SEC = 3600.0
DEFAULT_REWRITE_TTL_SEC = 6 * 3600.0


class LeaseHeldError(RuntimeError):
    """Another writer holds the maintenance lease (or won the takeover
    race). The operation was refused BEFORE any mutation."""


def _parse(raw: Optional[str]) -> Optional[dict]:
    if not raw:
        return None
    try:
        d = json.loads(raw)
        return d if isinstance(d, dict) and "owner" in d else None
    except (ValueError, TypeError):
        return None


class MaintenanceLease:
    """Context manager guarding one index root's maintenance window.

    >>> with MaintenanceLease(spark, root, op="compact"):
    ...     # stage/rename protocol runs here, provably alone
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        op: str = "maintenance",
        ttl_sec: float = DEFAULT_TTL_SEC,
        owner: Optional[str] = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.path = fs_storage.join(self.root, LEASE_FILE)
        self.op = op
        self.ttl_sec = float(ttl_sec)
        self.owner = owner or uuid.uuid4().hex
        self._held = False

    # -- probes -------------------------------------------------------------

    def current(self) -> Optional[dict]:
        """The live lease record, or None (missing/corrupt — a corrupt
        file reads as no-lease: the atomic create then fails against the
        corrupt file's existence and acquire() treats THAT as expired,
        so corruption can't brick the index)."""
        return _parse(fs_storage.read_small_file(self.spark, self.path))

    def held_by_other(self) -> Optional[dict]:
        """Unexpired lease owned by someone else, else None. One read."""
        rec = self.current()
        if not rec or rec.get("owner") == self.owner:
            return None
        if float(rec.get("expires_at", 0)) <= time.time():
            return None
        return rec

    # -- acquire/release ----------------------------------------------------

    def _payload(self) -> str:
        now = time.time()
        return json.dumps(
            {
                "owner": self.owner,
                "op": self.op,
                "acquired_at": now,
                "expires_at": now + self.ttl_sec,
            }
        )

    def _try_create(self) -> bool:
        if not fs_storage.create_file_atomic(
            self.spark, self.path, self._payload()
        ):
            return False
        rec = self.current()  # read-back verify (object-store collisions)
        return bool(rec and rec.get("owner") == self.owner)

    def acquire(self) -> "MaintenanceLease":
        fs_storage.mkdirs(self.spark, self.root)
        if self._try_create():
            self._held = True
            return self
        rec = self.current()
        if rec and float(rec.get("expires_at", 0)) > time.time():
            raise LeaseHeldError(
                f"maintenance lease on {self.root} held by "
                f"owner={rec.get('owner')} op={rec.get('op')} until "
                f"{rec.get('expires_at')}"
            )
        # expired (or unparseable) — takeover: rename-aside FIRST, so a
        # racing taker that re-created the lease can never lose it to our
        # delete, then contend on the atomic create like a fresh acquire.
        stale = f"{self.path}.stale-{self.owner}"
        if not fs_storage.rename_path(self.spark, self.path, stale):
            raise LeaseHeldError(
                f"maintenance lease on {self.root}: lost expiry-takeover "
                "race (another writer renamed the stale lease first)"
            )
        fs_storage.delete_path(self.spark, stale)
        if not self._try_create():
            raise LeaseHeldError(
                f"maintenance lease on {self.root}: lost takeover create "
                "race (another writer acquired after the stale rename)"
            )
        self._held = True
        return self

    def release(self) -> bool:
        """Delete the lease iff still ours. Returns False when the lease
        was already lost to expiry takeover (nothing deleted)."""
        if not self._held:
            return False
        self._held = False
        rec = self.current()
        if not rec or rec.get("owner") != self.owner:
            return False
        fs_storage.delete_path(self.spark, self.path)
        return True

    def __enter__(self) -> "MaintenanceLease":
        return self.acquire()

    def __exit__(self, exc_type, exc, tb) -> None:
        self.release()


def maintenance_op(op: str, ttl_sec: float = DEFAULT_REWRITE_TTL_SEC):
    """Decorator for index maintenance METHODS (``self`` has ``.spark``
    and ``.root``): acquire the root's lease for the duration, reentrant
    within one instance (a lease-held method calling another skips the
    second acquire — depth-tracked, no FS round-trip). Default TTL is
    the REWRITE tier (6h): these ops are full dataset rewrites that run
    hours at cluster scale and have no renewal thread, and an expiring
    lease under a LIVE op would re-admit the interleaving it prevents
    (see the module-constant note; crashed-holder recovery before
    expiry is :func:`force_release`)."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            if getattr(self, "_lease_depth", 0) > 0:
                return fn(self, *args, **kwargs)
            lease = MaintenanceLease(
                self.spark, self.root, op=op, ttl_sec=ttl_sec
            )
            lease.acquire()
            self._lease_depth = 1
            try:
                return fn(self, *args, **kwargs)
            finally:
                self._lease_depth = 0
                lease.release()

        return wrapper

    return deco


def force_release(spark: SparkSession, root: str) -> Optional[dict]:
    """Break-glass: delete ``root``'s lease file unconditionally and
    return the record it held (None if there was none). For the
    operator who KNOWS the holder is dead but cannot wait out the TTL.
    Never called by library code — a live holder whose lease is
    force-released will collide with the next writer, which is exactly
    the judgement call this hands to the human."""
    rec = _parse(
        fs_storage.read_small_file(
            spark, fs_storage.join(root.rstrip("/"), LEASE_FILE)
        )
    )
    fs_storage.delete_path(
        spark, fs_storage.join(root.rstrip("/"), LEASE_FILE)
    )
    return rec


def refuse_if_held(spark: SparkSession, root: str, what: str) -> None:
    """Ingest-side probe: raise :class:`LeaseHeldError` when a LIVE
    maintenance lease exists on ``root``. One small-file read (one
    ``exists`` RPC when no lease file is present) per call — apply_batch
    cadence, not row cadence."""
    rec = MaintenanceLease(spark, root, op=what).held_by_other()
    if rec is not None:
        raise LeaseHeldError(
            f"{what} refused: maintenance op={rec.get('op')} "
            f"(owner={rec.get('owner')}) holds the lease on {root} until "
            f"{rec.get('expires_at')} — re-run after it completes/expires"
        )
