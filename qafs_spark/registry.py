"""Metadata registry (namespaces, features, store version): sqlite by
default, PostgreSQL for multi-writer deployments.

The reference keeps metadata in any SQLAlchemy RDBMS with sqlite as the
default (reference: src/qafs/core.py:30, src/qafs/model.py:79-132,
src/qafs/connection.py:13-24). SQLAlchemy isn't available here and the
registry is strictly driver-side metadata (a few thousand rows), so this is
a dependency-free implementation with the same semantics — stdlib sqlite3
for file-backed stores, and a ``postgresql://`` backend (psycopg2 or pg8000
when installed, else the built-in minimal wire client in
:mod:`qafs_spark.pgwire`) for genuinely concurrent multi-writer
deployments. One ANSI-portable SQL surface serves both; the drivers differ
only in connection factory and writer-serialization statement:

* ``version`` auto-increments on every update (reference: src/qafs/
  model.py:51-55, asserted tests/test_feature_store.py:154);
* ``meta`` dict updates merge keys; a ``None`` value deletes the key
  (reference: src/qafs/model.py:62-72, tests:160-170);
* renames are forbidden (clone instead, reference: src/qafs/model.py:60-61);
* changing ``serialized`` on an existing feature is forbidden (reference:
  src/qafs/model.py:138-141, tests:415-417);
* a ``feature_store_version`` stamp mirrors the alembic migration stamp
  (reference: src/qafs/upgrade.py:12-43).

At 100 TB the data plane never touches this registry from executors — all
lookups happen once, on the driver, before the Spark plan is built.
"""

from __future__ import annotations

import json
import random
import sqlite3
import threading
import time
from datetime import datetime, timezone
from typing import Any, Callable, Dict, List, Optional

from .exceptions import FeatureStoreException, MissingFeatureException
from .names import validate_name

SCHEMA_VERSION = 1

#: Ordered migration steps: version N maps to the ANSI statements that
#: bring an (N-1)-version store to N. Applied by Registry._upgrade_schema
#: inside one writer-serialized transaction; each applied version is
#: stamped into feature_store_version (append-only history, like the
#: reference's timestamped version rows). The reference's own historical
#: migration (upgrade.py:34 adds namespace.backend) is already part of the
#: v1 baseline DDL here.
_MIGRATIONS: dict = {}

_DDL = """
CREATE TABLE IF NOT EXISTS namespace (
    name TEXT PRIMARY KEY,
    description TEXT,
    meta TEXT NOT NULL DEFAULT '{}',
    version INTEGER NOT NULL DEFAULT 1,
    storage TEXT,
    backend TEXT NOT NULL DEFAULT 'spark',
    created_time TEXT,
    modified_time TEXT
);
CREATE TABLE IF NOT EXISTS feature (
    namespace TEXT NOT NULL,
    name TEXT NOT NULL,
    description TEXT,
    meta TEXT NOT NULL DEFAULT '{}',
    version INTEGER NOT NULL DEFAULT 1,
    partition TEXT NOT NULL DEFAULT 'date',
    serialized INTEGER NOT NULL DEFAULT 0,
    transform TEXT,
    check_yaml TEXT,
    created_time TEXT,
    modified_time TEXT,
    PRIMARY KEY (namespace, name)
);
CREATE TABLE IF NOT EXISTS feature_store_version (version INTEGER NOT NULL);
"""

_PARTITION_SCHEMES = ("date", "year")


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


def _merge_meta(old: Dict, new: Optional[Dict]) -> Dict:
    """Merge semantics from reference model.py:62-72: None deletes a key."""
    if not new:
        return old
    merged = dict(old)
    for k, v in new.items():
        if v is None:
            merged.pop(k, None)
        else:
            merged[k] = v
    return merged


class NamespaceRecord(dict):
    @property
    def name(self): return self["name"]


class FeatureRecord(dict):
    @property
    def name(self): return self["name"]

    @property
    def namespace(self): return self["namespace"]

    @property
    def partition(self): return self["partition"]

    @property
    def serialized(self): return bool(self["serialized"])

    @property
    def transform(self): return self["transform"]

    @property
    def check_yaml(self): return self["check_yaml"]


def _resolve_db_url(db_path: str) -> str:
    """Accept reference-style SQLAlchemy URLs (reference
    src/qafs/connection.py:8-10 passes the string straight to
    ``create_engine``) as well as plain file paths.

    ``sqlite:///relative`` / ``sqlite:////absolute`` resolve to the file
    path and run on the stdlib driver; ``postgresql://`` URLs are handled
    by :class:`_PostgresDriver` before this helper is consulted. Any other
    dialect (mysql://, ...) needs a client library this build cannot
    vendor — fail loudly at construction with the constraint named instead
    of surfacing a cryptic sqlite "unable to open database file" on a
    URL-shaped path. The SQL in this module is deliberately ANSI-portable
    (TEXT/INTEGER columns, ? placeholders) so dialects differ only in
    their connection factory, not the schema or statements.
    """
    if "://" not in db_path:
        return db_path
    scheme, rest = db_path.split("://", 1)
    if scheme == "sqlite":
        # sqlite:///foo.db → foo.db (relative); sqlite:////a/b.db → /a/b.db
        if not rest.startswith("/"):
            raise FeatureStoreException(
                f"Malformed sqlite URL {db_path!r} (use sqlite:///path)"
            )
        return rest[1:]
    raise FeatureStoreException(
        f"Unsupported registry dialect {scheme!r}: this build supports "
        "stdlib sqlite3 (sqlite:/// URLs or plain paths), "
        "postgresql:// (via psycopg2/pg8000 when installed, else the "
        "built-in minimal wire client), and duckdb:/// (embedded). The "
        "registry is driver-side metadata — the data plane is unaffected "
        "by this constraint."
    )


#: sqlite busy handler budget — how long a blocked writer waits for another
#: session's transaction before surfacing SQLITE_BUSY
_BUSY_TIMEOUT_S = 30.0


def _is_locked(exc: sqlite3.OperationalError) -> bool:
    msg = str(exc).lower()
    return "locked" in msg or "busy" in msg


class _SqliteDriver:
    """stdlib sqlite3: WAL + busy timeout, writers serialized with BEGIN
    IMMEDIATE (see Registry docstring for the concurrency rationale)."""

    name = "sqlite"

    def __init__(self, db_path: str):
        self.display = db_path

    def connect(self) -> sqlite3.Connection:
        # autocommit (isolation_level=None): transactions are managed
        # explicitly by _write_txn — the stdlib's implicit BEGIN would
        # conflict with BEGIN IMMEDIATE
        con = sqlite3.connect(
            self.display, timeout=_BUSY_TIMEOUT_S, isolation_level=None
        )
        con.row_factory = sqlite3.Row
        try:
            con.execute("PRAGMA journal_mode=WAL")
            con.execute("PRAGMA synchronous=NORMAL")
        except sqlite3.OperationalError:
            pass  # :memory: / read-only media: keep the default journal
        return con

    def init_schema(self, con: sqlite3.Connection) -> None:
        con.executescript(_DDL)

    def begin(self, con: sqlite3.Connection) -> None:
        # take the write lock up front — a deferred transaction that reads
        # then upgrades can deadlock with SQLITE_BUSY that no timeout
        # resolves
        con.execute("BEGIN IMMEDIATE")

    error_types = (sqlite3.OperationalError,)

    def is_transient(self, exc: BaseException) -> bool:
        return isinstance(exc, sqlite3.OperationalError) and _is_locked(exc)


class _PgConnAdapter:
    """Uniform qmark/dict-row surface over a DB-API postgres driver
    (psycopg2 or pg8000). The built-in pgwire client implements this
    surface natively and needs no adapter."""

    def __init__(self, raw):
        raw.autocommit = True  # transactions are driven by explicit BEGIN
        self._raw = raw

    def execute(self, sql: str, params=()):  # qmark → format paramstyle
        cur = self._raw.cursor()
        cur.execute(sql.replace("?", "%s"), tuple(params))
        if cur.description is None:
            return _EagerRows([])
        names = [d[0] for d in cur.description]
        return _EagerRows([dict(zip(names, row)) for row in cur.fetchall()])

    def close(self) -> None:
        self._raw.close()


class _EagerRows:
    def __init__(self, rows):
        self._rows = rows
        self._i = 0

    def fetchone(self):
        if self._i >= len(self._rows):
            return None
        row = self._rows[self._i]
        self._i += 1
        return row

    def fetchall(self):
        rest = self._rows[self._i:]
        self._i = len(self._rows)
        return rest

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row


class _PostgresDriver:
    """Server-RDBMS registry backend (reference connection.py:13-24 is
    any-RDBMS via SQLAlchemy; postgres is the multi-writer deployment the
    sqlite docstring points users at).

    Driver resolution: psycopg2 → pg8000 → the built-in minimal wire
    client (:mod:`qafs_spark.pgwire`, trust/password/md5/SCRAM-SHA-256
    auth — everything except TLS channel binding).

    **Writer serialization** mirrors sqlite's BEGIN IMMEDIATE semantics:
    every write transaction opens with ``LOCK TABLE ... IN SHARE ROW
    EXCLUSIVE MODE``. That mode conflicts with itself, so writers queue
    (instead of aborting under SERIALIZABLE and needing a retry storm)
    while plain readers (ACCESS SHARE) are never blocked. All three tables
    are locked in one statement, so writer-writer deadlock is impossible.
    Registry write volume is a handful of rows per store operation —
    table-level writer serialization is the simple correct choice, not a
    throughput constraint; the check-then-write bodies in Registry stay
    race-free unchanged.
    """

    name = "postgresql"

    def __init__(self, url: str):
        from urllib.parse import unquote, urlsplit

        parts = urlsplit(url)
        self.host = parts.hostname or "localhost"
        self.port = parts.port or 5432
        self.user = unquote(parts.username or "postgres")
        self.password = unquote(parts.password) if parts.password else None
        self.database = unquote(parts.path.lstrip("/")) or self.user
        self.display = f"postgresql://{self.user}@{self.host}:{self.port}/{self.database}"
        self._impl, self.error_types = self._pick_impl()

    def _pick_impl(self):
        try:
            import psycopg2  # type: ignore

            return ("psycopg2", psycopg2), (psycopg2.Error,)
        except ImportError:
            pass
        try:
            import pg8000.dbapi  # type: ignore

            return ("pg8000", pg8000.dbapi), (pg8000.dbapi.Error,)
        except ImportError:
            pass
        from . import pgwire

        return ("pgwire", pgwire), (pgwire.PgError, OSError)

    def connect(self):
        kind, mod = self._impl
        try:
            if kind == "pgwire":
                return mod.connect(
                    self.host, self.port, user=self.user,
                    database=self.database, password=self.password,
                )
            raw = mod.connect(
                host=self.host, port=self.port, user=self.user,
                password=self.password, database=self.database,
            )
            return _PgConnAdapter(raw)
        except Exception as exc:
            raise FeatureStoreException(
                f"registry could not connect to {self.display} "
                f"(driver={kind}): {exc}"
            ) from exc

    def init_schema(self, con) -> None:
        for stmt in _DDL.split(";"):
            if stmt.strip():
                con.execute(stmt)

    def begin(self, con) -> None:
        con.execute("BEGIN")
        con.execute(
            "LOCK TABLE namespace, feature, feature_store_version"
            " IN SHARE ROW EXCLUSIVE MODE"
        )

    def is_transient(self, exc: BaseException) -> bool:
        state = _pg_sqlstate(exc)
        # serialization_failure / deadlock_detected / lock_not_available:
        # safe to re-run the whole check-then-write body. 23505 is NOT here
        # — under LOCK TABLE serialization a unique violation is a genuine
        # application-level duplicate and must surface as such.
        return state in ("40001", "40P01", "55P03")


def _pg_sqlstate(exc: BaseException) -> str:
    for attr in ("sqlstate", "pgcode"):  # pgwire / psycopg2
        v = getattr(exc, attr, None)
        if v:
            return str(v)
    args = getattr(exc, "args", None)  # pg8000: dict in args[0]
    if args and isinstance(args[0], dict):
        return str(args[0].get("C", ""))
    return ""


class _DuckDBConnAdapter:
    """Uniform qmark/dict-row surface over a DuckDB cursor (DuckDB is
    natively qmark-paramstyle, so only row shaping is adapted)."""

    def __init__(self, raw):
        self._raw = raw

    def execute(self, sql: str, params=()):
        cur = self._raw.execute(sql, list(params)) if params else self._raw.execute(sql)
        if cur.description is None:
            return _EagerRows([])
        names = [d[0] for d in cur.description]
        return _EagerRows([dict(zip(names, row)) for row in cur.fetchall()])

    def close(self) -> None:
        self._raw.close()


class _DuckDBDriver:
    """Embedded-analytics registry backend (``duckdb:///path.db``).

    Third live engine behind the same ANSI statements — sqlite (zero-dep
    single host), postgresql (multi-writer server), duckdb (embedded
    OLAP). Besides being useful where DuckDB is already the local
    analytics store, it is the in-container PROOF that the registry SQL is
    dialect-portable (the postgres leg needs a server; this leg runs
    everywhere the test suite runs).

    Process model: DuckDB allows ONE process per database file — the
    driver holds a single root connection and hands out thread-safe
    cursors, so threads within a process share cleanly, but a second
    process (or a second live Registry after abandoning one un-closed)
    cannot attach. Cross-process multi-writer deployments belong on the
    postgres backend; transactions here still serialize correctly via
    DuckDB's optimistic concurrency (write-write conflicts surface as
    TransactionException, retried as transient by :meth:`is_transient`).
    """

    name = "duckdb"

    def __init__(self, path: str):
        self.display = path
        self._db = None
        self._db_lock = threading.Lock()
        import duckdb

        self.error_types = (duckdb.Error,)

    def connect(self):
        import duckdb

        # two threads racing the lazy root-connection open would each
        # attach to the file and the second would hit DuckDB's
        # one-process-per-file lock — serialize the open
        with self._db_lock:
            if self._db is None:
                self._db = duckdb.connect(self.display)
            return _DuckDBConnAdapter(self._db.cursor())

    def init_schema(self, con) -> None:
        for stmt in _DDL.split(";"):
            if stmt.strip():
                con.execute(stmt)

    def begin(self, con) -> None:
        con.execute("BEGIN TRANSACTION")

    def is_transient(self, exc: BaseException) -> bool:
        import duckdb

        return isinstance(exc, duckdb.TransactionException)

    def dispose(self) -> None:
        if self._db is not None:
            self._db.close()
            self._db = None


def _make_driver(db_path: str):
    if "://" in db_path:
        scheme = db_path.split("://", 1)[0]
        if scheme in ("postgresql", "postgres"):
            return _PostgresDriver(db_path)
        if scheme == "duckdb":
            rest = db_path.split("://", 1)[1]
            if not rest.startswith("/"):
                raise FeatureStoreException(
                    f"Malformed duckdb URL {db_path!r} (use duckdb:///path)"
                )
            return _DuckDBDriver(rest[1:])
    return _SqliteDriver(_resolve_db_url(db_path))


class Registry:
    """Write-concurrency notes (reference intends multi-user via
    any-RDBMS, src/qafs/connection.py:13-24; sqlite is single-writer):

    * connections open with a 30s busy timeout and WAL journal mode —
      WAL lets readers proceed under a concurrent writer, and the busy
      handler queues writers instead of failing instantly;
    * every mutation runs through :meth:`_write_txn`: ``BEGIN IMMEDIATE``
      (take the write lock up front — a deferred transaction that reads
      then upgrades can deadlock with SQLITE_BUSY that no timeout
      resolves), the method's check-then-write logic executes atomically
      inside the transaction, and lock errors retry with jittered
      exponential backoff.

    Two Spark drivers sharing one store file therefore serialize cleanly;
    genuinely concurrent multi-writer deployments point the registry at
    PostgreSQL (``postgresql://user@host/db``), where write transactions
    serialize via ``LOCK TABLE`` instead (see :class:`_PostgresDriver`) and
    the same check-then-write bodies stay race-free unchanged.
    """

    def __init__(self, db_path: str):
        self._driver = _make_driver(str(db_path))
        # kept for messages/back-compat: the sqlite file path, or a
        # password-free postgres URL
        self.db_path = self._driver.display
        self._local = threading.local()
        con = self._con()
        self._driver.init_schema(con)
        self._write_txn(self._upgrade_schema)

    def _upgrade_schema(self, con) -> None:
        """Version-check + in-place upgrade on open (reference
        upgrade.py:12-43: read the latest stamped version, apply
        add-column-style migration steps when the store is older than the
        code, stamp afterwards; a NEWER store refuses loudly instead of
        being silently mangled by old code).

        Runs inside one writer-serialized transaction, so two sessions
        racing to open an old store apply the migration exactly once.
        Steps in :data:`_MIGRATIONS` must be ANSI (all three backends run
        them verbatim) and idempotent-by-construction is NOT required —
        the version gate guarantees each step runs once per store."""
        cur = con.execute("SELECT max(version) AS v FROM feature_store_version")
        row = cur.fetchone()
        current = row["v"] if row is not None else None
        if current is None:
            con.execute(
                "INSERT INTO feature_store_version (version) VALUES (?)",
                (SCHEMA_VERSION,),
            )
            return
        current = int(current)
        if current > SCHEMA_VERSION:
            raise FeatureStoreException(
                f"registry {self.db_path!r} has schema version {current}, "
                f"newer than this build's {SCHEMA_VERSION} — refusing to "
                "open (upgrade qafs_spark instead of letting old code "
                "write an incompatible store)"
            )
        for target in range(current + 1, SCHEMA_VERSION + 1):
            for stmt in _MIGRATIONS.get(target, ()):
                con.execute(stmt)
            con.execute(
                "INSERT INTO feature_store_version (version) VALUES (?)",
                (target,),
            )

    def _con(self):
        con = getattr(self._local, "con", None)
        if con is None:
            con = self._driver.connect()
            self._local.con = con
        return con

    def _write_txn(self, fn: Callable[[Any], Any], attempts: int = 6):
        """Run ``fn(con)`` inside a writer-serialized transaction (sqlite:
        BEGIN IMMEDIATE; postgres: LOCK TABLE — see the driver classes),
        retrying on transient lock contention. Application errors raised by
        ``fn`` roll back and propagate unretried."""
        con = self._con()
        drv = self._driver
        delay = 0.05
        last: Optional[BaseException] = None
        for i in range(attempts):
            try:
                drv.begin(con)
            except drv.error_types as exc:
                if not drv.is_transient(exc):
                    raise
                last = exc
                time.sleep(delay * (1 + random.random()))
                delay = min(delay * 2, 2.0)
                continue
            try:
                out = fn(con)
            except BaseException as exc:
                try:
                    con.execute("ROLLBACK")
                except drv.error_types:
                    pass  # already aborted — the rollback is advisory
                # DuckDB's optimistic MVCC surfaces write-write conflicts
                # at the UPDATE statement inside fn, not at begin/commit
                # like sqlite/postgres lock waits — those are transient
                # and must retry the whole check-then-write body (round
                # 14, found by the two-writer version-bump race test)
                if isinstance(exc, drv.error_types) and drv.is_transient(exc):
                    last = exc
                    time.sleep(delay * (1 + random.random()))
                    delay = min(delay * 2, 2.0)
                    continue
                raise
            try:
                con.execute("COMMIT")
            except drv.error_types as exc:
                con.execute("ROLLBACK")
                if not drv.is_transient(exc):
                    raise
                last = exc
                time.sleep(delay * (1 + random.random()))
                delay = min(delay * 2, 2.0)
                continue
            return out
        raise FeatureStoreException(
            f"registry write failed after {attempts} attempts — another "
            f"session holds the write lock on {self.db_path!r} "
            f"({last}); for heavily concurrent writers use a server RDBMS"
        )

    def close(self) -> None:
        con = getattr(self._local, "con", None)
        if con is not None:
            con.close()
            self._local.con = None
        # duckdb holds a process-wide root connection (one process per
        # file); release it so a later Registry can reattach
        dispose = getattr(self._driver, "dispose", None)
        if dispose is not None:
            dispose()

    # ------------------------------------------------------------------
    # namespaces
    # ------------------------------------------------------------------
    def create_namespace(
        self,
        name: str,
        description: Optional[str] = None,
        meta: Optional[Dict] = None,
        storage: Optional[str] = None,
        backend: str = "spark",
    ) -> None:
        validate_name(name)

        def _body(con: sqlite3.Connection) -> None:
            if self.get_namespace(name) is not None:
                # tests/test_feature_store.py:137-139 expect duplicate → raise
                raise FeatureStoreException(f"Namespace {name!r} already exists")
            con.execute(
                "INSERT INTO namespace (name, description, meta, version, storage,"
                " backend, created_time, modified_time) VALUES (?,?,?,?,?,?,?,?)",
                (name, description, json.dumps(meta or {}), 1, storage, backend,
                 _now(), _now()),
            )

        self._write_txn(_body)

    def get_namespace(self, name: str) -> Optional[NamespaceRecord]:
        cur = self._con().execute("SELECT * FROM namespace WHERE name = ?", (name,))
        row = cur.fetchone()
        return self._ns_record(row) if row else None

    def update_namespace(
        self, name: str, description: Optional[str] = None, meta: Optional[Dict] = None
    ) -> None:
        def _body(con: sqlite3.Connection) -> None:
            # read-modify-write (meta merge) is atomic inside the txn —
            # concurrent meta updates can no longer drop each other's keys
            ns = self.get_namespace(name)
            if ns is None:
                raise MissingFeatureException(f"No existing Namespace named {name}")
            new_meta = _merge_meta(ns["meta"], meta)
            new_desc = description if description is not None else ns["description"]
            con.execute(
                "UPDATE namespace SET description=?, meta=?, version=version+1,"
                " modified_time=? WHERE name=?",
                (new_desc, json.dumps(new_meta), _now(), name),
            )

        self._write_txn(_body)

    def delete_namespace(self, name: str) -> None:
        def _body(con: sqlite3.Connection) -> None:
            if self.get_namespace(name) is None:
                raise MissingFeatureException(f"No existing Namespace named {name}")
            if self.list_features(namespace=name):
                raise FeatureStoreException(
                    f"{name} still contains features: these must be deleted first"
                )
            con.execute("DELETE FROM namespace WHERE name=?", (name,))

        self._write_txn(_body)

    def list_namespaces(
        self, name: Optional[str] = None, regex: Optional[str] = None
    ) -> List[NamespaceRecord]:
        q = "SELECT * FROM namespace"
        args: List[Any] = []
        if name:
            q += " WHERE name = ?"
            args.append(name)
        rows = [self._ns_record(r) for r in self._con().execute(q, args)]
        if regex:
            import re

            rx = re.compile(regex)
            rows = [r for r in rows if rx.search(r["name"])]
        return rows

    # ------------------------------------------------------------------
    # features
    # ------------------------------------------------------------------
    def create_feature(
        self,
        namespace: str,
        name: str,
        description: Optional[str] = None,
        meta: Optional[Dict] = None,
        partition: Optional[str] = None,
        serialized: Optional[bool] = None,
        transform: Optional[Dict] = None,
        check_yaml: Optional[str] = None,
    ) -> None:
        validate_name(name)
        if self.get_namespace(namespace) is None:
            raise MissingFeatureException(f"{namespace} namespace does not exist")
        partition = partition or "date"
        if partition not in _PARTITION_SCHEMES:
            raise FeatureStoreException(
                f"partition must be one of {_PARTITION_SCHEMES}, got {partition!r}"
            )
        def _body(con: sqlite3.Connection) -> None:
            if self.get_feature(namespace, name) is not None:
                raise FeatureStoreException(
                    f"Feature {namespace}/{name} already exists"
                )
            con.execute(
                "INSERT INTO feature (namespace, name, description, meta, version,"
                " partition, serialized, transform, check_yaml, created_time,"
                " modified_time) VALUES (?,?,?,?,?,?,?,?,?,?,?)",
                (
                    namespace, name, description, json.dumps(meta or {}), 1,
                    partition, int(bool(serialized)),
                    json.dumps(transform) if transform else None,
                    check_yaml, _now(), _now(),
                ),
            )

        self._write_txn(_body)

    def get_feature(self, namespace: str, name: str) -> Optional[FeatureRecord]:
        cur = self._con().execute(
            "SELECT * FROM feature WHERE namespace=? AND name=?", (namespace, name)
        )
        row = cur.fetchone()
        return self._f_record(row) if row else None

    def update_feature(
        self,
        namespace: str,
        name: str,
        description: Optional[str] = None,
        meta: Optional[Dict] = None,
        transform: Optional[Dict] = None,
        check_yaml: Optional[str] = None,
        serialized: Optional[bool] = None,
    ) -> None:
        def _body(con: sqlite3.Connection) -> None:
            f = self.get_feature(namespace, name)
            if f is None:
                raise MissingFeatureException(
                    f"No existing Feature named {name} in {namespace}"
                )
            if serialized is not None and bool(serialized) != bool(f["serialized"]):
                # reference model.py:138-141 / tests:415-417
                raise FeatureStoreException(
                    "Cannot change serialized setting on existing feature"
                )
            new_meta = _merge_meta(f["meta"], meta)
            con.execute(
                "UPDATE feature SET description=?, meta=?, transform=?,"
                " check_yaml=?, version=version+1, modified_time=?"
                " WHERE namespace=? AND name=?",
                (
                    description if description is not None else f["description"],
                    json.dumps(new_meta),
                    json.dumps(transform) if transform is not None else f["transform_raw"],
                    check_yaml if check_yaml is not None else f["check_yaml"],
                    _now(), namespace, name,
                ),
            )

        self._write_txn(_body)

    def delete_feature(self, namespace: str, name: str) -> None:
        def _body(con: sqlite3.Connection) -> None:
            if self.get_feature(namespace, name) is None:
                raise MissingFeatureException(
                    f"No existing Feature named {name} in {namespace}"
                )
            con.execute(
                "DELETE FROM feature WHERE namespace=? AND name=?", (namespace, name)
            )

        self._write_txn(_body)

    def list_features(
        self,
        name: Optional[str] = None,
        namespace: Optional[str] = None,
        regex: Optional[str] = None,
    ) -> List[FeatureRecord]:
        q = "SELECT * FROM feature"
        clauses, args = [], []
        if namespace:
            clauses.append("namespace = ?")
            args.append(namespace)
        if name:
            clauses.append("name = ?")
            args.append(name)
        if clauses:
            q += " WHERE " + " AND ".join(clauses)
        rows = [self._f_record(r) for r in self._con().execute(q, args)]
        if regex:
            import re

            rx = re.compile(regex)
            rows = [r for r in rows if rx.search(r["name"])]
        return rows

    # ------------------------------------------------------------------
    def _ns_record(self, row: sqlite3.Row) -> NamespaceRecord:
        d = dict(row)
        d["meta"] = json.loads(d.get("meta") or "{}")
        return NamespaceRecord(d)

    def _f_record(self, row: sqlite3.Row) -> FeatureRecord:
        d = dict(row)
        d["meta"] = json.loads(d.get("meta") or "{}")
        d["transform_raw"] = d.get("transform")
        d["transform"] = json.loads(d["transform"]) if d.get("transform") else None
        d["serialized"] = bool(d.get("serialized"))
        return FeatureRecord(d)
