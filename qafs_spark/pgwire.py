"""Minimal pure-Python PostgreSQL client for the metadata registry.

The reference keeps its registry in "any SQLAlchemy RDBMS" (reference
src/qafs/connection.py:13-24); our build's dependency constraint is
stdlib-plus-pyspark, so the ``postgresql://`` registry backend prefers a
real driver (psycopg2, then pg8000) and falls back to this module when
neither is installed.

This is a deliberately tiny client for the documented PostgreSQL
frontend/backend protocol, version 3 (PostgreSQL manual, "Frontend/Backend
Protocol" chapter — public specification). Scope is exactly what the
driver-side registry needs and nothing more:

* **auth**: ``trust``, ``password`` (cleartext) and ``md5``. SCRAM
  deployments (the modern default for remote connections) need a real
  driver — the error says so explicitly.
* **simple query flow only** (``Q`` messages, text-format results): the
  registry runs a handful of single-row statements per store operation, so
  the extended protocol's Parse/Bind/Execute adds nothing here.
* **qmark parameters interpolated client-side** with standard SQL literal
  escaping (``''`` doubling; NUL bytes rejected). The server is always run
  with ``standard_conforming_strings=on`` (the default since PostgreSQL
  9.1), which this escaping requires — the connection verifies that via
  the ParameterStatus messages the server sends at startup.

The registry's SQL is ANSI-portable TEXT/INTEGER DML; values are strings,
ints and NULLs — the type surface below mirrors that.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

_PROTOCOL_V3 = 196608  # 3 << 16

# text-format result decoding, by type OID (pg_type.dat — public catalog)
_OID_BOOL = 16
_OID_INTS = (20, 21, 23, 26)  # int8, int2, int4, oid
_OID_FLOATS = (700, 701)      # float4, float8


class PgError(Exception):
    """Server ErrorResponse, exposing the SQLSTATE for retry classification."""

    def __init__(self, fields: Dict[str, str]):
        self.fields = fields
        self.sqlstate = fields.get("C", "")
        self.severity = fields.get("S", "ERROR")
        super().__init__(f"{self.severity}: {fields.get('M', 'unknown error')} "
                         f"(SQLSTATE {self.sqlstate})")


class PgProtocolError(Exception):
    pass


def escape_literal(v: Any) -> str:
    """SQL literal for a parameter value (standard_conforming_strings=on)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int — bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        if "\x00" in v:
            raise PgProtocolError("NUL byte in SQL string parameter")
        return "'" + v.replace("'", "''") + "'"
    raise PgProtocolError(
        f"unsupported parameter type {type(v).__name__} (registry stores "
        "strings, ints and NULLs)"
    )


def interpolate(sql: str, params: Sequence[Any]) -> str:
    """Substitute qmark placeholders. The registry's SQL never contains a
    literal ``?``, so a straight split is exact; the count check makes a
    mismatch loud."""
    if not params:
        return sql
    parts = sql.split("?")
    if len(parts) != len(params) + 1:
        raise PgProtocolError(
            f"parameter count mismatch: {len(parts) - 1} placeholders, "
            f"{len(params)} values"
        )
    out = [parts[0]]
    for p, tail in zip(params, parts[1:]):
        out.append(escape_literal(p))
        out.append(tail)
    return "".join(out)


def _decode(oid: int, data: Optional[bytes]) -> Any:
    if data is None:
        return None
    if oid == _OID_BOOL:
        return data == b"t"
    if oid in _OID_INTS:
        return int(data)
    if oid in _OID_FLOATS:
        return float(data)
    return data.decode("utf-8")


class PgCursor:
    """Fetched-eagerly result set with dict rows (matches how the registry
    consumes sqlite3.Row: mapping access + iteration)."""

    def __init__(self, rows: List[Dict[str, Any]]):
        self._rows = rows
        self._i = 0

    def fetchone(self) -> Optional[Dict[str, Any]]:
        if self._i >= len(self._rows):
            return None
        row = self._rows[self._i]
        self._i += 1
        return row

    def fetchall(self) -> List[Dict[str, Any]]:
        rest = self._rows[self._i:]
        self._i = len(self._rows)
        return rest

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row


class PgConnection:
    """One socket, simple-query protocol, autocommit (transactions are
    driven explicitly with BEGIN/COMMIT/ROLLBACK statements — exactly how
    the registry manages them)."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str,
        database: str,
        password: Optional[str] = None,
        connect_timeout: float = 10.0,
    ):
        self._sock = socket.create_connection((host, port), timeout=connect_timeout)
        # block indefinitely once connected (a LOCK TABLE wait under a
        # concurrent writer is expected registry behavior, not a timeout)
        self._sock.settimeout(None)
        self._params: Dict[str, str] = {}
        self._closed = False
        try:
            self._startup(user, database, password)
        except BaseException:
            self._sock.close()
            self._closed = True
            raise
        scs = self._params.get("standard_conforming_strings", "on")
        if scs != "on":
            self.close()
            raise PgProtocolError(
                "server runs standard_conforming_strings=off; this minimal "
                "client's literal escaping requires 'on' (the default since "
                "PostgreSQL 9.1) — use psycopg2/pg8000 instead"
            )

    # ---------------------------------------------------------------- wire
    def _send_raw(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._send_raw(type_byte + struct.pack(">i", len(payload) + 4) + payload)

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n > 0:
            chunk = self._sock.recv(n)
            if not chunk:
                raise PgProtocolError("server closed the connection")
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def _recv_msg(self) -> Tuple[bytes, bytes]:
        head = self._recv_exact(5)
        type_byte = head[:1]
        (length,) = struct.unpack(">i", head[1:5])
        return type_byte, self._recv_exact(length - 4)

    # ------------------------------------------------------------- startup
    def _startup(self, user: str, database: str, password: Optional[str]) -> None:
        kv = {"user": user, "database": database, "client_encoding": "UTF8",
              "application_name": "qafs-registry"}
        payload = struct.pack(">i", _PROTOCOL_V3) + b"".join(
            k.encode() + b"\0" + v.encode() + b"\0" for k, v in kv.items()
        ) + b"\0"
        self._send_raw(struct.pack(">i", len(payload) + 4) + payload)
        while True:
            t, body = self._recv_msg()
            if t == b"R":
                (code,) = struct.unpack(">i", body[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext password
                    if password is None:
                        raise PgProtocolError("server requests a password; none given")
                    self._send(b"p", password.encode() + b"\0")
                    continue
                if code == 5:  # md5: md5(md5(password + user) + salt)
                    if password is None:
                        raise PgProtocolError("server requests a password; none given")
                    salt = body[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + digest.encode() + b"\0")
                    continue
                raise PgProtocolError(
                    f"unsupported auth method {code} (SCRAM needs a real "
                    "driver — install psycopg2 or pg8000)"
                )
            if t == b"S":  # ParameterStatus
                name, _, rest = body.partition(b"\0")
                value, _, _ = rest.partition(b"\0")
                self._params[name.decode()] = value.decode()
            elif t == b"K":  # BackendKeyData
                continue
            elif t == b"E":
                raise PgError(_error_fields(body))
            elif t == b"Z":  # ReadyForQuery
                return
            else:
                raise PgProtocolError(f"unexpected startup message {t!r}")

    # --------------------------------------------------------------- query
    def execute(self, sql: str, params: Sequence[Any] = ()) -> PgCursor:
        if self._closed:
            raise PgProtocolError("connection is closed")
        self._send(b"Q", interpolate(sql, list(params)).encode() + b"\0")
        columns: List[Tuple[str, int]] = []
        rows: List[Dict[str, Any]] = []
        error: Optional[PgError] = None
        while True:
            t, body = self._recv_msg()
            if t == b"T":  # RowDescription
                columns = []
                (nfields,) = struct.unpack(">h", body[:2])
                off = 2
                for _ in range(nfields):
                    end = body.index(b"\0", off)
                    name = body[off:end].decode()
                    off = end + 1
                    (_tbl, _att, typoid, _len, _mod, _fmt) = struct.unpack(
                        ">ihihih", body[off:off + 18]
                    )
                    off += 18
                    columns.append((name, typoid))
            elif t == b"D":  # DataRow
                (ncols,) = struct.unpack(">h", body[:2])
                off = 2
                row: Dict[str, Any] = {}
                for i in range(ncols):
                    (vlen,) = struct.unpack(">i", body[off:off + 4])
                    off += 4
                    if vlen == -1:
                        data: Optional[bytes] = None
                    else:
                        data = body[off:off + vlen]
                        off += vlen
                    name, oid = columns[i]
                    row[name] = _decode(oid, data)
                rows.append(row)
            elif t in (b"C", b"I", b"S", b"N"):  # complete/empty/status/notice
                continue
            elif t == b"E":
                error = error or PgError(_error_fields(body))
            elif t == b"Z":
                break
            else:
                raise PgProtocolError(f"unexpected message {t!r}")
        if error is not None:
            raise error
        return PgCursor(rows)

    def close(self) -> None:
        if not self._closed:
            try:
                self._send(b"X", b"")  # Terminate
            except OSError:
                pass
            self._sock.close()
            self._closed = True


def _error_fields(body: bytes) -> Dict[str, str]:
    fields: Dict[str, str] = {}
    off = 0
    while off < len(body) and body[off:off + 1] != b"\0":
        code = body[off:off + 1].decode()
        end = body.index(b"\0", off + 1)
        fields[code] = body[off + 1:end].decode("utf-8", "replace")
        off = end + 1
    return fields


def connect(
    host: str,
    port: int = 5432,
    user: str = "postgres",
    database: Optional[str] = None,
    password: Optional[str] = None,
) -> PgConnection:
    return PgConnection(host, port, user, database or user, password)
