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

* **auth**: ``trust``, ``password`` (cleartext), ``md5`` and
  ``SCRAM-SHA-256`` (RFC 5802/7677 — the PostgreSQL default since v14's
  ``password_encryption = scram-sha-256``), all with the stdlib
  (``hashlib.pbkdf2_hmac`` + ``hmac``). SCRAM-SHA-256-PLUS (channel
  binding) requires TLS, which this plaintext-socket client doesn't
  speak — pick the non-PLUS mechanism, as every driver does without SSL.
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


class _ScramClient:
    """Client side of SCRAM-SHA-256 (RFC 5802, SHA-256 parameters per
    RFC 7677), stdlib-only: ``hashlib.pbkdf2_hmac`` for Hi(), ``hmac`` for
    the key/signature derivations.

    No channel binding (gs2 header ``n,,`` — this client never speaks
    TLS, and PostgreSQL only offers the -PLUS mechanism alongside the
    plain one). The username in the SCRAM exchange is empty per the
    PostgreSQL convention: the server takes identity from the startup
    message.

    Password normalization: RFC 5802 mandates SASLprep (RFC 4013);
    stdlib ``stringprep`` supplies the tables, and ASCII passwords (the
    overwhelmingly common case) are its fixed points. Non-ASCII input is
    NFKC-normalized with the prohibited-character checks applied — the
    same observable behavior as the real drivers for every password a
    registry deployment realistically uses.
    """

    def __init__(
        self,
        password: str,
        username: str = "",
        nonce: Optional[str] = None,
    ):
        # username defaults to empty (PostgreSQL takes identity from the
        # startup message); both knobs exist so the RFC 7677 test vector
        # can replay bit-exactly
        import base64
        import os

        self._password = _saslprep(password).encode("utf-8")
        self._nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self._client_first_bare = f"n={username},r={self._nonce}"
        self._server_sig: Optional[bytes] = None

    def client_first(self) -> bytes:
        return ("n,," + self._client_first_bare).encode()

    def client_final(self, server_first: bytes) -> bytes:
        import base64
        import hmac as _hmac

        msg = server_first.decode()
        attrs = dict(p.split("=", 1) for p in msg.split(","))
        nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not nonce.startswith(self._nonce):
            raise PgProtocolError("SCRAM server nonce does not extend ours")
        salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, base64.b64decode(salt_b64), iters
        )
        client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        final_no_proof = f"c=biws,r={nonce}"  # biws = b64("n,,")
        auth_msg = ",".join(
            [self._client_first_bare, msg, final_no_proof]
        ).encode()
        client_sig = _hmac.new(stored_key, auth_msg, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_key = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        self._server_sig = _hmac.new(server_key, auth_msg, hashlib.sha256).digest()
        return (
            final_no_proof + ",p=" + base64.b64encode(proof).decode()
        ).encode()

    def verify_server(self, server_final: bytes) -> None:
        """Mutual auth: the server's v= signature proves it actually holds
        the stored key — refuse the session otherwise."""
        import base64
        import hmac as _hmac

        attrs = dict(
            p.split("=", 1) for p in server_final.decode().split(",")
        )
        if "e" in attrs:
            raise PgProtocolError(f"SCRAM server error: {attrs['e']}")
        got = base64.b64decode(attrs["v"])
        if self._server_sig is None or not _hmac.compare_digest(
            got, self._server_sig
        ):
            raise PgProtocolError(
                "SCRAM server signature mismatch — server does not hold the "
                "credentials it authenticated us against"
            )


def _saslprep(s: str) -> str:
    """RFC 4013 profile of stringprep for SCRAM passwords, via the stdlib
    ``stringprep`` tables: map non-ASCII spaces to space, drop mapped-to-
    nothing chars, NFKC-normalize, reject prohibited/bidi-invalid input.
    ASCII passwords pass through unchanged."""
    if s.isascii():
        if any(ch in s for ch in map(chr, range(0, 32))) or "\x7f" in s:
            raise PgProtocolError("control character in password")
        return s
    import stringprep
    import unicodedata

    mapped = "".join(
        " " if stringprep.in_table_c12(ch) else ch
        for ch in s
        if not stringprep.in_table_b1(ch)
    )
    out = unicodedata.normalize("NFKC", mapped)
    for ch in out:
        if (
            stringprep.in_table_c12(ch)
            or stringprep.in_table_c21_c22(ch)
            or stringprep.in_table_c3(ch)
            or stringprep.in_table_c4(ch)
            or stringprep.in_table_c5(ch)
            or stringprep.in_table_c6(ch)
            or stringprep.in_table_c7(ch)
            or stringprep.in_table_c8(ch)
            or stringprep.in_table_c9(ch)
        ):
            raise PgProtocolError("prohibited character in password (SASLprep)")
    has_ral = any(stringprep.in_table_d1(ch) for ch in out)
    if has_ral:
        if any(stringprep.in_table_d2(ch) for ch in out):
            raise PgProtocolError("mixed bidi categories in password (SASLprep)")
        if not (
            stringprep.in_table_d1(out[0]) and stringprep.in_table_d1(out[-1])
        ):
            raise PgProtocolError("bidi RandAL string must start/end RandAL")
    return out


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
        self._scram: Optional[_ScramClient] = None
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
                if code == 10:  # AuthenticationSASL: null-terminated mech list
                    mechs = [m.decode() for m in body[4:].split(b"\0") if m]
                    if "SCRAM-SHA-256" not in mechs:
                        raise PgProtocolError(
                            f"server offers only {mechs} — SCRAM-SHA-256-PLUS "
                            "needs TLS; use psycopg2/pg8000 over SSL"
                        )
                    if password is None:
                        raise PgProtocolError("server requests a password; none given")
                    self._scram = _ScramClient(password)
                    first = self._scram.client_first()
                    self._send(
                        b"p",
                        b"SCRAM-SHA-256\0"
                        + struct.pack(">i", len(first))
                        + first,
                    )
                    continue
                if code == 11:  # AuthenticationSASLContinue
                    if self._scram is None:
                        raise PgProtocolError(
                            "SASL continue before SASL start"
                        )
                    self._send(b"p", self._scram.client_final(body[4:]))
                    continue
                if code == 12:  # AuthenticationSASLFinal
                    if self._scram is None:
                        raise PgProtocolError(
                            "SASL final before SASL start"
                        )
                    self._scram.verify_server(body[4:])
                    continue
                raise PgProtocolError(
                    f"unsupported auth method {code} — install psycopg2 or "
                    "pg8000"
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
