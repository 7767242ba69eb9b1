"""Minimal PostgreSQL wire-protocol client — stdlib sockets only.

The reference's actual backend is Postgres and it implements its own
column decode of the server's binary values
(/root/reference/src/sqldb/postgres/binary_reader.rs:24-209: 16-bit
field counts, 32-bit big-endian lengths, int/float/text payloads,
and the 2000-01-01-epoch rebase for date/timestamp). This container
has Postgres 15 server binaries but no client driver, so the engine
carries the same capability from scratch: a frontend/backend
protocol-v3 client (PostgreSQL documentation, "Frontend/Backend
Protocol" — public spec) with

* startup + trust auth + simple Query, decoding TEXT-format
  DataRows by type OID, and
* ``COPY (…) TO STDOUT (FORMAT BINARY)`` — parsing the PGCOPY
  header and per-tuple binary fields exactly as binary_reader.rs
  does: big-endian int2/int4/int8/float4/float8, bool, utf-8 text,
  ``numeric`` in base-10000 digit groups (decoded lossily to float,
  mirroring the reference's numeric→Float64 wire path,
  datatypes.rs:19-47), DATE as days-since-2000-01-01 and TIMESTAMP
  as micros-since-2000-01-01, both rebased to the Unix epoch.

The two paths decode the SAME values by construction;
tests/test_pgwire.py pins text == binary == the parquet fixture.

Scale: this client is the CONTROL-PLANE wire for the federation
seam (catalog bootstrap, split-point quantile queries, bounded
fetches). Bulk data movement at 100 TB goes through the partitioned
fetch planner (connector.partition_predicates) with one connection
per slice — the same shape Spark's JDBC source uses.
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct

#: Postgres type OIDs (pg_type.dat — public catalog numbers).
OID_BOOL = 16
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_VARCHAR = 1043
OID_BPCHAR = 1042
OID_DATE = 1082
OID_TIMESTAMP = 1114
OID_TIMESTAMPTZ = 1184
OID_NUMERIC = 1700

#: 2000-01-01 — the Postgres wire epoch (binary_reader.rs rebases
#: exactly this way to Unix time).
_PG_EPOCH_DATE = _dt.date(2000, 1, 1)
_PG_EPOCH_TS = _dt.datetime(2000, 1, 1)


class PgError(RuntimeError):
    pass


class PgWireClient:
    """One connection; not thread-safe (one in-flight query)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        timeout: float = 30.0,
        search_path: str | None = None,
    ):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._startup(user, database)
        if search_path:
            # per-scale-factor schema isolation: concurrent sessions
            # pointed at different fixture dirs must not fight over
            # one table namespace (round 9 — a bench at sf0.1 reloaded
            # `customer` under a probe at sf0.01)
            self.query(f"SET search_path TO {search_path}, public")

    # -- framing --------------------------------------------------------
    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return mtype, self._recv_exact(length - 4)

    # -- session --------------------------------------------------------
    def _startup(self, user: str, database: str) -> None:
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        body = struct.pack("!I", 196608) + params  # protocol 3.0
        self._send(struct.pack("!I", len(body) + 4) + body)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack("!I", payload[:4])
                if code != 0:  # trust auth only
                    raise PgError(f"unsupported auth code {code}")
            elif mtype == b"E":
                raise PgError(_error_text(payload))
            elif mtype == b"Z":
                return  # ReadyForQuery
            # 'S' ParameterStatus / 'K' BackendKeyData: ignore

    def close(self) -> None:
        try:
            self._send(b"X" + struct.pack("!I", 4))
        finally:
            self.sock.close()

    # -- simple query (text results) ------------------------------------
    def query(self, sql: str) -> tuple[list[str], list[int], list[tuple]]:
        """Run one SQL statement; returns (column names, type OIDs,
        rows) with TEXT-format values decoded per OID."""
        body = sql.encode() + b"\x00"
        self._send(b"Q" + struct.pack("!I", len(body) + 4) + body)
        cols: list[str] = []
        oids: list[int] = []
        rows: list[tuple] = []
        error = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":
                cols, oids = _parse_row_description(payload)
            elif mtype == b"D":
                rows.append(_parse_data_row(payload, oids))
            elif mtype == b"E":
                error = _error_text(payload)
            elif mtype == b"Z":
                if error:
                    raise PgError(error)
                return cols, oids, rows
            # 'C' CommandComplete / 'N' Notice / 'I' EmptyQuery: skip

    # -- extended query protocol (Parse/Bind/Execute) ---------------------
    def query_extended(
        self, sql: str, params: tuple = ()
    ) -> tuple[list[str], list[int], list[tuple]]:
        """One parameterized statement over the extended protocol:
        Parse ($1..$n placeholders), Bind (parameters travel as
        length-prefixed TEXT values — never spliced into the SQL, so
        no quoting/injection surface exists), Execute with BINARY
        result format, Sync. The binary DataRows are decoded with the
        SAME per-OID table as the COPY reader
        (ref binary_reader.rs:24-209) — the extended protocol is the
        second wire surface that exercises it."""
        parse = (
            b"\x00" + sql.encode() + b"\x00" + struct.pack("!H", 0)
        )  # unnamed stmt, no pre-declared param types (server infers)
        bind = b"\x00\x00"  # unnamed portal <- unnamed statement
        bind += struct.pack("!Hh", 1, 0)  # all params in TEXT format
        bind += struct.pack("!H", len(params))
        for v in params:
            if v is None:
                bind += struct.pack("!i", -1)
            else:
                enc = (
                    repr(v) if isinstance(v, float) else str(v)
                ).encode()
                bind += struct.pack("!i", len(enc)) + enc
        bind += struct.pack("!Hh", 1, 1)  # all results in BINARY
        describe = b"P\x00"  # describe the unnamed portal -> 'T'
        execute = b"\x00" + struct.pack("!i", 0)  # no row limit
        self._send(
            self._frame(b"P", parse)
            + self._frame(b"B", bind)
            + self._frame(b"D", describe)
            + self._frame(b"E", execute)
            + b"S" + struct.pack("!I", 4)  # Sync
        )
        cols: list[str] = []
        oids: list[int] = []
        rows: list[tuple] = []
        error = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":
                cols, oids = _parse_row_description(payload)
            elif mtype == b"D":
                rows.append(_parse_data_row(payload, oids, binary=True))
            elif mtype == b"E":
                error = _error_text(payload)
            elif mtype == b"Z":
                if error:
                    raise PgError(error)
                return cols, oids, rows
            # '1' ParseComplete / '2' BindComplete / 't' ParamDesc /
            # 'n' NoData / 'C' CommandComplete: skip

    @staticmethod
    def _frame(mtype: bytes, payload: bytes) -> bytes:
        return mtype + struct.pack("!I", len(payload) + 4) + payload

    # -- COPY FROM STDIN (the bulk-load write path) -----------------------
    def copy_in_text(
        self, table: str, columns: list[str], rows
    ) -> int:
        """``COPY table (cols) FROM STDIN`` in text format — the
        server-side bulk loader (one copy stream instead of N INSERT
        statements; this is how production data actually enters
        Postgres, and the write-side sibling of :meth:`copy_binary`).
        Returns the server-reported row count."""
        sql = (
            f"COPY {table} ({', '.join(columns)}) FROM STDIN"
        )
        body = sql.encode() + b"\x00"
        self._send(b"Q" + struct.pack("!I", len(body) + 4) + body)
        while True:  # wait for CopyInResponse (or fail fast)
            mtype, payload = self._read_message()
            if mtype == b"G":
                break
            if mtype == b"E":
                err = _error_text(payload)
                # server still sends ReadyForQuery after the error
                while self._read_message()[0] != b"Z":
                    pass
                raise PgError(err)
        chunk: list[str] = []
        size = 0
        for row in rows:
            line = "\t".join(_copy_text_field(v) for v in row) + "\n"
            chunk.append(line)
            size += len(line)
            if size >= 65536:
                data = "".join(chunk).encode()
                self._send(b"d" + struct.pack("!I", len(data) + 4) + data)
                chunk, size = [], 0
        if chunk:
            data = "".join(chunk).encode()
            self._send(b"d" + struct.pack("!I", len(data) + 4) + data)
        self._send(b"c" + struct.pack("!I", 4))  # CopyDone
        n = 0
        error = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"C":  # CommandComplete: b"COPY <n>\x00"
                tag = payload.rstrip(b"\x00").decode()
                n = int(tag.rsplit(" ", 1)[-1])
            elif mtype == b"E":
                error = _error_text(payload)
            elif mtype == b"Z":
                if error:
                    raise PgError(error)
                return n

    # -- binary COPY (the binary_reader.rs parity path) ------------------
    def copy_binary(self, select_sql: str, oids: list[int]) -> list[tuple]:
        """``COPY (select_sql) TO STDOUT (FORMAT BINARY)`` decoded to
        Python values. ``oids`` gives the column types in order (the
        binary frame itself carries only lengths, exactly why the
        reference pairs its reader with the catalog's types)."""
        sql = f"COPY ({select_sql}) TO STDOUT (FORMAT BINARY)"
        body = sql.encode() + b"\x00"
        self._send(b"Q" + struct.pack("!I", len(body) + 4) + body)
        blob = b""
        error = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"d":
                blob += payload
            elif mtype == b"E":
                error = _error_text(payload)
            elif mtype == b"Z":
                if error:
                    raise PgError(error)
                return _parse_pgcopy_binary(blob, oids)
            # 'H' CopyOutResponse / 'c' CopyDone / 'C': skip


# -- COPY text-format field encoding --------------------------------------
def _copy_text_field(v) -> str:
    """One value in COPY text format: NULL is ``\\N``; backslash, tab,
    newline and carriage return are backslash-escaped (the only four
    bytes the format reserves)."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip — exact through float8
    if isinstance(v, (_dt.date, _dt.datetime)):
        return str(v)
    s = v if isinstance(v, str) else str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


# -- decoding helpers ----------------------------------------------------
def _cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode(), end + 1


def _error_text(payload: bytes) -> str:
    parts = {}
    pos = 0
    while pos < len(payload) and payload[pos] != 0:
        code = chr(payload[pos])
        text, pos = _cstring(payload, pos + 1)
        parts[code] = text
    return f"{parts.get('S', 'ERROR')}: {parts.get('M', 'unknown')}"


def _parse_row_description(payload: bytes) -> tuple[list[str], list[int]]:
    (nfields,) = struct.unpack("!H", payload[:2])
    pos = 2
    names, oids = [], []
    for _ in range(nfields):
        name, pos = _cstring(payload, pos)
        _tbl, _col, oid, _typlen, _typmod, _fmt = struct.unpack(
            "!IHIhih", payload[pos : pos + 18]
        )
        pos += 18
        names.append(name)
        oids.append(oid)
    return names, oids


#: array OID -> element OID (the control-plane arrays the federation
#: seam actually sends: percentile_disc split points etc.)
_ARRAY_ELEM = {
    1005: OID_INT2,
    1007: OID_INT4,
    1016: OID_INT8,
    1021: OID_FLOAT4,
    1022: OID_FLOAT8,
    1231: OID_NUMERIC,
    1009: OID_TEXT,
}


def _decode_text(value: bytes, oid: int):
    s = value.decode()
    if oid in _ARRAY_ELEM:
        inner = s.strip("{}")
        if not inner:
            return []
        elem = _ARRAY_ELEM[oid]
        return [
            None
            if tok == "NULL"
            else _decode_text(tok.strip('"').encode(), elem)
            for tok in inner.split(",")
        ]
    if oid in (OID_INT2, OID_INT4, OID_INT8):
        return int(s)
    if oid in (OID_FLOAT4, OID_FLOAT8, OID_NUMERIC):
        # numeric -> float mirrors the reference's lossy
        # numeric→Float64 wire path (datatypes.rs:19-47)
        return float(s)
    if oid == OID_BOOL:
        return s == "t"
    if oid == OID_DATE:
        return _dt.date.fromisoformat(s)
    if oid in (OID_TIMESTAMP, OID_TIMESTAMPTZ):
        return _dt.datetime.fromisoformat(s)
    return s


def _need(buf: bytes, pos: int, n: int, what: str) -> None:
    """Bounds guard (ADVICE r9 #4): a truncated or malformed server
    stream must surface as PgError with context, not a raw
    struct.error/IndexError from blind slicing."""
    if pos + n > len(buf):
        raise PgError(
            f"truncated {what}: need {n} bytes at offset {pos}, "
            f"have {len(buf) - pos}"
        )


def _parse_data_row(
    payload: bytes, oids: list[int], binary: bool = False
) -> tuple:
    _need(payload, 0, 2, "DataRow field count")
    (nfields,) = struct.unpack("!H", payload[:2])
    pos = 2
    out = []
    decode = _decode_binary if binary else _decode_text
    for i in range(nfields):
        _need(payload, pos, 4, "DataRow field length")
        (length,) = struct.unpack("!i", payload[pos : pos + 4])
        pos += 4
        if length == -1:
            out.append(None)
            continue
        _need(payload, pos, length, "DataRow field value")
        out.append(decode(payload[pos : pos + length], oids[i]))
        pos += length
    return tuple(out)


def _decode_binary(value: bytes, oid: int):
    """One binary field — the binary_reader.rs:24-209 decode table."""
    if oid == OID_INT2:
        return struct.unpack("!h", value)[0]
    if oid == OID_INT4:
        return struct.unpack("!i", value)[0]
    if oid == OID_INT8:
        return struct.unpack("!q", value)[0]
    if oid == OID_FLOAT4:
        return struct.unpack("!f", value)[0]
    if oid == OID_FLOAT8:
        return struct.unpack("!d", value)[0]
    if oid == OID_BOOL:
        return value[0] == 1
    if oid == OID_DATE:
        # int32 days since 2000-01-01 -> Unix-epoch date (the rebase)
        (days,) = struct.unpack("!i", value)
        return _PG_EPOCH_DATE + _dt.timedelta(days=days)
    if oid in (OID_TIMESTAMP, OID_TIMESTAMPTZ):
        # int64 micros since 2000-01-01 -> Unix-epoch datetime
        (us,) = struct.unpack("!q", value)
        return _PG_EPOCH_TS + _dt.timedelta(microseconds=us)
    if oid == OID_NUMERIC:
        # base-10000 digit groups: ndigits, weight, sign, dscale
        ndigits, weight, sign, _dscale = struct.unpack("!HhHH", value[:8])
        digits = struct.unpack(f"!{ndigits}H", value[8 : 8 + 2 * ndigits])
        total = 0.0
        for i, d in enumerate(digits):
            total += d * (10000.0 ** (weight - i))
        if sign == 0x4000:
            total = -total
        return total  # lossy float, the reference's numeric path
    return value.decode()


def _parse_pgcopy_binary(blob: bytes, oids: list[int]) -> list[tuple]:
    sig = b"PGCOPY\n\xff\r\n\x00"
    if not blob.startswith(sig):
        raise PgError("bad PGCOPY signature")
    pos = len(sig)
    _need(blob, pos, 8, "PGCOPY header")
    _flags, extlen = struct.unpack("!II", blob[pos : pos + 8])
    pos += 8 + extlen
    rows: list[tuple] = []
    while True:
        _need(blob, pos, 2, "PGCOPY tuple field count")
        (nfields,) = struct.unpack("!h", blob[pos : pos + 2])
        pos += 2
        if nfields == -1:
            return rows  # file trailer
        out = []
        for i in range(nfields):
            _need(blob, pos, 4, "PGCOPY field length")
            (length,) = struct.unpack("!i", blob[pos : pos + 4])
            pos += 4
            if length == -1:
                out.append(None)
                continue
            _need(blob, pos, length, "PGCOPY field value")
            out.append(_decode_binary(blob[pos : pos + length], oids[i]))
            pos += length
        rows.append(tuple(out))
