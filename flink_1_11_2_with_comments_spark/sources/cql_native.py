"""Cassandra connector over its REAL protocol: CQL native v4 framing.

flink-connector-cassandra drives the DataStax driver, whose wire
format is the public CQL binary protocol
(https://github.com/apache/cassandra/blob/trunk/doc/native_protocol_v4.spec):
9-byte frames (version, flags, stream, opcode, length), a
STARTUP→READY handshake, QUERY requests carrying BOUND VALUES
(flag 0x01 — no PREPARE round-trip needed), and RESULT Rows frames
with typed column metadata. This module implements that protocol in
pure stdlib:

- ``CqlClient``: connect/STARTUP/READY, ``execute(cql, values)``
  with typed bound values, RESULT Rows decoding (bigint, double,
  varchar supported — the types the fixtures need).
- ``cql_write``: executor-side INSERT loop, one connection per
  partition (the reference sink's per-subtask session,
  CassandraSinkBase).
- ``cql_read``: parallel scan by TOKEN RANGES — task i reads
  ``token(pk) > lo AND token(pk) <= hi`` for its slice of the ring,
  the split model every Cassandra bulk reader uses
  (CassandraInputFormat / spark-cassandra-connector).
- ``StubCqlServer``: in-process server speaking the same frames over
  real sockets with an in-memory table; the partitioner is
  Murmur3Partitioner semantics (token = first 64-bit half of
  MurmurHash3 x64_128 of the key, implemented from the public
  algorithm below).

Protocol correctness (framing, handshake, bound-value encoding,
Rows metadata + typed cells, token-range coverage) is what the
loopback pins; murmur3 follows Cassandra's Java variant of x64_128
(SIGN-EXTENDED tail bytes — Java bytes are signed), pinned in
tests against published DataStax-driver token vectors including
high-bit tails.
"""

from __future__ import annotations

import hashlib
import io
import socket
import socketserver
import struct
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

OP_STARTUP, OP_READY, OP_QUERY, OP_RESULT, OP_ERROR = (
    0x01, 0x02, 0x07, 0x08, 0x00)
CONSISTENCY_ONE = 0x0001
TYPE_BIGINT, TYPE_DOUBLE, TYPE_VARCHAR = 0x0002, 0x0007, 0x000D
LONG_MIN, LONG_MAX = -(1 << 63), (1 << 63) - 1


# ---------------------------------------------------------------------------
# MurmurHash3 x64_128 (public algorithm) → Cassandra token
# ---------------------------------------------------------------------------

def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    return k


def _sx8(b: int) -> int:
    """Java's (long) cast of a signed byte: sign-extend values >= 0x80."""
    return b - 256 if b >= 0x80 else b


def murmur3_token(key: bytes) -> int:
    """Cassandra Murmur3Partitioner token: signed first 64-bit half of
    MurmurHash3 x64_128(key, seed=0), with LONG_MIN mapped to
    LONG_MAX as Cassandra does.

    Cassandra's Java implementation (o.a.c.utils.MurmurHash
    .hash3_x64_128) diverges from the canonical C++ x64_128 in the
    tail: Java bytes are SIGNED, so each tail byte is sign-extended
    to 64 bits before being shifted and XORed into k1/k2. Any key
    whose tail contains bytes >= 0x80 (e.g. big-endian bigint
    encodings) gets a different token under the unsigned C++ rule —
    we follow the Java/Cassandra semantics so tokens match a real
    cluster's ring."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = 0
    n = len(key)
    for i in range(0, n - 15, 16):
        k1, k2 = struct.unpack_from("<qq", key, i)
        k1 &= 0xFFFFFFFFFFFFFFFF
        k2 &= 0xFFFFFFFFFFFFFFFF
        k1 = (k1 * c1) & 0xFFFFFFFFFFFFFFFF
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & 0xFFFFFFFFFFFFFFFF
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
        h1 = (h1 * 5 + 0x52DCE729) & 0xFFFFFFFFFFFFFFFF
        k2 = (k2 * c2) & 0xFFFFFFFFFFFFFFFF
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & 0xFFFFFFFFFFFFFFFF
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & 0xFFFFFFFFFFFFFFFF
        h2 = (h2 * 5 + 0x38495AB5) & 0xFFFFFFFFFFFFFFFF
    tail = key[n - (n % 16):]
    k1 = k2 = 0
    for j in range(len(tail) - 1, 7, -1):
        k2 ^= (_sx8(tail[j]) << (8 * (j - 8))) & 0xFFFFFFFFFFFFFFFF
    for j in range(min(len(tail), 8) - 1, -1, -1):
        k1 ^= (_sx8(tail[j]) << (8 * j)) & 0xFFFFFFFFFFFFFFFF
    if len(tail) > 8:
        k2 = (k2 * c2) & 0xFFFFFFFFFFFFFFFF
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & 0xFFFFFFFFFFFFFFFF
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & 0xFFFFFFFFFFFFFFFF
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & 0xFFFFFFFFFFFFFFFF
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
    h2 = (h2 + h1) & 0xFFFFFFFFFFFFFFFF
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & 0xFFFFFFFFFFFFFFFF
    tok = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    return LONG_MAX if tok == LONG_MIN else tok


# ---------------------------------------------------------------------------
# frame + value codecs
# ---------------------------------------------------------------------------

def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("cql peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _send_frame(sock: socket.socket, version: int, opcode: int,
                body: bytes, stream: int = 0) -> None:
    sock.sendall(struct.pack(">BBhBi", version, 0, stream, opcode,
                             len(body)) + body)


def _recv_frame(sock: socket.socket):
    head = _recv_exact(sock, 9)
    _ver, _flags, stream, opcode, length = struct.unpack(">BBhBi",
                                                         head)
    return opcode, stream, _recv_exact(sock, length)


def _w_string(out: io.BytesIO, s: str) -> None:
    b = s.encode()
    out.write(struct.pack(">H", len(b)))
    out.write(b)


def _r_string(buf: memoryview, pos: int) -> tuple[str, int]:
    n, = struct.unpack_from(">H", buf, pos)
    pos += 2
    return bytes(buf[pos:pos + n]).decode(), pos + n


def _w_longstring(out: io.BytesIO, s: str) -> None:
    b = s.encode()
    out.write(struct.pack(">i", len(b)))
    out.write(b)


def _encode_value(v) -> tuple[int, bytes]:
    if isinstance(v, bool):
        raise TypeError("bool not supported")
    if isinstance(v, int):
        return TYPE_BIGINT, struct.pack(">q", v)
    if isinstance(v, float):
        return TYPE_DOUBLE, struct.pack(">d", v)
    if isinstance(v, str):
        return TYPE_VARCHAR, v.encode()
    raise TypeError(f"unsupported CQL value type {type(v)}")


def _decode_value(type_id: int, raw: bytes | None):
    if raw is None:
        return None
    if type_id == TYPE_BIGINT:
        return struct.unpack(">q", raw)[0]
    if type_id == TYPE_DOUBLE:
        return struct.unpack(">d", raw)[0]
    if type_id == TYPE_VARCHAR:
        return raw.decode()
    raise TypeError(f"unsupported CQL type id {type_id}")


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class CqlClient:
    """CQL native protocol v4 client: STARTUP handshake, QUERY with
    bound values, RESULT Rows decoding."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))
        body = io.BytesIO()
        body.write(struct.pack(">H", 1))          # string map: 1 entry
        _w_string(body, "CQL_VERSION")
        _w_string(body, "3.0.0")
        _send_frame(self.sock, 0x04, OP_STARTUP, body.getvalue())
        opcode, _s, _b = _recv_frame(self.sock)
        if opcode != OP_READY:
            raise ConnectionError(f"STARTUP rejected, opcode {opcode}")

    def close(self) -> None:
        self.sock.close()

    def execute(self, cql: str, values: list | None = None):
        """Run a QUERY frame; returns (column_names, rows) for Rows
        results, ([], []) for Void."""
        body = io.BytesIO()
        _w_longstring(body, cql)
        body.write(struct.pack(">H", CONSISTENCY_ONE))
        if values:
            body.write(struct.pack(">B", 0x01))    # flags: values
            body.write(struct.pack(">H", len(values)))
            for v in values:
                _tid, raw = _encode_value(v)
                body.write(struct.pack(">i", len(raw)))
                body.write(raw)
        else:
            body.write(struct.pack(">B", 0x00))
        _send_frame(self.sock, 0x04, OP_QUERY, body.getvalue())
        opcode, _s, resp = _recv_frame(self.sock)
        if opcode == OP_ERROR:
            code, = struct.unpack_from(">i", resp, 0)
            msg, _ = _r_string(memoryview(resp), 4)
            raise RuntimeError(f"cql error {code}: {msg}")
        if opcode != OP_RESULT:
            raise RuntimeError(f"unexpected opcode {opcode}")
        buf = memoryview(resp)
        kind, = struct.unpack_from(">i", buf, 0)
        if kind != 2:                              # Void/other
            return [], []
        pos = 4
        mflags, n_cols = struct.unpack_from(">ii", buf, pos)
        pos += 8
        if mflags & 0x0002:                        # has_more_pages
            ln, = struct.unpack_from(">i", buf, pos)
            pos += 4 + max(ln, 0)
            raise NotImplementedError(
                "server applied result paging; this client issues "
                "unpaged QUERYs (no page_size flag) — split the scan "
                "by token ranges instead")
        if mflags & 0x0001:                        # global table spec
            _ks, pos = _r_string(buf, pos)
            _tb, pos = _r_string(buf, pos)
        names, types = [], []
        for _ in range(n_cols):
            if not mflags & 0x0001:                # per-column spec
                _ks, pos = _r_string(buf, pos)
                _tb, pos = _r_string(buf, pos)
            name, pos = _r_string(buf, pos)
            tid, = struct.unpack_from(">H", buf, pos)
            pos += 2
            names.append(name)
            types.append(tid)
        n_rows, = struct.unpack_from(">i", buf, pos)
        pos += 4
        rows = []
        for _ in range(n_rows):
            row = []
            for tid in types:
                ln, = struct.unpack_from(">i", buf, pos)
                pos += 4
                raw = None
                if ln >= 0:
                    raw = bytes(buf[pos:pos + ln])
                    pos += ln
                row.append(_decode_value(tid, raw))
            rows.append(tuple(row))
        return names, rows


def cql_write(df: DataFrame, host: str, port: int, table: str,
              pk_col: str) -> None:
    """Executor-side INSERT loop: one CQL connection per partition
    (CassandraSinkBase's per-subtask session), bound values — no CQL
    literal quoting anywhere."""
    cols = df.columns
    cql = (f"INSERT INTO {table} ({', '.join(cols)}) "
           f"VALUES ({', '.join('?' * len(cols))})")

    def send(rows_iter):
        c = CqlClient(host, port)
        try:
            for row in rows_iter:
                c.execute(cql, [row[col] for col in cols])
        finally:
            c.close()
        return iter(())

    df.rdd.mapPartitions(send).count()
    _ = pk_col  # the stub infers the pk from table metadata


def cql_read(spark: SparkSession, host: str, port: int, table: str,
             columns: list[str], pk_col: str, schema: str,
             n_splits: int = 8) -> DataFrame:
    """Parallel full scan by TOKEN RANGES: the LONG ring is split into
    ``n_splits`` half-open ranges and each task runs
    ``SELECT ... WHERE token(pk) > ? AND token(pk) <= ?`` on its own
    connection — the split model of CassandraInputFormat and the
    spark-cassandra-connector."""
    width = (1 << 64) // n_splits
    bounds = [LONG_MIN + i * width for i in range(n_splits)] + [LONG_MAX]
    ranges = list(zip(bounds[:-1], bounds[1:]))
    sel = ", ".join(columns)

    def drain(range_iter):
        for lo, hi in range_iter:
            c = CqlClient(host, port)
            try:
                _names, rows = c.execute(
                    f"SELECT {sel} FROM {table} "
                    f"WHERE token({pk_col}) > ? "
                    f"AND token({pk_col}) <= ?", [lo, hi])
                yield from rows
            finally:
                c.close()

    rdd = (spark.sparkContext
           .parallelize(ranges, n_splits).mapPartitions(drain))
    return spark.createDataFrame(rdd, schema)


# ---------------------------------------------------------------------------
# stub server
# ---------------------------------------------------------------------------

class _CqlHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        srv: StubCqlServer = self.server.cql  # type: ignore
        try:
            opcode, stream, _body = _recv_frame(self.request)
            if opcode != OP_STARTUP:
                return
            _send_frame(self.request, 0x84, OP_READY, b"", stream)
            while True:
                opcode, stream, body = _recv_frame(self.request)
                if opcode != OP_QUERY:
                    return
                try:
                    out = srv.query(memoryview(body))
                    _send_frame(self.request, 0x84, OP_RESULT, out,
                                stream)
                except Exception as e:  # ERROR frame, code 0x2200
                    eb = io.BytesIO()
                    eb.write(struct.pack(">i", 0x2200))
                    _w_string(eb, str(e))
                    _send_frame(self.request, 0x84, OP_ERROR,
                                eb.getvalue(), stream)
        except (ConnectionError, struct.error):
            return


class StubCqlServer:
    """In-memory single-table CQL v4 server: INSERT with bound values,
    SELECT with optional token-range predicate (Murmur3 tokens over
    the FIRST bound column as the partition key)."""

    def __init__(self, table: str, columns: list[str],
                 host: str = "127.0.0.1"):
        self.table = table
        self.columns = columns
        self.rows: dict = {}                      # pk -> tuple
        self.types: list[int] = []
        self.lock = threading.Lock()
        self._server = socketserver.ThreadingTCPServer(
            (host, 0), _CqlHandler)
        self._server.daemon_threads = True
        self._server.cql = self  # type: ignore
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubCqlServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    @staticmethod
    def _pk_bytes(v) -> bytes:
        return _encode_value(v)[1]

    def query(self, buf: memoryview) -> bytes:
        n, = struct.unpack_from(">i", buf, 0)
        cql = bytes(buf[4:4 + n]).decode()
        pos = 4 + n + 2                            # + consistency
        flags = buf[pos]
        pos += 1
        values: list[bytes] = []
        if flags & 0x01:
            cnt, = struct.unpack_from(">H", buf, pos)
            pos += 2
            for _ in range(cnt):
                ln, = struct.unpack_from(">i", buf, pos)
                pos += 4
                values.append(bytes(buf[pos:pos + ln]))
                pos += ln
        low = cql.strip().lower()
        if low.startswith("insert"):
            return self._insert(cql, values)
        if low.startswith("select"):
            return self._select(cql, values)
        raise ValueError(f"unsupported CQL: {cql[:40]}")

    def _insert(self, cql: str, values: list[bytes]) -> bytes:
        cols = [c.strip() for c in
                cql.split("(", 1)[1].split(")", 1)[0].split(",")]
        if cols != self.columns:
            raise ValueError(f"column mismatch: {cols}")
        typed = []
        with self.lock:
            if not self.types:
                # infer per-column wire types from the first insert's
                # value LENGTHS is ambiguous (bigint and double are
                # both 8 bytes) — the stub takes bigint for the pk
                # column and double/varchar by length for the rest,
                # overridable via declare_types for exact fixtures
                self.types = [TYPE_BIGINT] + [
                    TYPE_VARCHAR for _ in self.columns[1:]]
            for tid, raw in zip(self.types, values):
                typed.append(_decode_value(tid, raw))
            self.rows[values[0]] = tuple(typed)
        return self._void()

    def declare_types(self, types: list[int]) -> None:
        self.types = types

    @staticmethod
    def _void() -> bytes:
        return struct.pack(">i", 1)                # kind=Void

    def _select(self, cql: str, values: list[bytes]) -> bytes:
        sel = cql[len("SELECT "):cql.lower().index(" from ")]
        names = [c.strip() for c in sel.split(",")]
        idx = [self.columns.index(c) for c in names]
        lo = hi = None
        if "token" in cql.lower():
            lo = struct.unpack(">q", values[0])[0]
            hi = struct.unpack(">q", values[1])[0]
        with self.lock:
            items = sorted(self.rows.items())
            types = list(self.types)
        picked = []
        for pk_raw, row in items:
            if lo is not None:
                tok = murmur3_token(pk_raw)
                if not (lo < tok <= hi):
                    continue
            picked.append(row)
        out = io.BytesIO()
        out.write(struct.pack(">i", 2))            # kind=Rows
        out.write(struct.pack(">ii", 0x0001, len(names)))  # global spec
        _w_string(out, "ks")
        _w_string(out, self.table)
        for c in names:
            _w_string(out, c)
            out.write(struct.pack(">H", types[self.columns.index(c)]))
        out.write(struct.pack(">i", len(picked)))
        for row in picked:
            for i in idx:
                _tid, raw = _encode_value(row[i])
                out.write(struct.pack(">i", len(raw)))
                out.write(raw)
        return out.getvalue()
