"""Kafka wire-PROTOCOL layer: a pure-Python TCP client (Metadata /
Produce / Fetch) plus an in-process stub broker for loopback tests.

This closes the network half of the Kafka connector to the extent
possible in this container (no external broker): kafka_wire.py
already implements the RecordBatch v2 on-disk/on-wire format with
its mandated CRC-32C; this module adds the REQUEST/RESPONSE protocol
around it — INT32-framed requests, the classic (non-flexible)
header (api_key INT16, api_version INT16, correlation_id INT32,
client_id NULLABLE_STRING), and the fixed-version trio every
consumer needs:

- Metadata v1 (api_key 3): discover topics/partitions/leader.
- Produce  v3 (api_key 0): append RecordBatch v2 frames; the broker
  rebases each batch's baseOffset onto the partition's log end
  (safe to patch in place: the CRC covers attributes onward, and
  baseOffset sits BEFORE the crc field).
- Fetch    v4 (api_key 1): serve concatenated batches from a given
  offset with the partition high watermark.

All layouts are the public Kafka protocol spec
(https://kafka.apache.org/protocol). The stub broker serves the SAME
`<topic>-<partition>.log` files kafka_wire's file-backed topic log
writes, so the wire path and the storage path stay one format — a
loopback integration in the spirit of the embedded-Derby JDBC and
embedded-metastore Hive tests. Deploying against a real cluster
still recommends spark-sql-kafka (sources/connectors.py documents
that path); what the loopback proves is protocol correctness:
framing, correlation ids, error codes, offset bookkeeping, CRC.

Reference: FlinkKafkaConsumer.java:72 (fetch loop / offsets),
FlinkKafkaProducer.java:100 (produce path).

Scale note: ``kafka_net_read`` fetches ON EXECUTORS — the driver
asks Metadata for the partition list, then each task opens its own
socket and drains its partition, exactly the reference's
per-subtask-partition assignment (KafkaTopicPartitionAssigner).
"""

from __future__ import annotations

import io
import json
import os
import socket
import socketserver
import struct
import threading

from pyspark.sql import DataFrame, SparkSession

from .kafka_wire import (ATTR_CONTROL, ATTR_TRANSACTIONAL, CTRL_ABORT,
                         CTRL_COMMIT, LOG_SCHEMA, decode_record_batch,
                         decode_record_batch_meta, encode_control_batch,
                         encode_record_batch)

API_PRODUCE, API_FETCH, API_LIST_OFFSETS, API_METADATA = 0, 1, 2, 3
API_INIT_PRODUCER_ID, API_ADD_PARTITIONS_TO_TXN, API_END_TXN = 22, 24, 26
TS_LATEST, TS_EARLIEST = -1, -2      # ListOffsets sentinel timestamps
ERR_NONE, ERR_UNKNOWN_TOPIC = 0, 3
ERR_INVALID_PRODUCER_EPOCH = 47
READ_UNCOMMITTED, READ_COMMITTED = 0, 1


# ---------------------------------------------------------------------------
# primitive writers/readers (classic, non-flexible encoding)
# ---------------------------------------------------------------------------

def _w_str(out: io.BytesIO, s: str | None) -> None:
    if s is None:
        out.write(struct.pack(">h", -1))
    else:
        b = s.encode()
        out.write(struct.pack(">h", len(b)))
        out.write(b)


def _r_str(buf: memoryview, pos: int) -> tuple[str | None, int]:
    n, = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n < 0:
        return None, pos
    return bytes(buf[pos:pos + n]).decode(), pos + n


def _w_bytes(out: io.BytesIO, b: bytes | None) -> None:
    if b is None:
        out.write(struct.pack(">i", -1))
    else:
        out.write(struct.pack(">i", len(b)))
        out.write(b)


def _r_bytes(buf: memoryview, pos: int) -> tuple[bytes | None, int]:
    n, = struct.unpack_from(">i", buf, pos)
    pos += 4
    if n < 0:
        return None, pos
    return bytes(buf[pos:pos + n]), pos + n


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("kafka peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack(">i", len(payload)) + payload)


def _recv_frame(sock: socket.socket) -> bytes:
    size, = struct.unpack(">i", _recv_exact(sock, 4))
    return _recv_exact(sock, size)


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class KafkaProtocolClient:
    """Minimal real-protocol Kafka client: one TCP connection,
    correlation-id bookkeeping, Metadata v1 / Produce v3 / Fetch v4."""

    def __init__(self, host: str, port: int,
                 client_id: str = "spark-graft"):
        self.sock = socket.create_connection((host, port))
        self.client_id = client_id
        self._corr = 0

    def close(self) -> None:
        self.sock.close()

    def _call(self, api_key: int, api_version: int,
              body: bytes) -> memoryview:
        self._corr += 1
        head = io.BytesIO()
        head.write(struct.pack(">hhi", api_key, api_version, self._corr))
        _w_str(head, self.client_id)
        _send_frame(self.sock, head.getvalue() + body)
        resp = _recv_frame(self.sock)
        corr, = struct.unpack_from(">i", resp, 0)
        if corr != self._corr:
            raise ValueError(
                f"correlation id mismatch: sent {self._corr}, got {corr}")
        return memoryview(resp)[4:]

    def metadata(self, topics: list[str] | None = None):
        """Metadata v1 → {topic: [partition, ...]} (plus broker checks)."""
        body = io.BytesIO()
        if topics is None:
            body.write(struct.pack(">i", -1))     # null array = all topics
        else:
            body.write(struct.pack(">i", len(topics)))
            for t in topics:
                _w_str(body, t)
        buf = self._call(API_METADATA, 1, body.getvalue())
        pos = 0
        n_brokers, = struct.unpack_from(">i", buf, pos)
        pos += 4
        for _ in range(n_brokers):
            pos += 4                               # node_id
            _host, pos = _r_str(buf, pos)
            pos += 4                               # port
            _rack, pos = _r_str(buf, pos)
        pos += 4                                   # controller_id
        n_topics, = struct.unpack_from(">i", buf, pos)
        pos += 4
        out: dict[str, list[int]] = {}
        for _ in range(n_topics):
            err, = struct.unpack_from(">h", buf, pos)
            pos += 2
            name, pos = _r_str(buf, pos)
            pos += 1                               # is_internal
            n_parts, = struct.unpack_from(">i", buf, pos)
            pos += 4
            parts = []
            for _p in range(n_parts):
                perr, part, _leader = struct.unpack_from(">hii", buf, pos)
                pos += 10
                for _arr in range(2):              # replicas, isr
                    n, = struct.unpack_from(">i", buf, pos)
                    pos += 4 + 4 * n
                if perr == ERR_NONE:
                    parts.append(part)
            if err == ERR_NONE:
                out[name] = sorted(parts)
        return out

    def list_offsets(self, topic: str, partition: int,
                     timestamp: int) -> int:
        """ListOffsets v1: the earliest offset whose record timestamp
        is >= the given timestamp — or the log start / log end for
        the TS_EARLIEST / TS_LATEST sentinels. This is the lookup
        behind the reference consumer's startup modes
        (FlinkKafkaConsumerBase.setStartFromTimestamp/-Earliest/
        -Latest, KafkaConsumer#offsetsForTimes)."""
        body = io.BytesIO()
        body.write(struct.pack(">i", -1))          # replica_id
        body.write(struct.pack(">i", 1))
        _w_str(body, topic)
        body.write(struct.pack(">i", 1))
        body.write(struct.pack(">iq", partition, timestamp))
        buf = self._call(API_LIST_OFFSETS, 1, body.getvalue())
        pos = 4                                    # topic count (=1)
        _name, pos = _r_str(buf, pos)
        pos += 4                                   # partition count (=1)
        part, err, _ts, off = struct.unpack_from(">ihqq", buf, pos)
        if err != ERR_NONE:
            raise ValueError(f"list_offsets error {err} on "
                             f"{topic}-{part}")
        return off

    def init_producer_id(self, transactional_id: str | None,
                         timeout_ms: int = 60000) -> tuple[int, int]:
        """InitProducerId v0 → (producer_id, producer_epoch). Re-init
        of the SAME transactional id bumps the epoch — the fencing
        handshake FlinkKafkaProducer relies on to invalidate zombie
        producers after recovery (FlinkKafkaProducer.java:100,
        Semantic.EXACTLY_ONCE)."""
        body = io.BytesIO()
        _w_str(body, transactional_id)
        body.write(struct.pack(">i", timeout_ms))
        buf = self._call(API_INIT_PRODUCER_ID, 0, body.getvalue())
        _throttle, err, pid, epoch = struct.unpack_from(">ihqh", buf, 0)
        if err != ERR_NONE:
            raise ValueError(f"init_producer_id error {err}")
        return pid, epoch

    def add_partitions_to_txn(self, transactional_id: str, pid: int,
                              epoch: int, topic: str,
                              partitions: list[int]) -> None:
        """AddPartitionsToTxn v0: register the partitions this
        transaction will write, so EndTxn knows where markers go."""
        body = io.BytesIO()
        _w_str(body, transactional_id)
        body.write(struct.pack(">qh", pid, epoch))
        body.write(struct.pack(">i", 1))
        _w_str(body, topic)
        body.write(struct.pack(">i", len(partitions)))
        for p in partitions:
            body.write(struct.pack(">i", p))
        buf = self._call(API_ADD_PARTITIONS_TO_TXN, 0, body.getvalue())
        pos = 4 + 4                                # throttle + topics(=1)
        _name, pos = _r_str(buf, pos)
        n_parts, = struct.unpack_from(">i", buf, pos)
        pos += 4
        for _ in range(n_parts):
            _part, err = struct.unpack_from(">ih", buf, pos)
            pos += 6
            if err != ERR_NONE:
                raise ValueError(f"add_partitions_to_txn error {err}")

    def end_txn(self, transactional_id: str, pid: int, epoch: int,
                commit: bool) -> None:
        """EndTxn v0: commit or abort — the broker writes the
        corresponding control marker into every registered
        partition (the transaction's second phase)."""
        body = io.BytesIO()
        _w_str(body, transactional_id)
        body.write(struct.pack(">qhb", pid, epoch, 1 if commit else 0))
        buf = self._call(API_END_TXN, 0, body.getvalue())
        _throttle, err = struct.unpack_from(">ih", buf, 0)
        if err != ERR_NONE:
            raise ValueError(f"end_txn error {err}")

    def produce(self, topic: str, partition: int,
                record_set: bytes,
                transactional_id: str | None = None) -> int:
        """Produce v3 (acks=-1) → base offset assigned by the broker."""
        body = io.BytesIO()
        _w_str(body, transactional_id)
        body.write(struct.pack(">hi", -1, 30000))  # acks, timeout
        body.write(struct.pack(">i", 1))
        _w_str(body, topic)
        body.write(struct.pack(">i", 1))
        body.write(struct.pack(">i", partition))
        _w_bytes(body, record_set)
        buf = self._call(API_PRODUCE, 3, body.getvalue())
        pos = 4                                    # topic array count (=1)
        _name, pos = _r_str(buf, pos)
        pos += 4                                   # partition count (=1)
        part, err, base_offset, _lat = struct.unpack_from(">ihqq", buf,
                                                          pos)
        if err != ERR_NONE:
            raise ValueError(f"produce error {err} on {topic}-{part}")
        return base_offset

    def _fetch_raw(self, topic: str, partition: int, offset: int,
                   max_bytes: int, isolation_level: int):
        """Fetch v4 → (high_watermark, last_stable_offset,
        [(pid, first_offset)], [(base, attrs, pid, records)])."""
        body = io.BytesIO()
        body.write(struct.pack(">iiiib", -1, 100, 1, max_bytes,
                               isolation_level))
        body.write(struct.pack(">i", 1))
        _w_str(body, topic)
        body.write(struct.pack(">i", 1))
        body.write(struct.pack(">iqi", partition, offset, max_bytes))
        buf = self._call(API_FETCH, 4, body.getvalue())
        pos = 4                                    # throttle_time
        pos += 4                                   # topic array count (=1)
        _name, pos = _r_str(buf, pos)
        pos += 4                                   # partition count (=1)
        part, err, hwm, lso = struct.unpack_from(">ihqq", buf, pos)
        pos += 22
        n_aborted, = struct.unpack_from(">i", buf, pos)
        pos += 4
        aborted = []
        for _ in range(max(n_aborted, 0)):
            apid, afirst = struct.unpack_from(">qq", buf, pos)
            pos += 16
            aborted.append((apid, afirst))
        record_set, pos = _r_bytes(buf, pos)
        if err != ERR_NONE:
            raise ValueError(f"fetch error {err} on {topic}-{part}")
        batches = []
        if record_set:
            mv = memoryview(record_set)
            p = 0
            while p < len(mv):
                # a real broker may TRUNCATE the final batch at the
                # request's max_bytes — the consumer contract is to
                # discard the partial tail and re-fetch from the next
                # offset (KafkaConsumer does the same)
                if p + 21 > len(mv):
                    break
                batch_len, = struct.unpack_from(">i", mv, p + 8)
                if p + 12 + batch_len > len(mv):
                    break
                base, attrs, pid, recs, p = decode_record_batch_meta(
                    mv, p)
                batches.append((base, attrs, pid, recs))
        return hwm, lso, aborted, batches

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 24):
        """Fetch v4 READ_UNCOMMITTED → (high_watermark,
        [(offset, ts, key, value), ...]) with every record at
        offset >= the requested one. Control batches are skipped
        (markers are broker bookkeeping, never consumer records)."""
        hwm, _lso, _ab, batches = self._fetch_raw(
            topic, partition, offset, max_bytes, READ_UNCOMMITTED)
        records = []
        for _base, attrs, _pid, recs in batches:
            if attrs & ATTR_CONTROL:
                continue
            records.extend(r for r in recs if r[0] >= offset)
        return hwm, records

    def fetch_committed(self, topic: str, partition: int, offset: int,
                        max_bytes: int = 1 << 24):
        """Fetch v4 READ_COMMITTED → (last_stable_offset, next_offset,
        records): the KafkaConsumer isolation.level=read_committed
        contract. Data batches of ABORTED transactions are dropped
        using the response's aborted-transaction index (a batch from
        producer P is aborted when an index entry (P, first_offset)
        precedes it and P's ABORT marker hasn't passed yet); control
        batches close the spans and are never emitted. next_offset
        advances past FILTERED batches too, so drain loops cannot
        stall on an all-aborted stretch."""
        lso, next_off = None, offset
        hwm, lso, aborted, batches = self._fetch_raw(
            topic, partition, offset, max_bytes, READ_COMMITTED)
        aborted = sorted(aborted, key=lambda t: t[1])
        ai = 0
        aborted_pids: set[int] = set()
        records = []
        for base, attrs, pid, recs in batches:
            while ai < len(aborted) and aborted[ai][1] <= base:
                aborted_pids.add(aborted[ai][0])
                ai += 1
            next_off = max(next_off, base + len(recs))
            if attrs & ATTR_CONTROL:
                if recs and struct.unpack_from(
                        ">hh", recs[0][2], 0)[1] == CTRL_ABORT:
                    aborted_pids.discard(pid)
                continue
            if (attrs & ATTR_TRANSACTIONAL) and pid in aborted_pids:
                continue
            records.extend(r for r in recs if r[0] >= offset)
        return lso, next_off, records


# ---------------------------------------------------------------------------
# stub broker (loopback tests): serves kafka_wire's file topic log
# ---------------------------------------------------------------------------

class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        try:
            while True:
                frame = _recv_frame(self.request)
                buf = memoryview(frame)
                api_key, api_version, corr = struct.unpack_from(
                    ">hhi", buf, 0)
                _cid, pos = _r_str(buf, 8)
                body = buf[pos:]
                srv: StubKafkaBroker = self.server.broker  # type: ignore
                if api_key == API_METADATA:
                    out = srv.handle_metadata(body)
                elif api_key == API_PRODUCE:
                    out = srv.handle_produce(body)
                elif api_key == API_FETCH:
                    out = srv.handle_fetch(body)
                elif api_key == API_LIST_OFFSETS:
                    out = srv.handle_list_offsets(body)
                elif api_key == API_INIT_PRODUCER_ID:
                    out = srv.handle_init_producer_id(body)
                elif api_key == API_ADD_PARTITIONS_TO_TXN:
                    out = srv.handle_add_partitions_to_txn(body)
                elif api_key == API_END_TXN:
                    out = srv.handle_end_txn(body)
                else:
                    raise ValueError(f"unsupported api_key {api_key}")
                _send_frame(self.request, struct.pack(">i", corr) + out)
        except (ConnectionError, struct.error):
            return                                 # client hung up


class StubKafkaBroker:
    """In-process broker speaking the same three request types over a
    real TCP socket, backed by kafka_wire's `<topic>-<p>.log` files.
    Offset bookkeeping is real: produce rebases the incoming batch's
    baseOffset onto the partition's current log end offset, fetch
    reports the high watermark."""

    def __init__(self, log_dir: str, host: str = "127.0.0.1"):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._lock = threading.Lock()
        # transaction-coordinator state (the subset a single-broker
        # cluster needs): transactional_id -> producer id, CURRENT
        # epoch per pid (fencing), and the partitions each open
        # transaction registered (where EndTxn writes markers).
        # The LOG stays the single source of truth for visibility:
        # aborted/open spans are recomputed from the control batches
        # in the segment files, never from coordinator memory.
        self._txn_pid: dict[str, int] = {}
        self._pid_epoch: dict[int, int] = {}
        self._txn_parts: dict[str, set[tuple[str, int]]] = {}
        self._next_pid = 1000
        self._server = socketserver.ThreadingTCPServer(
            (host, 0), _Handler)
        self._server.daemon_threads = True
        self._server.broker = self                 # type: ignore
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubKafkaBroker":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- log helpers --------------------------------------------------
    def _path(self, topic: str, partition: int) -> str:
        return os.path.join(self.log_dir, f"{topic}-{partition}.log")

    def _log_end(self, raw: bytes) -> int:
        mv, pos, end = memoryview(raw), 0, 0
        while pos < len(mv):
            base, recs, pos = decode_record_batch(mv, pos)
            end = base + len(recs)
        return end

    def _partitions(self, topic: str) -> list[int]:
        pre = f"{topic}-"
        return sorted(
            int(f[len(pre):-4]) for f in os.listdir(self.log_dir)
            if f.startswith(pre) and f.endswith(".log")
            and f[len(pre):-4].isdigit())

    # -- request handlers ---------------------------------------------
    def handle_metadata(self, body: memoryview) -> bytes:
        n, = struct.unpack_from(">i", body, 0)
        pos = 4
        names: list[str] = []
        for _ in range(max(n, 0)):
            s, pos = _r_str(body, pos)
            names.append(s)
        if n < 0:                                  # null array = all
            names = sorted({f.rsplit("-", 1)[0]
                            for f in os.listdir(self.log_dir)
                            if f.endswith(".log")})
        out = io.BytesIO()
        out.write(struct.pack(">i", 1))            # one broker: me
        out.write(struct.pack(">i", 0))
        _w_str(out, self.host)
        out.write(struct.pack(">i", self.port))
        _w_str(out, None)                          # rack
        out.write(struct.pack(">i", 0))            # controller_id
        out.write(struct.pack(">i", len(names)))
        for name in names:
            parts = self._partitions(name)
            err = ERR_NONE if parts else ERR_UNKNOWN_TOPIC
            out.write(struct.pack(">h", err))
            _w_str(out, name)
            out.write(struct.pack(">b", 0))        # is_internal
            out.write(struct.pack(">i", len(parts)))
            for p in parts:
                out.write(struct.pack(">hii", ERR_NONE, p, 0))
                out.write(struct.pack(">ii", 1, 0))   # replicas [0]
                out.write(struct.pack(">ii", 1, 0))   # isr [0]
        return out.getvalue()

    def _txn_scan(self, raw: bytes):
        """Walk a partition log → (aborted
        [(pid, first_offset, marker_offset)], open
        {pid: first_offset}). A transactional data batch opens a span
        for its producer; the next control marker for that producer
        closes it (ABORT → the span joins the aborted index served to
        READ_COMMITTED fetches). The marker offset is kept so a fetch
        can serve only spans OVERLAPPING its range — the real
        broker's .txnindex does the same; returning spans that ended
        below the fetch offset would leave the consumer's
        aborted-producer set stuck (its cancelling marker is never
        served) and silently drop later COMMITTED batches. The log IS
        the index."""
        mv, pos = memoryview(raw), 0
        open_txn: dict[int, int] = {}
        aborted: list[tuple[int, int, int]] = []
        while pos < len(mv):
            base, attrs, pid, recs, pos = decode_record_batch_meta(
                mv, pos)
            if attrs & ATTR_CONTROL:
                first = open_txn.pop(pid, None)
                if first is not None and struct.unpack_from(
                        ">hh", recs[0][2], 0)[1] == CTRL_ABORT:
                    aborted.append((pid, first, base))
            elif attrs & ATTR_TRANSACTIONAL:
                open_txn.setdefault(pid, base)
        return aborted, open_txn

    def handle_list_offsets(self, body: memoryview) -> bytes:
        pos = 4                                    # replica_id
        n_topics, = struct.unpack_from(">i", body, pos)
        pos += 4
        out = io.BytesIO()
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic, pos = _r_str(body, pos)
            n_parts, = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out.write(struct.pack(">i", n_parts))
            for _p in range(n_parts):
                part, ts = struct.unpack_from(">iq", body, pos)
                pos += 12
                path = self._path(topic, part)
                if not os.path.exists(path):
                    out.write(struct.pack(">ihqq", part,
                                          ERR_UNKNOWN_TOPIC, -1, -1))
                    continue
                with self._lock:
                    raw = open(path, "rb").read()
                if ts == TS_EARLIEST:
                    off, hit_ts = 0, -1
                else:
                    end = self._log_end(raw)
                    if ts == TS_LATEST:
                        off, hit_ts = end, -1
                    else:
                        # earliest record with timestamp >= ts
                        # (KafkaConsumer#offsetsForTimes semantics);
                        # no match -> offset -1, as the real broker
                        off, hit_ts = -1, -1
                        mv, p = memoryview(raw), 0
                        while p < len(mv):
                            base, attrs, _pid, recs, p = \
                                decode_record_batch_meta(mv, p)
                            if attrs & ATTR_CONTROL:
                                continue
                            for o, rts, _k, _v in recs:
                                if rts >= ts and (off < 0 or o < off):
                                    off, hit_ts = o, rts
                                    break
                            if off >= 0:
                                break
                out.write(struct.pack(">ihqq", part, ERR_NONE,
                                      hit_ts, off))
        return out.getvalue()

    def handle_init_producer_id(self, body: memoryview) -> bytes:
        txn_id, pos = _r_str(body, 0)
        with self._lock:
            if txn_id is None:            # idempotent-only producer
                pid = self._next_pid
                self._next_pid += 1
                epoch = 0
            else:
                pid = self._txn_pid.get(txn_id)
                if pid is None:
                    pid = self._next_pid
                    self._next_pid += 1
                    self._txn_pid[txn_id] = pid
                    epoch = 0
                else:
                    # re-initialization BUMPS the epoch: any zombie
                    # still producing with the old epoch is fenced.
                    # It also ABORTS a transaction the previous
                    # incarnation left open — the recovery contract
                    # (KIP-98: InitPidRequest "completes/aborts any
                    # transaction left incomplete"); this is what
                    # lets a restarted 2PC sink reuse its
                    # transactional id and rewrite the batch without
                    # leaking the crashed attempt's rows
                    old_epoch = self._pid_epoch[pid]
                    for topic, part in sorted(
                            self._txn_parts.pop(txn_id, set())):
                        path = self._path(topic, part)
                        raw = (open(path, "rb").read()
                               if os.path.exists(path) else b"")
                        ctrl = encode_control_batch(
                            self._log_end(raw), CTRL_ABORT, pid,
                            old_epoch)
                        with open(path, "ab") as fh:
                            fh.write(ctrl)
                    epoch = old_epoch + 1
            self._pid_epoch[pid] = epoch
        return struct.pack(">ihqh", 0, ERR_NONE, pid, epoch)

    def handle_add_partitions_to_txn(self, body: memoryview) -> bytes:
        txn_id, pos = _r_str(body, 0)
        pid, epoch = struct.unpack_from(">qh", body, pos)
        pos += 10
        n_topics, = struct.unpack_from(">i", body, pos)
        pos += 4
        out = io.BytesIO()
        out.write(struct.pack(">i", 0))            # throttle_time
        out.write(struct.pack(">i", n_topics))
        with self._lock:
            fenced = (self._txn_pid.get(txn_id) != pid
                      or self._pid_epoch.get(pid) != epoch)
            err = ERR_INVALID_PRODUCER_EPOCH if fenced else ERR_NONE
            for _ in range(n_topics):
                topic, pos = _r_str(body, pos)
                n_parts, = struct.unpack_from(">i", body, pos)
                pos += 4
                _w_str(out, topic)
                out.write(struct.pack(">i", n_parts))
                for _p in range(n_parts):
                    part, = struct.unpack_from(">i", body, pos)
                    pos += 4
                    if not fenced:
                        self._txn_parts.setdefault(txn_id, set()).add(
                            (topic, part))
                    out.write(struct.pack(">ih", part, err))
        return out.getvalue()

    def handle_end_txn(self, body: memoryview) -> bytes:
        txn_id, pos = _r_str(body, 0)
        pid, epoch, committed = struct.unpack_from(">qhb", body, pos)
        with self._lock:
            if (self._txn_pid.get(txn_id) != pid
                    or self._pid_epoch.get(pid) != epoch):
                return struct.pack(">ih", 0,
                                   ERR_INVALID_PRODUCER_EPOCH)
            marker = CTRL_COMMIT if committed else CTRL_ABORT
            for topic, part in sorted(
                    self._txn_parts.pop(txn_id, set())):
                path = self._path(topic, part)
                raw = (open(path, "rb").read()
                       if os.path.exists(path) else b"")
                ctrl = encode_control_batch(self._log_end(raw), marker,
                                            pid, epoch)
                with open(path, "ab") as fh:
                    fh.write(ctrl)
        return struct.pack(">ih", 0, ERR_NONE)

    def handle_produce(self, body: memoryview) -> bytes:
        txn_id, pos = _r_str(body, 0)
        _acks, _timeout = struct.unpack_from(">hi", body, pos)
        pos += 6
        n_topics, = struct.unpack_from(">i", body, pos)
        pos += 4
        out = io.BytesIO()
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic, pos = _r_str(body, pos)
            n_parts, = struct.unpack_from(">i", body, pos)
            pos += 4
            out_parts = []
            for _p in range(n_parts):
                part, = struct.unpack_from(">i", body, pos)
                pos += 4
                record_set, pos = _r_bytes(body, pos)
                with self._lock:
                    # transactional guards BEFORE any append: a
                    # zombie producer (stale epoch after a re-init)
                    # is fenced with INVALID_PRODUCER_EPOCH, and a
                    # transactional batch for a partition the txn
                    # never registered is rejected (the coordinator
                    # could not place its marker)
                    err, p = ERR_NONE, 0
                    while p < len(record_set):
                        blen, = struct.unpack_from(">i", record_set,
                                                   p + 8)
                        attrs, = struct.unpack_from(">h", record_set,
                                                    p + 21)
                        bpid, bepoch = struct.unpack_from(
                            ">qh", record_set, p + 43)
                        if (bpid >= 0 and
                                self._pid_epoch.get(bpid, bepoch)
                                > bepoch):
                            err = ERR_INVALID_PRODUCER_EPOCH
                        elif (attrs & ATTR_TRANSACTIONAL
                              and txn_id is not None
                              and (topic, part) not in
                              self._txn_parts.get(txn_id, set())):
                            err = 48      # INVALID_TXN_STATE
                        p += 12 + blen
                    if err != ERR_NONE:
                        out_parts.append((part, err, -1, -1))
                        continue
                    path = self._path(topic, part)
                    raw = (open(path, "rb").read()
                           if os.path.exists(path) else b"")
                    base = self._log_end(raw)
                    # A produce record_set may legally carry SEVERAL
                    # concatenated RecordBatch v2 frames; rebase EACH
                    # batch's baseOffset onto the running log end so
                    # the log stays offset-monotonic. baseOffset
                    # precedes the crc field, which covers attributes
                    # onward only, so patching it keeps the CRC valid.
                    patched, p, nxt = io.BytesIO(), 0, base
                    while p < len(record_set):
                        blen, = struct.unpack_from(">i", record_set,
                                                   p + 8)
                        last_delta, = struct.unpack_from(
                            ">i", record_set, p + 23)
                        span = 12 + blen
                        patched.write(struct.pack(">q", nxt))
                        patched.write(record_set[p + 8:p + span])
                        nxt += last_delta + 1
                        p += span
                    with open(path, "ab") as fh:
                        fh.write(patched.getvalue())
                out_parts.append((part, ERR_NONE, base, -1))
            _w_str(out, topic)
            out.write(struct.pack(">i", len(out_parts)))
            for part, err, base, lat in out_parts:
                out.write(struct.pack(">ihqq", part, err, base, lat))
        out.write(struct.pack(">i", 0))            # throttle_time
        return out.getvalue()

    def handle_fetch(self, body: memoryview) -> bytes:
        isolation, = struct.unpack_from(">b", body, 16)
        pos = 4 + 4 + 4 + 4 + 1                    # fixed fetch prefix
        n_topics, = struct.unpack_from(">i", body, pos)
        pos += 4
        out = io.BytesIO()
        out.write(struct.pack(">i", 0))            # throttle_time
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic, pos = _r_str(body, pos)
            n_parts, = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out.write(struct.pack(">i", n_parts))
            for _p in range(n_parts):
                part, offset, _maxb = struct.unpack_from(">iqi", body,
                                                         pos)
                pos += 16
                path = self._path(topic, part)
                if not os.path.exists(path):
                    out.write(struct.pack(">ihqq", part,
                                          ERR_UNKNOWN_TOPIC, -1, -1))
                    out.write(struct.pack(">i", 0))
                    _w_bytes(out, None)
                    continue
                with self._lock:
                    raw = open(path, "rb").read()
                hwm = self._log_end(raw)
                if isolation == READ_COMMITTED:
                    # visibility is recomputed from the log's control
                    # batches: LSO = first offset of the earliest
                    # OPEN transaction (read_committed fetches stop
                    # there); only aborted spans OVERLAPPING the
                    # fetched range are served — a span whose marker
                    # sits below the fetch offset is history the
                    # consumer must not see (its cancelling marker
                    # would never arrive)
                    aborted, open_txn = self._txn_scan(raw)
                    lso = min(open_txn.values(), default=hwm)
                    ceiling = lso
                    served_aborted = [(apid, afirst) for
                                      apid, afirst, amark in aborted
                                      if amark >= offset]
                else:
                    # read_uncommitted never consults the index;
                    # skip the full-log transaction scan entirely
                    lso, ceiling, served_aborted = hwm, hwm, []
                # serve every batch whose LAST offset >= the request
                # and (read_committed) whose base is below the LSO
                mv, p, chunks = memoryview(raw), 0, []
                while p < len(mv):
                    start = p
                    base, recs, p = decode_record_batch(mv, p)
                    if (base + len(recs) - 1 >= offset
                            and base < ceiling):
                        chunks.append(bytes(mv[start:p]))
                out.write(struct.pack(">ihqq", part, ERR_NONE, hwm,
                                      lso))
                out.write(struct.pack(">i", len(served_aborted)))
                for apid, afirst in served_aborted:
                    out.write(struct.pack(">qq", apid, afirst))
                _w_bytes(out, b"".join(chunks) or None)
        return out.getvalue()


# ---------------------------------------------------------------------------
# Spark integration: executor-side fetch
# ---------------------------------------------------------------------------

def kafka_net_read(spark: SparkSession, host: str, port: int,
                   topic: str,
                   isolation_level: int = READ_UNCOMMITTED,
                   start_from: str | int = "earliest") -> DataFrame:
    """Batch-read a topic OVER THE WIRE into the Kafka source schema
    (partition, offset, timestamp, key, value): the driver asks
    Metadata for the partition list, then one task per partition
    opens its own connection and drains [0, high-watermark) — the
    reference's per-subtask partition assignment
    (KafkaTopicPartitionAssigner), and the shape that scales (no
    record bytes ever pass through the driver).

    isolation_level=READ_COMMITTED drains to the LAST STABLE OFFSET
    instead, dropping aborted transactions' batches — the consumer
    half of the reference's end-to-end exactly-once story
    (FlinkKafkaConsumer paired with an EXACTLY_ONCE producer reads
    with isolation.level=read_committed).

    start_from maps the reference consumer's startup modes
    (FlinkKafkaConsumerBase.setStartFromEarliest/-Latest/
    -Timestamp): "earliest", "latest" (an empty batch read — the
    streaming tail would start here), or an int timestamp-ms
    resolved per partition through ListOffsets."""
    cli = KafkaProtocolClient(host, port)
    try:
        parts = cli.metadata([topic]).get(topic, [])
    finally:
        cli.close()

    def _start_offset(c, part: int) -> int:
        if start_from == "earliest":
            return 0
        if start_from == "latest":
            return c.list_offsets(topic, part, TS_LATEST)
        off = c.list_offsets(topic, part, int(start_from))
        if off < 0:                 # no record at/after the timestamp
            return c.list_offsets(topic, part, TS_LATEST)
        return off

    def drain(part_iter):
        for part in part_iter:
            c = KafkaProtocolClient(host, port)
            try:
                offset = _start_offset(c, part)
                if isolation_level == READ_COMMITTED:
                    while True:
                        lso, next_off, records = c.fetch_committed(
                            topic, part, offset)
                        for off, ts, key, value in records:
                            yield (part, off, ts, key, value)
                        if next_off == offset or next_off >= lso:
                            break
                        offset = next_off
                else:
                    while True:
                        hwm, records = c.fetch(topic, part, offset)
                        for off, ts, key, value in records:
                            yield (part, off, ts, key, value)
                        if records:
                            offset = records[-1][0] + 1
                        if offset >= hwm or not records:
                            break
            finally:
                c.close()

    rdd = (spark.sparkContext
           .parallelize(parts, max(len(parts), 1)).mapPartitions(drain))
    return spark.createDataFrame(rdd, LOG_SCHEMA)


def kafka_txn_write(df: DataFrame, host: str, port: int, topic: str,
                    transactional_id_prefix: str, commit: bool = True,
                    batch_size: int = 1000) -> int:
    """Transactional EXACTLY-ONCE produce over the wire — the
    reference's FlinkKafkaProducer.Semantic.EXACTLY_ONCE mapped to
    Spark's task model (FlinkKafkaProducer.java:100; the 2PC contract
    of TwoPhaseCommitSinkFunction): each task owns ONE transactional
    id (prefix + partition index, the reference's per-subtask id
    pool), runs InitProducerId (acquiring a fenced epoch),
    AddPartitionsToTxn, produces its rows as TRANSACTIONAL
    RecordBatch v2 frames with monotonically increasing
    baseSequence, and EndTxns with commit/abort. Until the commit
    marker lands, a read_committed consumer sees NOTHING from this
    transaction; an abort makes the written bytes permanently
    invisible (the atomicity the 2PC sink needs across restarts).
    df columns: (timestamp bigint, key binary, value binary).
    Returns the number of produced records."""

    def write_part(ix: int, rows):
        c = KafkaProtocolClient(host, port)
        try:
            txn_id = f"{transactional_id_prefix}-{ix}"
            pid, epoch = c.init_producer_id(txn_id)
            c.add_partitions_to_txn(txn_id, pid, epoch, topic, [ix])
            n, _seq = _produce_rows(c, topic, ix, txn_id, pid, epoch,
                                    rows, batch_size)
            c.end_txn(txn_id, pid, epoch, commit)
            yield n
        finally:
            c.close()

    counts = (df.select("timestamp", "key", "value").rdd
              .mapPartitionsWithIndex(write_part).collect())
    return int(sum(counts))


def _produce_rows(c: KafkaProtocolClient, topic: str, ix: int,
                  txn_id: str, pid: int, epoch: int, rows,
                  batch_size: int) -> tuple[int, int]:
    """Shared transactional produce loop: buffer (timestamp, key,
    value) rows into RecordBatch v2 frames with a monotonically
    increasing baseSequence. Returns (rows_produced, next_sequence)
    so a caller can append further batches (e.g. the idempotence
    marker) in the same transaction."""
    n, seq, buf = 0, 0, []

    def flush():
        nonlocal seq
        if not buf:
            return
        batch = encode_record_batch(
            0, buf, attributes=ATTR_TRANSACTIONAL,
            producer_id=pid, producer_epoch=epoch, base_sequence=seq)
        c.produce(topic, ix, batch, transactional_id=txn_id)
        seq += len(buf)
        buf.clear()

    for row in rows:
        buf.append((row.timestamp,
                    bytes(row.key) if row.key is not None else None,
                    bytes(row.value) if row.value is not None
                    else None))
        n += 1
        if len(buf) >= batch_size:
            flush()
    flush()
    return n, seq


def _scan_marker_partition(c: "KafkaProtocolClient", marker_topic: str,
                           part: int):
    """All committed marker records of one marker partition
    (UNKNOWN_TOPIC = partition never written = no markers). Drains
    page by page — marker partitions accumulate one record per
    micro-batch epoch, so a long-running sink's log can exceed one
    fetch response (advisor r13: the inline loop once forgot to
    advance the offset and refetched page 0 forever)."""
    out, off = [], 0
    while True:
        try:
            lso, nxt, recs = c.fetch_committed(marker_topic, part, off)
        except ValueError as e:
            # ONLY "no marker partition yet" may be read as
            # "no marker": any other fetch error must abort
            # the attempt, not silently conclude the previous
            # attempt never committed (that would duplicate)
            if f"error {ERR_UNKNOWN_TOPIC} " in str(e):
                return out
            raise
        out.extend(recs)
        if nxt == off or nxt >= lso:
            return out
        off = nxt


def _check_marker_layout(payload: bytes, num_parts: int) -> None:
    """Verify a committed marker's recorded partition count against
    this attempt's. Markers written by the pre-layout-check code
    version carried str(n) payloads (e.g. b"42") — surface that
    format problem explicitly instead of an AttributeError deep in
    json handling (advisor r13)."""
    meta = json.loads(payload.decode())
    if not isinstance(meta, dict):
        raise RuntimeError(
            "kafka_txn_write_idempotent: marker payload is a "
            f"legacy scalar ({meta!r}), not a layout record — "
            "cannot verify the prior attempt's partition count; "
            "refusing to write (drain/recreate the marker topic "
            "to upgrade)")
    if meta.get("parts") != num_parts:
        raise RuntimeError(
            f"kafka_txn_write_idempotent: replay partition "
            f"layout changed — prior attempt committed with "
            f"{meta.get('parts')} partitions, this attempt has "
            f"{num_parts}; task-index marker dedup cannot align "
            "them, refusing to write (duplicates otherwise)")


def kafka_txn_write_idempotent(df: DataFrame, host: str, port: int,
                               topic: str, transactional_id_prefix: str,
                               batch_size: int = 1000) -> int:
    """Exactly-once transactional produce that is SAFE TO REPLAY with
    the same transactional_id_prefix — the property a streaming 2PC
    sink needs when a micro-batch can be re-attempted after a crash
    (TwoPhaseCommitSinkFunction.java's recoverAndCommit contract).

    Mechanism: each task's transaction writes its data rows AND one
    marker record (key = the task's transactional id) to a sibling
    `<topic>__markers` partition IN THE SAME TRANSACTION. Kafka
    transactions are atomic across topic-partitions, so the marker is
    read_committed-visible IFF the data committed. A replay first
    checks the marker: present → the previous attempt committed,
    skip (NO duplicate); absent → the previous attempt either never
    committed or left an open transaction, which InitProducerId
    aborts before the rewrite (no partial leak). There is no crash
    window: commit and marker are one atomic decision, unlike the
    commit-then-record pattern whose failure between the two steps
    duplicates. Assumes Spark's deterministic batch replay (same
    micro-batch id → same rows), the planner's standard
    foreachBatch idempotence contract.

    The marker payload records the attempt's PARTITION COUNT, and
    every task verifies it (against its own marker, and — when its
    own partition has none — against partition 0's, the canonical
    layout record): dedup is keyed on the task index, so a replay
    that materializes with a different partition count or
    row-to-partition mapping would silently misalign markers and
    duplicate or drop rows (advisor r12). A detected layout change
    fails the batch LOUDLY instead; same-layout replay is the
    deterministic-replay contract this sink documents.

    Returns the number of records written by THIS call (0 for a
    fully-skipped replay)."""
    marker_topic = f"{topic}__markers"
    num_parts = df.rdd.getNumPartitions()

    def scan_markers(c: "KafkaProtocolClient", part: int):
        return _scan_marker_partition(c, marker_topic, part)

    def check_layout(payload: bytes) -> None:
        _check_marker_layout(payload, num_parts)

    def write_part(ix: int, rows):
        c = KafkaProtocolClient(host, port)
        try:
            txn_id = f"{transactional_id_prefix}-{ix}"
            key = txn_id.encode()
            # committed marker present -> this task already landed
            mine = [v for _o, _t, k, v in scan_markers(c, ix)
                    if k == key]
            if mine:
                check_layout(mine[0])
                yield 0
                return
            if ix != 0:
                # no marker for THIS index — but a prior attempt with
                # FEWER partitions would have left this partition
                # empty while its partition-0 marker records the old
                # layout; probe it so the mismatch fails loudly here
                # too instead of double-writing
                prefix_key = f"{transactional_id_prefix}-0".encode()
                for _o, _t, k, v in scan_markers(c, 0):
                    if k == prefix_key:
                        check_layout(v)
            pid, epoch = c.init_producer_id(txn_id)   # aborts orphans
            c.add_partitions_to_txn(txn_id, pid, epoch, topic, [ix])
            c.add_partitions_to_txn(txn_id, pid, epoch, marker_topic,
                                    [ix])
            n, seq = _produce_rows(c, topic, ix, txn_id, pid, epoch,
                                   rows, batch_size)
            marker_payload = json.dumps(
                {"rows": n, "parts": num_parts}).encode()
            marker = encode_record_batch(
                0, [(0, key, marker_payload)],
                attributes=ATTR_TRANSACTIONAL, producer_id=pid,
                producer_epoch=epoch, base_sequence=seq)
            c.produce(marker_topic, ix, marker,
                      transactional_id=txn_id)
            c.end_txn(txn_id, pid, epoch, True)
            yield n
        finally:
            c.close()

    counts = (df.select("timestamp", "key", "value").rdd
              .mapPartitionsWithIndex(write_part).collect())
    return int(sum(counts))


def kafka_txn_sink_stream(stream_df: DataFrame, host: str, port: int,
                          topic: str, sink_id: str,
                          checkpoint_dir: str):
    """Streaming exactly-once Kafka sink — the reference's
    FlinkKafkaProducer EXACTLY_ONCE as a Structured Streaming sink:
    each micro-batch commits through kafka_txn_write_idempotent with
    a (sink, epoch)-scoped transactional-id prefix, so a batch
    replayed after a crash/restart lands EXACTLY ONCE (marker-in-
    transaction dedup), and a batch whose first attempt died
    mid-write leaks nothing (orphan abort on re-init). Returns the
    started StreamingQuery."""
    def write_batch(df, epoch_id):
        kafka_txn_write_idempotent(df, host, port, topic,
                                   f"{sink_id}-e{epoch_id}")

    return (stream_df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir).start())
