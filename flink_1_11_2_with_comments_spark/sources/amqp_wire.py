"""RabbitMQ connector over its REAL protocol: AMQP 0-9-1 framing.

flink-connector-rabbitmq drives the RabbitMQ Java client, whose wire
format is the public AMQP 0-9-1 spec. This module implements the
subset the reference's RMQSource/RMQSink exercise, in pure stdlib:

- the protocol header + Connection.Start/StartOk (PLAIN auth) /
  Tune/TuneOk/Open/OpenOk negotiation and Channel.Open,
- Queue.Declare / DeclareOk,
- Basic.Publish with content HEADER + BODY frames (the 3-frame
  message shape the spec mandates),
- Basic.Get / GetOk / GetEmpty (pull consumption — RMQSource's
  at-least-once polling shape without consumer tags).

Framing: type(1) channel(2) size(4) payload frame-end(0xCE); method
payloads are class-id(2) method-id(2) + spec-typed arguments
(shortstr, longstr, short/long/longlong, bit-packed octets, field
tables — empty tables are spec-valid and all this subset needs).

``amqp_bridge_to_kafka_log`` realizes the DOCUMENTED deployment
pattern for Spark (no Spark AMQP connector exists first- or
second-party): drain a queue over real AMQP frames into the
kafka_wire file topic log, which Structured Streaming then tails —
AMQP in, replayable partitioned log out. The in-process stub broker
answers the same frames over real sockets for the loopback tests.
"""

from __future__ import annotations

import io
import os
import socket
import socketserver
import struct
import threading
import time

FRAME_METHOD, FRAME_HEADER, FRAME_BODY = 1, 2, 3
FRAME_END = 0xCE
FRAME_MAX = 131072  # the stub broker's advertised (and ENFORCED) max
PROTO_HEADER = b"AMQP\x00\x00\x09\x01"


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("amqp peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def _send(sock: socket.socket, ftype: int, channel: int,
          payload: bytes) -> None:
    sock.sendall(struct.pack(">BHI", ftype, channel, len(payload))
                 + payload + bytes([FRAME_END]))


def _recv(sock: socket.socket, frame_max: int = 0):
    ftype, channel, size = struct.unpack(">BHI", _recv_exact(sock, 7))
    if frame_max and size + 8 > frame_max:
        # spec §4.2.6: a frame above the negotiated frame_max is a
        # protocol violation — a real broker closes the connection
        raise ConnectionError(
            f"frame of {size + 8} bytes exceeds negotiated "
            f"frame_max {frame_max}")
    payload = _recv_exact(sock, size)
    if _recv_exact(sock, 1)[0] != FRAME_END:
        raise ConnectionError("missing AMQP frame-end octet")
    return ftype, channel, payload


def _shortstr(s: str) -> bytes:
    b = s.encode()
    return bytes([len(b)]) + b


def _longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def _r_shortstr(buf: memoryview, pos: int) -> tuple[str, int]:
    n = buf[pos]
    pos += 1
    return bytes(buf[pos:pos + n]).decode(), pos + n


def _r_longstr(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, = struct.unpack_from(">I", buf, pos)
    pos += 4
    return bytes(buf[pos:pos + n]), pos + n


def _method(cls: int, mth: int, args: bytes = b"") -> bytes:
    return struct.pack(">HH", cls, mth) + args


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class AmqpClient:
    """AMQP 0-9-1 client: negotiate, open channel 1, declare queues,
    publish (method+header+body frames) and Basic.Get-poll."""

    def __init__(self, host: str, port: int, user: str = "guest",
                 password: str = "guest", vhost: str = "/"):
        self.sock = socket.create_connection((host, port))
        self.sock.sendall(PROTO_HEADER)
        cls, mth, _args = self._expect_method()       # Connection.Start
        if (cls, mth) != (10, 10):
            raise ConnectionError(f"expected Connection.Start, got "
                                  f"{cls}.{mth}")
        plain = b"\x00" + user.encode() + b"\x00" + password.encode()
        self._send_method(0, 10, 11, struct.pack(">I", 0)   # empty table
                          + _shortstr("PLAIN") + _longstr(plain)
                          + _shortstr("en_US"))
        cls, mth, args = self._expect_method()           # Connection.Tune
        if (cls, mth) != (10, 30):
            raise ConnectionError("expected Connection.Tune")
        chan_max, frame_max, heartbeat = struct.unpack_from(">HIH",
                                                            args, 0)
        # negotiated frame_max binds BOTH directions; 0 = no limit
        self.frame_max = frame_max
        self._send_method(0, 10, 31, struct.pack(">HIH", chan_max,
                                                 frame_max, heartbeat))
        self._send_method(0, 10, 40, _shortstr(vhost) + _shortstr("")
                          + b"\x00")
        cls, mth, _ = self._expect_method()              # Connection.OpenOk
        if (cls, mth) != (10, 41):
            raise ConnectionError("expected Connection.OpenOk")
        self._send_method(1, 20, 10, _shortstr(""))      # Channel.Open
        cls, mth, _ = self._expect_method()
        if (cls, mth) != (20, 11):
            raise ConnectionError("expected Channel.OpenOk")

    def close(self) -> None:
        self.sock.close()

    def _send_method(self, channel: int, cls: int, mth: int,
                     args: bytes = b"") -> None:
        _send(self.sock, FRAME_METHOD, channel, _method(cls, mth, args))

    def _expect_method(self):
        ftype, _ch, payload = _recv(self.sock)
        if ftype != FRAME_METHOD:
            raise ConnectionError(f"expected method frame, got {ftype}")
        cls, mth = struct.unpack_from(">HH", payload, 0)
        return cls, mth, payload[4:]

    def declare_queue(self, queue: str) -> int:
        """Queue.Declare → message count currently in the queue."""
        self._send_method(1, 50, 10, struct.pack(">H", 0)
                          + _shortstr(queue) + b"\x00"   # no flag bits
                          + struct.pack(">I", 0))        # empty table
        cls, mth, args = self._expect_method()
        if (cls, mth) != (50, 11):
            raise ConnectionError("expected Queue.DeclareOk")
        buf = memoryview(args)
        _q, pos = _r_shortstr(buf, 0)
        n_msgs, _n_consumers = struct.unpack_from(">II", buf, pos)
        return n_msgs

    def publish(self, queue: str, body: bytes) -> None:
        """Basic.Publish via the default exchange (routing key =
        queue name) — method, content header, content body frames.

        A body larger than the NEGOTIATED frame_max must be split
        into multiple body frames (spec §4.2.6: a peer sending a
        frame above frame_max is a protocol violation — a real
        broker closes the connection); each body frame's payload is
        capped at frame_max minus the 8 bytes of frame overhead
        (7-byte header + frame-end octet), mirroring get()'s
        multi-frame reassembly."""
        self._send_method(1, 60, 40, struct.pack(">H", 0)
                          + _shortstr("") + _shortstr(queue) + b"\x00")
        header = (struct.pack(">HHQ", 60, 0, len(body))
                  + struct.pack(">H", 0))                # no properties
        _send(self.sock, FRAME_HEADER, 1, header)
        max_payload = (self.frame_max - 8 if self.frame_max
                       else len(body) or 1)
        # spec: body-size 0 carries ZERO body frames
        for i in range(0, len(body), max_payload):
            _send(self.sock, FRAME_BODY, 1, body[i:i + max_payload])

    def get(self, queue: str) -> bytes | None:
        """Basic.Get (no-ack) → one message body, or None when the
        queue is empty (Basic.GetEmpty)."""
        self._send_method(1, 60, 70, struct.pack(">H", 0)
                          + _shortstr(queue) + b"\x01")  # no-ack
        cls, mth, _args = self._expect_method()
        if (cls, mth) == (60, 72):                       # Basic.GetEmpty
            return None
        if (cls, mth) != (60, 71):
            raise ConnectionError(f"expected Basic.GetOk, got "
                                  f"{cls}.{mth}")
        ftype, _ch, header = _recv(self.sock)
        if ftype != FRAME_HEADER:
            raise ConnectionError("expected content header frame")
        _cls, _w, body_size = struct.unpack_from(">HHQ", header, 0)
        body = b""
        while len(body) < body_size:
            ftype, _ch, chunk = _recv(self.sock)
            if ftype != FRAME_BODY:
                raise ConnectionError("expected content body frame")
            body += chunk
        return body


def amqp_bridge_to_kafka_log(host: str, port: int, queue: str,
                             spark, log_dir: str, topic: str,
                             max_messages: int | None = None) -> int:
    """The documented Spark deployment pattern for AMQP, realized:
    drain ``queue`` over real AMQP frames and append the messages to
    the kafka_wire file topic log, which Structured Streaming tails
    (kafka_log_read_stream). Returns the number of bridged messages.
    At scale the bridge is a small always-on process per queue; the
    replayable partitioned log is what Spark parallelizes over —
    AMQP itself has no offset/replay semantics to scale a reader."""
    from .kafka_wire import encode_record_batch
    cli = AmqpClient(host, port)
    try:
        msgs: list[bytes] = []
        while max_messages is None or len(msgs) < max_messages:
            body = cli.get(queue)
            if body is None:
                break
            msgs.append(body)
    finally:
        cli.close()
    if msgs:
        os.makedirs(log_dir, exist_ok=True)
        now_ms = int(time.time() * 1000)
        batch = encode_record_batch(
            0, [(now_ms, None, m) for m in msgs])
        # one bridge = one appended segment file; the stream source
        # picks it up as a new micro-batch
        fname = os.path.join(log_dir, f"{topic}-0.log")
        with open(fname, "ab") as fh:
            fh.write(batch)
    return len(msgs)


# ---------------------------------------------------------------------------
# stub broker
# ---------------------------------------------------------------------------

class _AmqpHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        srv: StubAmqpBroker = self.server.amqp  # type: ignore
        sock = self.request
        try:
            if _recv_exact(sock, 8) != PROTO_HEADER:
                return
            _send(sock, FRAME_METHOD, 0, _method(
                10, 10, struct.pack(">BB", 0, 9)
                + struct.pack(">I", 0)               # server props table
                + _longstr(b"PLAIN") + _longstr(b"en_US")))
            while True:
                ftype, channel, payload = _recv(sock, FRAME_MAX)
                if ftype != FRAME_METHOD:
                    continue
                cls, mth = struct.unpack_from(">HH", payload, 0)
                args = memoryview(payload)[4:]
                if (cls, mth) == (10, 11):           # StartOk
                    _send(sock, FRAME_METHOD, 0, _method(
                        10, 30, struct.pack(">HIH", 2047,
                                            FRAME_MAX, 0)))
                elif (cls, mth) == (10, 31):         # TuneOk
                    pass
                elif (cls, mth) == (10, 40):         # Connection.Open
                    _send(sock, FRAME_METHOD, 0,
                          _method(10, 41, _shortstr("")))
                elif (cls, mth) == (20, 10):         # Channel.Open
                    _send(sock, FRAME_METHOD, channel,
                          _method(20, 11, _longstr(b"")))
                elif (cls, mth) == (50, 10):         # Queue.Declare
                    q, _pos = _r_shortstr(args, 2)
                    with srv.lock:
                        srv.queues.setdefault(q, [])
                        n = len(srv.queues[q])
                    _send(sock, FRAME_METHOD, channel, _method(
                        50, 11, _shortstr(q)
                        + struct.pack(">II", n, 0)))
                elif (cls, mth) == (60, 40):         # Basic.Publish
                    _ex, pos = _r_shortstr(args, 2)
                    rk, pos = _r_shortstr(args, pos)
                    ftype, _ch, header = _recv(sock, FRAME_MAX)
                    _c, _w, body_size = struct.unpack_from(">HHQ",
                                                           header, 0)
                    body = b""
                    while len(body) < body_size:
                        ftype, _ch, chunk = _recv(sock, FRAME_MAX)
                        body += chunk
                    with srv.lock:
                        srv.queues.setdefault(rk, []).append(body)
                elif (cls, mth) == (60, 70):         # Basic.Get
                    q, _pos = _r_shortstr(args, 2)
                    with srv.lock:
                        pending = srv.queues.get(q, [])
                        body = pending.pop(0) if pending else None
                        left = len(pending)
                    if body is None:
                        _send(sock, FRAME_METHOD, channel,
                              _method(60, 72, _shortstr("")))
                    else:
                        _send(sock, FRAME_METHOD, channel, _method(
                            60, 71, struct.pack(">QB", 1, 0)
                            + _shortstr("") + _shortstr(q)
                            + struct.pack(">I", left)))
                        _send(sock, FRAME_HEADER, channel,
                              struct.pack(">HHQ", 60, 0, len(body))
                              + struct.pack(">H", 0))
                        # body-size 0 → zero body frames; otherwise
                        # split at the advertised frame_max too
                        for i in range(0, len(body), FRAME_MAX - 8):
                            _send(sock, FRAME_BODY, channel,
                                  body[i:i + FRAME_MAX - 8])
                else:
                    return
        except (ConnectionError, struct.error, IndexError):
            return


class StubAmqpBroker:
    """In-process AMQP 0-9-1 broker: full connection negotiation,
    queue declare, publish (3-frame messages), Basic.Get."""

    def __init__(self, host: str = "127.0.0.1"):
        self.queues: dict[str, list[bytes]] = {}
        self.lock = threading.Lock()
        self._server = socketserver.ThreadingTCPServer(
            (host, 0), _AmqpHandler)
        self._server.daemon_threads = True
        self._server.amqp = self  # type: ignore
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubAmqpBroker":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
