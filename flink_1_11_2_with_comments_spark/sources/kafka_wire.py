"""Pure-Python Kafka RecordBatch v2 codec + file-backed topic log.

The Kafka CONNECTOR stays honestly gated in this container (no
broker, no client jar — sources/connectors.py documents the
deployment path). The message FORMAT, however, is a public spec
(https://kafka.apache.org/documentation/#recordbatch — the v2
record-batch layout every broker has written since 0.11), and this
module implements it for real:

- CRC-32C (Castagnoli) in table-driven pure Python — the checksum
  the spec mandates over the batch body (zlib.crc32 is CRC-32/ISO,
  NOT valid here); pinned against the RFC 3720 check value.
- Varint/zigzag record encoding: per-record length, timestamp and
  offset deltas, key/value/headers — byte-exact per the spec.
- RecordBatch framing: baseOffset, batchLength, partitionLeaderEpoch,
  magic=2, crc, attributes, lastOffsetDelta, first/maxTimestamp,
  producer fields, record count.
- A file-backed topic log: one `<topic>-<partition>.log` of
  concatenated record batches per Spark partition, written on
  executors (mapPartitionsWithIndex) and read back distributed
  (binaryFiles) — the storage format a real broker serves, minus
  the network layer, which is the documented remaining gap.

Reference: flink-connectors/flink-connector-kafka/.../
FlinkKafkaConsumer.java:72 consumes exactly these batches off the
wire; KafkaRecordSerializationSchema writes them.
"""

from __future__ import annotations

import io
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, poly 0x1EDC6F41 reflected = 0x82F63B78)
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C as the Kafka spec requires (RFC 3720 Castagnoli —
    crc32c(b'123456789') == 0xE3069283, pinned in tests)."""
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# varint / zigzag (protobuf-style, as the record layout specifies)
# ---------------------------------------------------------------------------


def _write_varint(out: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _vbytes(out: io.BytesIO, b: bytes | None) -> None:
    if b is None:
        _write_varint(out, -1)
    else:
        _write_varint(out, len(b))
        out.write(b)


def _read_vbytes(buf: memoryview, pos: int) -> tuple[bytes | None, int]:
    n, pos = _read_varint(buf, pos)
    if n < 0:
        return None, pos
    return bytes(buf[pos:pos + n]), pos + n


# ---------------------------------------------------------------------------
# RecordBatch v2
# ---------------------------------------------------------------------------

ATTR_TRANSACTIONAL = 0x10   # attributes bit 4 (spec: isTransactional)
ATTR_CONTROL = 0x20         # attributes bit 5 (spec: isControlBatch)
CTRL_ABORT, CTRL_COMMIT = 0, 1   # ControlRecordType (spec)


def encode_record_batch(base_offset: int,
                        records: list[tuple[int, bytes | None,
                                            bytes | None]],
                        *, attributes: int = 0, producer_id: int = -1,
                        producer_epoch: int = -1,
                        base_sequence: int = -1) -> bytes:
    """records: [(timestamp_ms, key, value)] → one RecordBatch v2.

    Layout per the spec: the CRC-32C covers everything AFTER the crc
    field (attributes onward); batchLength counts bytes after the
    batchLength field itself. Transactional batches set attribute
    bit 4 and carry the producer id/epoch/baseSequence the broker
    uses for fencing; control batches (bit 5) carry the txn markers.
    """
    assert records
    first_ts = records[0][0]
    max_ts = max(ts for ts, _k, _v in records)
    body = io.BytesIO()
    body.write(struct.pack(">hiq", attributes, len(records) - 1,
                           first_ts))
    body.write(struct.pack(">qqhiI", max_ts, producer_id,
                           producer_epoch, base_sequence,
                           len(records)))
    for i, (ts, key, value) in enumerate(records):
        rec = io.BytesIO()
        rec.write(b"\x00")                       # record attributes
        _write_varint(rec, ts - first_ts)        # timestampDelta
        _write_varint(rec, i)                    # offsetDelta
        _vbytes(rec, key)
        _vbytes(rec, value)
        _write_varint(rec, 0)                    # headers count
        rb = rec.getvalue()
        out = io.BytesIO()
        _write_varint(out, len(rb))
        body.write(out.getvalue())
        body.write(rb)
    b = body.getvalue()
    crc = crc32c(b)
    head = struct.pack(">qiibI", base_offset,
                       len(b) + 4 + 1 + 4,       # partLeaderEpoch+magic+crc
                       -1, 2, crc)
    return head + b


def encode_control_batch(base_offset: int, marker: int,
                         producer_id: int, producer_epoch: int,
                         timestamp_ms: int = 0) -> bytes:
    """One transaction-marker control batch (spec: control batches
    have attribute bits 4+5 set and a single record whose key is
    version:int16=0 + ControlRecordType:int16, value is
    version:int16=0 + coordinatorEpoch:int32)."""
    key = struct.pack(">hh", 0, marker)
    value = struct.pack(">hi", 0, 0)
    return encode_record_batch(
        base_offset, [(timestamp_ms, key, value)],
        attributes=ATTR_TRANSACTIONAL | ATTR_CONTROL,
        producer_id=producer_id, producer_epoch=producer_epoch)


def decode_record_batch_meta(buf: memoryview, pos: int):
    """One batch at ``pos`` → (base_offset, attributes, producer_id,
    [(offset, ts, key, value)], next_pos). Verifies magic + CRC-32C.
    Callers that need transaction semantics (control markers,
    READ_COMMITTED filtering) read attributes/producer_id here;
    decode_record_batch keeps the plain-records view."""
    base_offset, batch_len, _epoch, magic, crc = struct.unpack_from(
        ">qiibI", buf, pos)
    if magic != 2:
        raise ValueError(f"unsupported magic {magic}")
    body_start = pos + 21
    end = pos + 12 + batch_len
    body = bytes(buf[body_start:end])
    if crc32c(body) != crc:
        raise ValueError("RecordBatch CRC-32C mismatch")
    _attrs, _last_delta, first_ts = struct.unpack_from(">hiq", buf,
                                                       body_start)
    # fixed body prefix before the count: attributes(2)
    # lastOffsetDelta(4) firstTs(8) maxTs(8) producerId(8)
    # producerEpoch(2) baseSequence(4)
    n_records, = struct.unpack_from(">I", buf, body_start + 36)
    p = body_start + 40  # prefix above + count(4)
    out = []
    for _ in range(n_records):
        _rlen, p = _read_varint(buf, p)
        p += 1                                   # record attributes
        ts_delta, p = _read_varint(buf, p)
        off_delta, p = _read_varint(buf, p)
        key, p = _read_vbytes(buf, p)
        value, p = _read_vbytes(buf, p)
        n_headers, p = _read_varint(buf, p)
        for _h in range(n_headers):
            _hk, p = _read_vbytes(buf, p)
            _hv, p = _read_vbytes(buf, p)
        out.append((base_offset + off_delta, first_ts + ts_delta,
                    key, value))
    producer_id, = struct.unpack_from(">q", buf, body_start + 22)
    return base_offset, _attrs, producer_id, out, end


def decode_record_batch(buf: memoryview, pos: int):
    """One batch at ``pos`` → (base_offset, [(offset, ts, key, value)],
    next_pos). Verifies magic and the CRC-32C."""
    base_offset, _attrs, _pid, out, end = decode_record_batch_meta(
        buf, pos)
    return base_offset, out, end


def decode_log(raw: bytes):
    """A log segment = concatenated record batches; yield records.
    Control batches (transaction markers) are broker bookkeeping,
    never consumer records — skipped, exactly as every consumer
    isolation level does on the wire."""
    buf = memoryview(raw)
    pos = 0
    while pos < len(buf):
        _base, attrs, _pid, records, pos = decode_record_batch_meta(
            buf, pos)
        if attrs & ATTR_CONTROL:
            continue
        yield from records


LOG_SCHEMA = T.StructType([
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.LongType()),
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
])


def kafka_log_write(df: DataFrame, path: str, topic: str,
                    batch_size: int = 1000) -> None:
    """Write (timestamp bigint, key binary, value binary) as a
    file-backed topic: one `<topic>-<p>.log` of RecordBatch v2
    frames per Spark partition, encoded on executors."""
    os.makedirs(path, exist_ok=True)

    def write_part(ix: int, rows):
        out = io.BytesIO()
        base = 0
        batch: list = []

        def flush():
            nonlocal base, batch
            if batch:
                out.write(encode_record_batch(base, batch))
                base += len(batch)
                batch = []

        for r in rows:
            batch.append((int(r["timestamp"]),
                          bytes(r["key"]) if r["key"] is not None
                          else None,
                          bytes(r["value"]) if r["value"] is not None
                          else None))
            if len(batch) >= batch_size:
                flush()
        flush()
        fname = os.path.join(path, f"{topic}-{ix}.log")
        with open(fname, "wb") as fh:
            fh.write(out.getvalue())
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_part).count()  # force


def kafka_log_read(spark: SparkSession, path: str,
                   topic: str) -> DataFrame:
    """Read a file-backed topic back: per-file decode on executors
    (binaryFiles), yielding the Kafka source schema (partition,
    offset, timestamp, key, value) — the same rows
    spark-sql-kafka's real source produces."""
    def decode_file(kv):
        fname, raw = kv
        part = int(fname.rsplit("-", 1)[1].removesuffix(".log"))
        for off, ts, key, value in decode_log(raw):
            yield (part, off, ts, key, value)

    rdd = (spark.sparkContext
           .binaryFiles(os.path.join(path, f"{topic}-*.log"))
           .flatMap(decode_file))
    return spark.createDataFrame(rdd, LOG_SCHEMA)


def kafka_log_read_stream(spark: SparkSession, path: str,
                          topic: str) -> DataFrame:
    """STREAMING read of a file-backed topic: Structured Streaming's
    binaryFile source tails the log directory (offsets checkpointed
    like any file source — new segments are new micro-batches, the
    FlinkKafkaConsumer subscription shape), and each segment decodes
    executor-side in an Arrow-batched mapInPandas."""
    import pandas as pd

    bin_schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    files = (spark.readStream.format("binaryFile")
             .schema(bin_schema)
             .option("pathGlobFilter", f"{topic}-*.log")
             .load(path))

    def decode(batches):
        for pdf in batches:
            rows = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                part = int(str(fpath).rsplit("-", 1)[1]
                           .removesuffix(".log"))
                for off, ts, key, value in decode_log(bytes(raw)):
                    rows.append({"partition": part, "offset": off,
                                 "timestamp": ts, "key": key,
                                 "value": value})
            yield pd.DataFrame(
                rows, columns=["partition", "offset", "timestamp",
                               "key", "value"])

    return files.select("path", "content").mapInPandas(
        decode, LOG_SCHEMA)
