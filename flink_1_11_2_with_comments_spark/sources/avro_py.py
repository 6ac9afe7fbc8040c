"""Pure-Python Avro Object Container File codec — SURVEY §2.1 Avro.

Reference: flink-formats/flink-avro/src/main/java/org/apache/flink/
formats/avro/AvroRowDataDeserializationSchema.java (Avro <-> row
bridge) and AvroFileFormatFactory. This container ships neither the
spark-avro jar nor a Python avro/fastavro library, so this module
implements the Avro 1.11 specification's binary encoding directly —
zigzag-varint primitives, sync-marked OCF blocks — for the
flat-record schema subset a table needs: null / boolean / int-as-long
/ long / float-as-double / double / string / bytes, nullable unions
``["null", T]``, and the timestamp-micros logical type.

Both directions run DISTRIBUTED, the same shape as the SequenceFile
round-trip in formats.py: the writer emits one OCF file per partition
via ``mapPartitionsWithIndex`` (encoding happens on executors), the
reader decodes per file under ``binaryFiles`` — no driver funnel, so
the path scales with partition count, not data size.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_EPOCH = _dt.datetime(1970, 1, 1)

# ---------------------------------------------------------------------------
# primitive binary encoding (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(out: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return bytes(buf[pos:pos + n]), pos + n


# ---------------------------------------------------------------------------
# schema bridge
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    T.LongType: "long", T.IntegerType: "long", T.ShortType: "long",
    T.DoubleType: "double", T.FloatType: "double",
    T.StringType: "string", T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def avro_schema_for(schema: T.StructType, name: str = "row") -> dict:
    """Spark struct → Avro record schema (the subset above; nullable
    fields become ``["null", T]`` unions, timestamps the
    timestamp-micros logical type — AvroSchemaConverter.java:63)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, (T.TimestampType,
                                   T.TimestampNTZType)):
            at: object = {"type": "long",
                          "logicalType": "timestamp-micros"}
        else:
            try:
                at = _SPARK_TO_AVRO[type(f.dataType)]
            except KeyError:
                raise NotImplementedError(
                    f"avro_py subset: no mapping for column "
                    f"{f.name}: {f.dataType.simpleString()}") from None
        fields.append({"name": f.name,
                       "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


def _encode_value(out: io.BytesIO, ftype, v) -> None:
    if isinstance(ftype, list):  # ["null", T]
        if v is None:
            _write_long(out, 0)
            return
        _write_long(out, 1)
        ftype = ftype[1]
    if isinstance(ftype, dict):  # logical type wrapper
        if ftype.get("logicalType") == "timestamp-micros":
            td = v - _EPOCH
            v = (td.days * 86_400_000_000 + td.seconds * 1_000_000
                 + td.microseconds)
            ftype = "long"
        else:
            ftype = ftype["type"]
    if ftype == "long":
        _write_long(out, int(v))
    elif ftype == "double":
        out.write(struct.pack("<d", float(v)))
    elif ftype == "string":
        _write_bytes(out, v.encode("utf-8"))
    elif ftype == "bytes":
        _write_bytes(out, bytes(v))
    elif ftype == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif ftype == "null":
        pass
    else:
        raise NotImplementedError(f"avro_py subset: {ftype}")


def _decode_value(buf: memoryview, pos: int, ftype):
    if isinstance(ftype, list):
        ix, pos = _read_long(buf, pos)
        if ftype[ix] == "null":
            return None, pos
        ftype = ftype[ix]
    logical = None
    if isinstance(ftype, dict):
        logical = ftype.get("logicalType")
        ftype = ftype["type"]
    if ftype == "long":
        v, pos = _read_long(buf, pos)
        if logical == "timestamp-micros":
            v = _EPOCH + _dt.timedelta(microseconds=v)
        return v, pos
    if ftype == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if ftype == "bytes":
        b, pos = _read_bytes(buf, pos)
        return bytearray(b), pos
    if ftype == "boolean":
        return buf[pos] == 1, pos + 1
    if ftype == "null":
        return None, pos
    raise NotImplementedError(f"avro_py subset: {ftype}")


# ---------------------------------------------------------------------------
# object container file (Avro spec §Object Container Files)
# ---------------------------------------------------------------------------


def encode_container(rows, avro_schema: dict, sync: bytes,
                     block_records: int = 4096) -> bytes:
    """Rows (sequences in field order) → one OCF byte string: header
    (magic, metadata map with avro.schema + null codec, sync marker)
    then sync-delimited blocks of ``block_records`` records."""
    ftypes = [f["type"] for f in avro_schema["fields"]]
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # metadata map terminator
    out.write(sync)
    batch: list = []

    def flush():
        if not batch:
            return
        block = io.BytesIO()
        for row in batch:
            for ft, v in zip(ftypes, row):
                _encode_value(block, ft, v)
        data = block.getvalue()
        _write_long(out, len(batch))
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)
        batch.clear()

    for row in rows:
        batch.append(row)
        if len(batch) >= block_records:
            flush()
    flush()
    return out.getvalue()


def decode_container(raw: bytes) -> tuple[dict, list[tuple]]:
    """One OCF byte string → (avro schema, rows as tuples). Validates
    the magic, the null codec, and every block's trailing sync."""
    buf = memoryview(raw)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            # Avro spec: a negative block count is followed by the
            # block's byte size (fast-skip aid); consume it so
            # spec-legal files from other writers parse correctly.
            _, pos = _read_long(buf, pos)
        for _ in range(abs(n)):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise NotImplementedError(f"avro_py codec subset: {codec!r}")
    schema = json.loads(meta["avro.schema"])
    ftypes = [f["type"] for f in schema["fields"]]
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    rows: list[tuple] = []
    total = len(raw)
    while pos < total:
        count, pos = _read_long(buf, pos)
        _, pos = _read_long(buf, pos)  # block byte size
        for _ in range(count):
            vals = []
            for ft in ftypes:
                v, pos = _decode_value(buf, pos, ft)
                vals.append(v)
            rows.append(tuple(vals))
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError("avro block sync mismatch")
        pos += 16
    return schema, rows


# ---------------------------------------------------------------------------
# distributed write / read
# ---------------------------------------------------------------------------


def avro_write(df: DataFrame, path: str) -> None:
    """Write ``df`` as a directory of OCF files, one per partition —
    encoding runs on executors (mapPartitionsWithIndex), the driver
    only creates the directory."""
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_for(df.schema)
    n_fields = len(df.schema.fields)

    def write_part(ix: int, rows):
        sync = hashlib.md5(f"{path}:{ix}".encode()).digest()
        data = encode_container(
            (tuple(r[i] for i in range(n_fields)) for r in rows),
            schema, sync)
        fname = os.path.join(path, f"part-{ix:05d}.avro")
        with open(fname, "wb") as fh:
            fh.write(data)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_part).count()  # force


def avro_read(spark: SparkSession, path: str,
              schema: T.StructType) -> DataFrame:
    """Read a directory of OCF files into a DataFrame with the
    declared schema (same contract as the CSV/JSON round-trip: the
    reference's formats carry schema in the DDL). Decoding runs
    under binaryFiles — per-file, on executors."""
    rdd = (spark.sparkContext
           .binaryFiles(os.path.join(path, "*.avro"))
           .flatMap(lambda kv: decode_container(kv[1])[1]))
    return spark.createDataFrame(rdd, schema)
