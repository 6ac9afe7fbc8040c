"""Confluent Schema Registry Avro wire format + stub registry server.

Reference: flink-formats/flink-avro-confluent-registry
(ConfluentRegistryAvroDeserializationSchema.java,
RegistryAvroSerializationSchema.java, ConfluentSchemaRegistryCoder.java):
Kafka message values are framed as

    magic 0x00 | schema id (4 bytes big-endian) | Avro binary record

and the registry's public REST API maps ids to schemas
(POST /subjects/{subject}/versions to register, GET /schemas/ids/{id}
to resolve — the Confluent wire protocol, a published spec). This
module implements both halves in pure stdlib on top of avro_py's
binary record codec:

- ``SchemaRegistryClient``: register (idempotent — identical schemas
  get the same global id, as the real registry guarantees) and
  resolve by id / latest-by-subject.
- ``avro_registry_frame``: DataFrame -> (timestamp, key, value) rows
  with registry-framed Avro values, encoded ON EXECUTORS (one
  register call per task — idempotence makes the race free), ready
  for the kafka_wire topic log or the kafka_net produce path.
- ``avro_registry_unframe``: framed values -> typed columns. Each
  message is decoded with ITS OWN writer schema (resolved from the
  embedded id, cached per task), then aligned to the target schema
  by field name with missing fields as NULL — the registry's
  schema-evolution contract (a reader sees old- and new-schema
  messages interleaved in one topic).
- ``StubSchemaRegistry``: in-process HTTP server speaking the same
  REST subset; the loopback discipline of the other connectors.

Scale: the registry is touched once per task per schema (a handful
of tiny HTTP calls per job); record bytes never pass through the
driver.
"""

from __future__ import annotations

import io
import json
import struct
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (callers compose)
from pyspark.sql import types as T

from .avro_py import _decode_value, _encode_value, avro_schema_for
from .kafka_wire import LOG_SCHEMA

_MAGIC = 0


def encode_registry_record(row, avro_schema: dict,
                           schema_id: int) -> bytes:
    """One row (sequence in field order) -> framed bytes."""
    out = io.BytesIO()
    out.write(struct.pack(">bI", _MAGIC, schema_id))
    for f, v in zip(avro_schema["fields"], row):
        _encode_value(out, f["type"], v)
    return out.getvalue()


def decode_registry_record(raw: bytes, get_schema) -> tuple[int, dict]:
    """Framed bytes -> (schema_id, {field: value}); ``get_schema`` maps
    id -> avro schema dict (the registry lookup, cache it)."""
    magic, schema_id = struct.unpack_from(">bI", raw, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad registry magic byte {magic}")
    schema = get_schema(schema_id)
    buf, pos = memoryview(raw), 5
    out = {}
    for f in schema["fields"]:
        out[f["name"]], pos = _decode_value(buf, pos, f["type"])
    return schema_id, out


class SchemaRegistryClient:
    """The REST subset the Confluent coder needs (public wire API)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _req(self, method: str, path: str, payload: dict | None = None):
        data = json.dumps(payload).encode() if payload is not None \
            else None
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method,
            headers={"Content-Type":
                     "application/vnd.schemaregistry.v1+json"})
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def register(self, subject: str, avro_schema: dict) -> int:
        out = self._req("POST", f"/subjects/{subject}/versions",
                        {"schema": json.dumps(avro_schema)})
        return out["id"]

    def get_by_id(self, schema_id: int) -> dict:
        out = self._req("GET", f"/schemas/ids/{schema_id}")
        return json.loads(out["schema"])

    def latest(self, subject: str) -> tuple[int, dict]:
        out = self._req("GET",
                        f"/subjects/{subject}/versions/latest")
        return out["id"], json.loads(out["schema"])


class _RegistryHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, obj: dict, code: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type",
                         "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        srv: StubSchemaRegistry = self.server.reg  # type: ignore
        parts = self.path.strip("/").split("/")
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n))
        if (len(parts) == 3 and parts[0] == "subjects"
                and parts[2] == "versions"):
            sid = srv.register(parts[1], payload["schema"])
            self._reply({"id": sid})
        else:
            self._reply({"error_code": 404, "message": "not found"},
                        404)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        srv: StubSchemaRegistry = self.server.reg  # type: ignore
        parts = self.path.strip("/").split("/")
        if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
            schema = srv.by_id.get(int(parts[2]))
            if schema is None:
                self._reply({"error_code": 40403,
                             "message": "Schema not found"}, 404)
            else:
                self._reply({"schema": schema})
        elif (len(parts) == 4 and parts[0] == "subjects"
              and parts[2] == "versions" and parts[3] == "latest"):
            versions = srv.subjects.get(parts[1], [])
            if not versions:
                self._reply({"error_code": 40401,
                             "message": "Subject not found"}, 404)
            else:
                sid = versions[-1]
                self._reply({"subject": parts[1],
                             "version": len(versions), "id": sid,
                             "schema": srv.by_id[sid]})
        else:
            self._reply({"error_code": 404, "message": "not found"},
                        404)


class StubSchemaRegistry:
    """In-process schema registry: global ids deduplicated by the
    schema's canonical JSON (the real registry's guarantee that
    re-registering an identical schema returns the same id)."""

    def __init__(self, host: str = "127.0.0.1"):
        self.by_id: dict[int, str] = {}
        self.ids_by_canonical: dict[str, int] = {}
        self.subjects: dict[str, list[int]] = {}
        self._next = 1
        self._lock = threading.Lock()
        self._server = ThreadingHTTPServer((host, 0), _RegistryHandler)
        self._server.daemon_threads = True
        self._server.reg = self  # type: ignore
        h, p = self._server.server_address
        self.url = f"http://{h}:{p}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubSchemaRegistry":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    def register(self, subject: str, schema_json: str) -> int:
        canonical = json.dumps(json.loads(schema_json),
                               sort_keys=True)
        with self._lock:
            sid = self.ids_by_canonical.get(canonical)
            if sid is None:
                sid = self._next
                self._next += 1
                self.ids_by_canonical[canonical] = sid
                self.by_id[sid] = schema_json
            versions = self.subjects.setdefault(subject, [])
            if sid not in versions:
                versions.append(sid)
        return sid


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def avro_registry_frame(df: DataFrame, registry_url: str,
                        subject: str,
                        key_col: str | None = None,
                        timestamp_col: str | None = None) -> DataFrame:
    """Typed rows -> Kafka log rows (timestamp, key, value) with the
    value registry-framed (magic 0 + schema id + Avro binary). The
    schema derives from the DataFrame schema and registers once per
    task — identical registrations collapse to one id."""
    schema = df.schema
    data_fields = [f.name for f in schema.fields
                   if f.name not in (key_col, timestamp_col)]
    avro_schema = avro_schema_for(
        T.StructType([schema[n] for n in data_fields]))
    names = [f.name for f in schema.fields]
    ki = names.index(key_col) if key_col else -1
    ti = names.index(timestamp_col) if timestamp_col else -1
    di = [names.index(n) for n in data_fields]

    def frame_part(rows):
        cli = SchemaRegistryClient(registry_url)
        sid = cli.register(subject, avro_schema)
        for row in rows:
            value = encode_registry_record([row[i] for i in di],
                                           avro_schema, sid)
            key = (str(row[ki]).encode() if ki >= 0
                   and row[ki] is not None else None)
            ts = int(row[ti]) if ti >= 0 and row[ti] is not None else 0
            yield (0, 0, ts, key, value)

    rdd = df.rdd.mapPartitions(frame_part)
    return df.sparkSession.createDataFrame(rdd, LOG_SCHEMA) \
        .select("timestamp", "key", "value")


def avro_registry_unframe(log_df: DataFrame, registry_url: str,
                          target: T.StructType) -> DataFrame:
    """Kafka log rows -> typed columns of ``target``. Every message
    decodes with its OWN writer schema (embedded id, one registry
    fetch per distinct id per task); fields absent from a writer
    schema surface as NULL — the registry's forward-evolution
    contract (ConfluentRegistryAvroDeserializationSchema)."""
    names = [f.name for f in target.fields]

    def unframe_part(rows):
        cli = SchemaRegistryClient(registry_url)
        cache: dict[int, dict] = {}

        def get_schema(sid: int) -> dict:
            if sid not in cache:
                cache[sid] = cli.get_by_id(sid)
            return cache[sid]

        for row in rows:
            _sid, rec = decode_registry_record(bytes(row.value),
                                               get_schema)
            yield tuple(rec.get(n) for n in names)

    rdd = log_df.rdd.mapPartitions(unframe_part)
    return log_df.sparkSession.createDataFrame(rdd, target)
