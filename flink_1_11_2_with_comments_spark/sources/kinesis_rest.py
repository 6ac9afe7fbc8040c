"""Kinesis connector over its REAL protocol: JSON-over-HTTP + SigV4.

flink-connector-kinesis is, at the wire level, an HTTPS client
POSTing JSON bodies with an ``X-Amz-Target: Kinesis_20131202.<Op>``
header, authenticated by AWS Signature Version 4 — both public
specs. stdlib ``urllib`` + ``hmac``/``hashlib`` therefore make this
a functional client against genuine AWS given credentials; the
in-process stub server exists so the loopback tests can RE-VERIFY
every signature server-side with the shared secret (a stronger check
than accepting any Authorization header).

Implemented operations (the consumer/producer core the reference's
FlinkKinesisConsumer/Producer drive):

- ``ListShards`` — shard discovery for task assignment.
- ``PutRecords`` — batched producer path; records route to shards by
  the REAL partition-key hashing rule (MD5 of the key as a 128-bit
  int against each shard's hash-key range).
- ``GetShardIterator`` (TRIM_HORIZON / AT_SEQUENCE_NUMBER) +
  ``GetRecords`` — the consumer poll loop.

``kinesis_read`` drains shards ON EXECUTORS — one task per shard,
the reference's shard-to-subtask assignment
(KinesisDataFetcher/ShardConsumer) — so no record bytes pass through
the driver.

SigV4 is pinned against the published AWS test vectors (derived
signing key and the canonical ListUsers request signature from the
official signing documentation) in tests/test_sources.py.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ALGO = "AWS4-HMAC-SHA256"


# ---------------------------------------------------------------------------
# AWS Signature Version 4 (public spec; test-vector pinned)
# ---------------------------------------------------------------------------

def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_signing_key(secret_key: str, date: str, region: str,
                      service: str) -> bytes:
    """kSigning = HMAC(HMAC(HMAC(HMAC('AWS4'+secret, date), region),
    service), 'aws4_request') — the published derivation chain."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sigv4_sign(method: str, path: str, query: str, headers: dict,
               payload: bytes, *, access_key: str, secret_key: str,
               region: str, service: str, amz_date: str) -> str:
    """Authorization header value for the request. ``headers`` must
    already contain every header to be signed (lowercase keys are
    canonicalized here); ``amz_date`` is YYYYMMDD'T'HHMMSS'Z'."""
    date = amz_date[:8]
    canon_headers = "".join(
        f"{k.lower()}:{str(v).strip()}\n"
        for k, v in sorted(headers.items(), key=lambda kv: kv[0].lower()))
    signed = ";".join(sorted(k.lower() for k in headers))
    canonical = "\n".join([
        method, path or "/", query, canon_headers, signed,
        hashlib.sha256(payload).hexdigest()])
    scope = f"{date}/{region}/{service}/aws4_request"
    to_sign = "\n".join([
        _ALGO, amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest()])
    key = sigv4_signing_key(secret_key, date, region, service)
    sig = hmac.new(key, to_sign.encode(), hashlib.sha256).hexdigest()
    return (f"{_ALGO} Credential={access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={sig}")


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------

class KinesisClient:
    """Minimal real-protocol Kinesis client (JSON target operations,
    SigV4-signed). ``endpoint`` like https://kinesis.us-east-1.
    amazonaws.com or the loopback stub's http URL."""

    def __init__(self, endpoint: str, region: str, access_key: str,
                 secret_key: str):
        self.endpoint = endpoint.rstrip("/")
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.host = self.endpoint.split("://", 1)[1]

    def _op(self, op: str, body: dict) -> dict:
        payload = json.dumps(body).encode()
        amz_date = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ")
        headers = {
            "Host": self.host,
            "X-Amz-Date": amz_date,
            "X-Amz-Target": f"Kinesis_20131202.{op}",
            "Content-Type": "application/x-amz-json-1.1",
        }
        auth = sigv4_sign("POST", "/", "", headers, payload,
                          access_key=self.access_key,
                          secret_key=self.secret_key,
                          region=self.region, service="kinesis",
                          amz_date=amz_date)
        req = urllib.request.Request(
            self.endpoint + "/", data=payload,
            headers={**headers, "Authorization": auth}, method="POST")
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def list_shards(self, stream: str) -> list[str]:
        out = self._op("ListShards", {"StreamName": stream})
        return [s["ShardId"] for s in out["Shards"]]

    def put_records(self, stream: str,
                    records: list[tuple[str, bytes]]) -> int:
        """records: [(partition_key, data)] → failed-record count."""
        out = self._op("PutRecords", {
            "StreamName": stream,
            "Records": [{"PartitionKey": pk,
                         "Data": base64.b64encode(d).decode()}
                        for pk, d in records]})
        return out.get("FailedRecordCount", 0)

    def get_shard_iterator(self, stream: str, shard_id: str) -> str:
        out = self._op("GetShardIterator", {
            "StreamName": stream, "ShardId": shard_id,
            "ShardIteratorType": "TRIM_HORIZON"})
        return out["ShardIterator"]

    def get_records(self, iterator: str, limit: int = 1000):
        out = self._op("GetRecords", {"ShardIterator": iterator,
                                      "Limit": limit})
        recs = [(r["SequenceNumber"], r["PartitionKey"],
                 base64.b64decode(r["Data"])) for r in out["Records"]]
        return (recs, out.get("NextShardIterator"),
                out.get("MillisBehindLatest", 0))


KINESIS_SCHEMA = T.StructType([
    T.StructField("shard_id", T.StringType()),
    T.StructField("sequence_number", T.StringType()),
    T.StructField("partition_key", T.StringType()),
    T.StructField("data", T.BinaryType()),
])


def kinesis_read(spark: SparkSession, endpoint: str, region: str,
                 access_key: str, secret_key: str,
                 stream: str) -> DataFrame:
    """Batch-read a stream over the wire: ListShards on the driver,
    then ONE TASK PER SHARD drains TRIM_HORIZON → tip with its own
    signed connection (FlinkKinesisConsumer's shard-to-subtask
    assignment; no record bytes through the driver)."""
    shards = KinesisClient(endpoint, region, access_key,
                           secret_key).list_shards(stream)

    def drain(shard_ids):
        for sid in shard_ids:
            c = KinesisClient(endpoint, region, access_key, secret_key)
            it = c.get_shard_iterator(stream, sid)
            # Real Kinesis legitimately serves EMPTY GetRecords pages
            # with a non-null NextShardIterator while
            # MillisBehindLatest > 0 (records further along the
            # shard); stopping on the first empty page would silently
            # truncate the read. Sparse TRIM_HORIZON regions can
            # serve HUNDREDS of empty pages in a row, so keep
            # following the iterator with a short backoff (the AWS
            # SDK consumers poll the same way) while the service
            # still reports lag; the generous page budget only guards
            # against a server reporting stale lag forever.
            empty_streak = 0
            while it:
                recs, it, behind = c.get_records(it)
                if recs:
                    empty_streak = 0
                    for seq, pk, data in recs:
                        yield (sid, seq, pk, data)
                else:
                    if behind <= 0:
                        break
                    empty_streak += 1
                    if empty_streak >= 10_000:
                        # budget exhausted with the service STILL
                        # reporting lag: this drain is TRUNCATED, not
                        # complete — say so loudly instead of
                        # returning a silently short read (advisor
                        # r12). warnings on an executor land in the
                        # task stderr log.
                        import warnings
                        warnings.warn(
                            f"kinesis_read: shard {sid} page budget "
                            f"exhausted after {empty_streak} empty "
                            f"pages with MillisBehindLatest={behind}"
                            " still reported — read truncated; the "
                            "stream is either unbounded or the "
                            "service lag metric is stale",
                            RuntimeWarning, stacklevel=1)
                        break
                    time.sleep(min(0.02 * empty_streak, 0.2))

    rdd = (spark.sparkContext
           .parallelize(shards, max(len(shards), 1))
           .mapPartitions(drain))
    return spark.createDataFrame(rdd, KINESIS_SCHEMA)


# ---------------------------------------------------------------------------
# stub server: re-verifies SigV4 server-side
# ---------------------------------------------------------------------------

def _md5_int(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest(), 16)


class _KinesisHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, obj: dict, code: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        srv: StubKinesisServer = self.server.kin  # type: ignore
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        # --- SERVER-SIDE SigV4 re-verification with the shared secret
        auth = self.headers.get("Authorization", "")
        amz_date = self.headers.get("X-Amz-Date", "")
        headers = {k: self.headers[k] for k in
                   ("Host", "X-Amz-Date", "X-Amz-Target",
                    "Content-Type") if k in self.headers}
        expect = sigv4_sign("POST", "/", "", headers, payload,
                            access_key=srv.access_key,
                            secret_key=srv.secret_key,
                            region=srv.region, service="kinesis",
                            amz_date=amz_date)
        if not hmac.compare_digest(auth, expect):
            self._reply({"__type": "IncompleteSignatureException"},
                        403)
            return
        op = self.headers.get("X-Amz-Target", "").split(".")[-1]
        body = json.loads(payload)
        with srv.lock:
            self._reply(getattr(srv, f"op_{op.lower()}")(body))


class StubKinesisServer:
    """In-memory Kinesis speaking the JSON target protocol WITH
    server-side SigV4 verification (shared secret). Shards split the
    128-bit MD5 hash-key space evenly — the real partition-key
    routing rule — and records carry monotonically increasing
    sequence numbers per shard."""

    def __init__(self, n_shards: int = 3, region: str = "us-east-1",
                 access_key: str = "AKIDEXAMPLE",
                 secret_key: str = "wJalrXUtnFEMI/K7MDENG+bPxRfiCY"
                                   "EXAMPLEKEY",
                 host: str = "127.0.0.1",
                 empty_pages_before_data: int = 0):
        # empty_pages_before_data > 0 reproduces real-Kinesis paging:
        # GetRecords may return an EMPTY record list with a non-null
        # NextShardIterator and MillisBehindLatest > 0 before the
        # next data page (AWS API docs for GetRecords). Readers that
        # stop on the first empty page truncate mid-shard.
        self.empty_pages_before_data = empty_pages_before_data
        self.n_shards = n_shards
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.shards: dict[str, list] = {
            f"shardId-{i:012d}": [] for i in range(n_shards)}
        self.lock = threading.Lock()
        self._server = ThreadingHTTPServer((host, 0), _KinesisHandler)
        self._server.daemon_threads = True
        self._server.kin = self  # type: ignore
        h, p = self._server.server_address
        self.endpoint = f"http://{h}:{p}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubKinesisServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    def _shard_for(self, partition_key: str) -> str:
        width = (1 << 128) // self.n_shards
        i = min(_md5_int(partition_key) // width, self.n_shards - 1)
        return f"shardId-{i:012d}"

    # -- operations (called under self.lock) ---------------------------
    def op_listshards(self, body: dict) -> dict:
        return {"Shards": [{"ShardId": s} for s in sorted(self.shards)]}

    def op_putrecords(self, body: dict) -> dict:
        results = []
        for rec in body["Records"]:
            sid = self._shard_for(rec["PartitionKey"])
            seq = f"{len(self.shards[sid]):020d}"
            self.shards[sid].append(
                {"SequenceNumber": seq,
                 "PartitionKey": rec["PartitionKey"],
                 "Data": rec["Data"]})
            results.append({"SequenceNumber": seq, "ShardId": sid})
        return {"FailedRecordCount": 0, "Records": results}

    def op_getsharditerator(self, body: dict) -> dict:
        sid = body["ShardId"]
        pos = 0
        if body.get("ShardIteratorType") == "AT_SEQUENCE_NUMBER":
            pos = int(body["StartingSequenceNumber"])
        return {"ShardIterator": json.dumps({"s": sid, "p": pos})}

    def op_getrecords(self, body: dict) -> dict:
        it = json.loads(body["ShardIterator"])
        sid, pos, served = it["s"], it["p"], it.get("e", 0)
        limit = body.get("Limit", 1000)
        remaining = len(self.shards[sid]) - pos
        if remaining > 0 and served < self.empty_pages_before_data:
            # mid-shard empty page: no records yet, but the iterator
            # advances and the consumer is still behind the tip
            nxt = json.dumps({"s": sid, "p": pos, "e": served + 1})
            return {"Records": [], "NextShardIterator": nxt,
                    "MillisBehindLatest": 1000 * remaining}
        page = self.shards[sid][pos:pos + limit]
        nxt = (json.dumps({"s": sid, "p": pos + len(page)})
               if page else None)
        return {"Records": page, "NextShardIterator": nxt,
                "MillisBehindLatest": 0}
