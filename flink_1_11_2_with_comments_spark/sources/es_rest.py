"""Elasticsearch connector over its REAL protocol: REST + JSON.

The reference's flink-connector-elasticsearch7 is, at the wire level,
an HTTP client speaking two endpoints — `_bulk` NDJSON writes
(ElasticsearchSinkBase flushes action/source line pairs) and
`_search` reads. Unlike HBase/Cassandra there is no binary protocol
in the way: stdlib HTTP IS the production transport, so this module
is a functional connector against a genuine Elasticsearch cluster,
not only against the loopback stub (the jar-based
`elasticsearch_source` in connectors.py stays as the DSv2 path).

- ``es_bulk_sink``: executor-side `_bulk` posts — each partition
  opens its own connection and flushes NDJSON batches (the sink's
  flush-on-bulk-size discipline, ElasticsearchSinkBase.java); any
  per-item error in the bulk response fails the task loudly.
- ``es_search_source``: parallel read via the SLICED SCROLL API —
  task i drains slice {"id": i, "max": n}, the real cluster-parallel
  read every ES integration uses (elasticsearch-hadoop splits by
  scroll slices the same way). Returns (_id string, _source json
  string); pair with from_json for typed columns.
- ``StubESServer``: in-process http.server implementing the subset:
  `_bulk`, `_count`, `_search` with slice + scroll continuation,
  `_search/scroll`. In-memory index, thread-safe, slices by
  hash(_id) % max — a valid slicing (disjoint, covering), which is
  all the contract requires.

Scale: no record bytes pass through the driver in either direction;
parallelism = Spark partitions (sink) / slice count (source).
"""

from __future__ import annotations

import hashlib
import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _post(url: str, payload: bytes, ctype: str) -> dict:
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": ctype},
        method="POST")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def es_bulk_sink(df: DataFrame, base_url: str, index: str,
                 id_col: str | None = None,
                 batch_size: int = 500) -> None:
    """Index every row of ``df`` into ``index`` via `_bulk` NDJSON,
    executor-side (one HTTP connection per partition, flushed every
    ``batch_size`` docs — ElasticsearchSinkBase's bulk flush). Rows
    become JSON documents; ``id_col`` supplies explicit _ids (else
    ES assigns). A bulk response with errors=true raises with the
    first failing item."""
    url = f"{base_url.rstrip('/')}/{index}/_bulk"
    cols = df.columns

    def send(rows_iter):
        lines: list[str] = []

        def flush():
            if not lines:
                return
            body = ("\n".join(lines) + "\n").encode()
            out = _post(url, body, "application/x-ndjson")
            if out.get("errors"):
                bad = next(item for item in out["items"]
                           if item["index"].get("error"))
                raise RuntimeError(f"es bulk item failed: {bad}")
            lines.clear()

        for row in rows_iter:
            doc = {c: row[c] for c in cols}
            action: dict = {"index": {}}
            if id_col is not None:
                action["index"]["_id"] = str(doc[id_col])
            lines.append(json.dumps(action, default=str))
            lines.append(json.dumps(doc, default=str))
            if len(lines) >= 2 * batch_size:
                flush()
        flush()
        return iter(())

    df.rdd.mapPartitions(send).count()  # force executor-side writes


ES_SOURCE_SCHEMA = T.StructType([
    T.StructField("_id", T.StringType()),
    T.StructField("_source", T.StringType()),
])


def es_search_source(spark: SparkSession, base_url: str, index: str,
                     slices: int | None = None,
                     scroll_size: int = 500) -> DataFrame:
    """Parallel scan of ``index``: one task per scroll SLICE, each
    draining its disjoint document subset through `_search?scroll`
    continuations — elasticsearch-hadoop's split model. Returns
    (_id, _source-json); callers apply from_json for typed access."""
    base = base_url.rstrip("/")
    n_slices = slices or max(
        2, spark.sparkContext.defaultParallelism // 4)

    def drain(slice_ids):
        for sid in slice_ids:
            q: dict = {"size": scroll_size}
            if n_slices > 1:
                q["slice"] = {"id": sid, "max": n_slices}
            out = _post(f"{base}/{index}/_search?scroll=1m",
                        json.dumps(q).encode(), "application/json")
            while True:
                hits = out["hits"]["hits"]
                if not hits:
                    break
                for h in hits:
                    yield (h["_id"], json.dumps(h["_source"]))
                out = _post(f"{base}/_search/scroll",
                            json.dumps({"scroll": "1m",
                                        "scroll_id": out["_scroll_id"]}
                                       ).encode(),
                            "application/json")

    rdd = (spark.sparkContext
           .parallelize(range(n_slices), n_slices).mapPartitions(drain))
    return spark.createDataFrame(rdd, ES_SOURCE_SCHEMA)


# ---------------------------------------------------------------------------
# stub server (loopback tests)
# ---------------------------------------------------------------------------

def _slice_of(doc_id: str, max_slices: int) -> int:
    # deterministic disjoint covering split — any such split satisfies
    # the sliced-scroll contract
    return int(hashlib.md5(doc_id.encode()).hexdigest(), 16) % max_slices


class _ESHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence per-request stderr noise
        pass

    def _reply(self, obj: dict, code: int = 200) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self) -> None:  # noqa: N802 (http.server API)
        srv: StubESServer = self.server.es  # type: ignore
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n)
        path = self.path.split("?")[0]
        if path.endswith("/_bulk"):
            index = path.split("/")[1]
            self._reply(srv.bulk(index, raw))
        elif path == "/_search/scroll":
            self._reply(srv.scroll(json.loads(raw)["scroll_id"]))
        elif path.endswith("/_search"):
            index = path.split("/")[1]
            self._reply(srv.search(index, json.loads(raw)))
        elif path.endswith("/_count"):
            index = path.split("/")[1]
            with srv.lock:
                self._reply({"count": len(srv.indices.get(index, {}))})
        else:
            self._reply({"error": f"unsupported path {path}"}, 400)


class StubESServer:
    """In-memory Elasticsearch speaking the REST subset the connector
    uses: _bulk (indexing, explicit or auto _ids), sliced _search with
    scroll continuation, _count."""

    def __init__(self, host: str = "127.0.0.1"):
        self.indices: dict[str, dict[str, dict]] = {}
        self.scrolls: dict[str, list] = {}
        self.lock = threading.Lock()
        self._auto = 0
        self._server = ThreadingHTTPServer((host, 0), _ESHandler)
        self._server.daemon_threads = True
        self._server.es = self  # type: ignore
        self.host, self.port = self._server.server_address
        self.base_url = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    def __enter__(self) -> "StubESServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    def bulk(self, index: str, raw: bytes) -> dict:
        lines = [ln for ln in raw.decode().splitlines() if ln.strip()]
        items = []
        with self.lock:
            idx = self.indices.setdefault(index, {})
            for i in range(0, len(lines), 2):
                action = json.loads(lines[i])
                doc = json.loads(lines[i + 1])
                if "index" not in action:
                    items.append({"index": {"status": 400, "error":
                                            "only index actions"}})
                    continue
                _id = action["index"].get("_id")
                if _id is None:
                    self._auto += 1
                    _id = f"auto-{self._auto}"
                idx[str(_id)] = doc
                items.append({"index": {"_id": str(_id), "status": 201}})
        errors = any(it["index"].get("error") for it in items)
        return {"errors": errors, "items": items}

    def search(self, index: str, q: dict) -> dict:
        size = q.get("size", 10)
        sl = q.get("slice")
        with self.lock:
            docs = sorted(self.indices.get(index, {}).items())
        if sl:
            docs = [(k, v) for k, v in docs
                    if _slice_of(k, sl["max"]) == sl["id"]]
        sid = f"scroll-{len(self.scrolls)}-{threading.get_ident()}"
        with self.lock:
            self.scrolls[sid] = docs[size:]
        hits = [{"_id": k, "_source": v} for k, v in docs[:size]]
        return {"_scroll_id": sid,
                "hits": {"total": {"value": len(docs)}, "hits": hits}}

    def scroll(self, sid: str) -> dict:
        with self.lock:
            pending = self.scrolls.get(sid, [])
            page, self.scrolls[sid] = pending[:500], pending[500:]
        hits = [{"_id": k, "_source": v} for k, v in page]
        return {"_scroll_id": sid, "hits": {"hits": hits}}
