"""Minimal production serving endpoint over a loaded corpus.

The reference stops at a Python library; a deployable engine needs a
serving surface. This is a dependency-free stdlib HTTP server wrapping one
:class:`~hyperdb_tpu.HyperDB`:

  GET  /healthz              -> {"ok": true}
  GET  /stats                -> corpus + cache statistics (CLI `stats` dict)
  POST /query                -> one query
  POST /query_batch          -> a (B, d) block of vector queries

Request bodies are JSON. /query accepts the full public query surface::

    {"text": "...", "top_k": 5, "metric": "cosine_similarity",
     "filters": [["metadata", {"info.type": "fire"}]],
     "recency_bias": 0.0, "timestamp_key": null}

or ``{"vector": [...]}`` in place of ``text``. /query_batch accepts
``{"vectors": [[...], ...], "top_k": k, "metric": ...}``.

Concurrency model: HTTP handling is threaded (keeps slow clients from
serializing each other) but engine calls run under one lock — the engine's
LRU/state mutation and the single device queue are not thread-safe, and on
this hardware one in-flight device program at a time is the fast path
anyway. Start with ``python -m hyperdb_tpu serve --db corpus.hdb``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _result_rows(results):
    rows = []
    for res in results:
        if len(res) == 3:
            doc, score, idx = res
        else:  # Q4 2-tuple arity on the ANN+recency path
            doc, score, idx = res[0], res[1], None
        rows.append(
            {"document": doc, "score": float(score), "index": idx}
        )
    return rows


def make_server(db, host: str = "127.0.0.1", port: int = 8901):
    """Build (but do not start) a ThreadingHTTPServer serving ``db``.

    ``db`` may be a :class:`~hyperdb_tpu.HyperDB` or a
    :class:`~hyperdb_tpu.parallel.sharded_db.ShardedHyperDB` (same query
    surface; corpus statistics come from the wrapped host db)."""
    lock = threading.Lock()
    host_db = getattr(db, "db", db)  # ShardedHyperDB wraps the host store

    class Handler(BaseHTTPRequestHandler):
        server_version = "hyperdb-tpu"

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(200, {"ok": True})
            if self.path == "/stats":
                with lock:
                    info = {
                        "documents": host_db.size(),
                        "chunks": len(host_db.source_indices),
                        "dim": host_db.dim,
                        "ann_metric": host_db.ann_metric,
                        "index": type(host_db.ann_index).__name__
                        if host_db.ann_index
                        else None,
                        "sharded": db is not host_db,
                        "cache": host_db.get_cache_size_and_info(),
                        "timers": host_db.stats.snapshot(),
                    }
                return self._send(200, info)
            return self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad JSON: {e}"})
            try:
                if self.path == "/query":
                    query_input = (
                        req["text"] if "text" in req else req["vector"]
                    )
                    filters = req.get("filters")
                    if filters:
                        filters = [tuple(f) for f in filters]
                    kwargs = {}
                    if "ann_percent" in req and hasattr(db, "ann_metric"):
                        # Q12 candidate budget — single-chip engine only
                        # (the sharded path has no ANN pre-filter)
                        kwargs["ann_percent"] = int(req["ann_percent"])
                    with lock:
                        results = db.query(
                            query_input,
                            top_k=int(req.get("top_k", 5)),
                            metric=req.get("metric", "cosine_similarity"),
                            filters=filters,
                            recency_bias=req.get("recency_bias", 0) or 0,
                            timestamp_key=req.get("timestamp_key"),
                            **kwargs,
                        )
                    return self._send(200, {"results": _result_rows(results)})
                if self.path == "/query_batch":
                    import numpy as np

                    vectors = np.asarray(req["vectors"], dtype=np.float32)
                    with lock:
                        rows = db.query_batch(
                            vectors,
                            top_k=int(req.get("top_k", 5)),
                            metric=req.get("metric", "cosine_similarity"),
                        )
                    return self._send(
                        200, {"results": [_result_rows(r) for r in rows]}
                    )
            except KeyError as e:
                return self._send(400, {"error": f"missing field {e}"})
            except ValueError as e:
                # engine validation errors (bad metric, dim mismatch, ...)
                return self._send(400, {"error": str(e)})
            return self._send(404, {"error": f"unknown path {self.path}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve(db, host: str = "127.0.0.1", port: int = 8901):
    """Serve ``db`` until interrupted (the CLI `serve` entrypoint)."""
    httpd = make_server(db, host, port)
    print(f"serving on http://{host}:{httpd.server_address[1]}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return 0
