"""ctypes driver for the native epoll serving front-end (server.cc).

The C++ side owns the I/O plane (sockets, HTTP parsing, dynamic batching,
response formatting); this module runs the single worker thread that pulls
batches out of it and enters the engine once per BATCH:

    tag = hdb_srv_next()          # blocks in C (GIL released)
    tag == 1: db.query_batch_arrays(...) -> hdb_srv_batch_complete(ids, sc)
    tag == 2: server.api_response(...)   -> hdb_srv_req_respond(...)

Why: the stdlib ThreadingHTTPServer spends ~1 ms of GIL-serialized Python
per request (benchmarks/bench_serving.py), capping serving at ~1.2k q/s
against a 65k q/s engine. Moving per-request work to C++ leaves Python
with one engine call per flush — the same work a benchmark harness does.

One worker thread by design: this platform admits one in-flight device
program at a time (CLAUDE.md), so additional workers would only contend.
The worker thread is the ONLY thread touching the wrapped db; mutating the
db while the server runs requires holding ``server.lock``.
"""

from __future__ import annotations

import ctypes
import json
import threading
import time

import numpy as np

from hyperdb_tpu.native import tokenizer as _host_lib

_P_FLOAT = ctypes.POINTER(ctypes.c_float)
_P_INT32 = ctypes.POINTER(ctypes.c_int32)
_P_LL = ctypes.POINTER(ctypes.c_longlong)

_bound = False


def _bind(lib) -> bool:
    """Declare the server entry points on the shared host library."""
    global _bound
    if _bound:
        return True
    if not hasattr(lib, "hdb_srv_create") or not hasattr(
        lib, "hdb_srv_batch_filters"
    ):
        return False  # stale .so predating server.cc / its current surface
    lib.hdb_srv_create.restype = ctypes.c_void_p
    lib.hdb_srv_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_longlong,
    ]
    lib.hdb_srv_port.restype = ctypes.c_int
    lib.hdb_srv_port.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_next.restype = ctypes.c_int
    lib.hdb_srv_next.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_size.restype = ctypes.c_int
    lib.hdb_srv_batch_size.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_vecs.restype = _P_FLOAT
    lib.hdb_srv_batch_vecs.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_topks.restype = _P_INT32
    lib.hdb_srv_batch_topks.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_metric.restype = ctypes.c_char_p
    lib.hdb_srv_batch_metric.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_filters.restype = ctypes.c_char_p
    lib.hdb_srv_batch_filters.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_recency.restype = ctypes.c_char_p
    lib.hdb_srv_batch_recency.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_batch_tskey.restype = ctypes.c_char_p
    lib.hdb_srv_batch_tskey.argtypes = [ctypes.c_void_p]
    # returns a pointer (NOT c_char_p): text bodies may legally contain
    # NUL bytes, so the worker reads (ptr, len) via ctypes.string_at
    lib.hdb_srv_batch_text.restype = ctypes.c_void_p
    lib.hdb_srv_batch_text.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.hdb_srv_batch_complete.restype = None
    lib.hdb_srv_batch_complete.argtypes = [
        ctypes.c_void_p, _P_LL, _P_FLOAT, ctypes.c_int,
    ]
    lib.hdb_srv_batch_fail.restype = None
    lib.hdb_srv_batch_fail.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
    ]
    for fn in ("hdb_srv_req_method", "hdb_srv_req_path", "hdb_srv_req_ctype"):
        getattr(lib, fn).restype = ctypes.c_char_p
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.hdb_srv_req_body.restype = ctypes.c_void_p
    lib.hdb_srv_req_body.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.hdb_srv_req_respond.restype = None
    lib.hdb_srv_req_respond.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_longlong,
    ]
    lib.hdb_srv_stop.restype = None
    lib.hdb_srv_stop.argtypes = [ctypes.c_void_p]
    lib.hdb_srv_destroy.restype = None
    lib.hdb_srv_destroy.argtypes = [ctypes.c_void_p]
    _bound = True
    return True


def available() -> bool:
    """True when the native serving front-end can be used on this host."""
    lib = _host_lib._load()
    if lib is None:
        return False
    if _bind(lib):
        return True
    # a pre-server .so is lying around; one forced rebuild picks up server.cc
    if _host_lib.build(force=True):
        _host_lib._lib = None
        _host_lib._load_attempted = False
        lib = _host_lib._load()
        return lib is not None and _bind(lib)
    return False


class NativeQueryServer:
    """Serve ``db`` over HTTP through the C++ epoll front-end.

    Endpoint surface matches :mod:`hyperdb_tpu.server` (shared dispatcher
    ``server.api_response`` handles /stats and the JSON paths); the binary
    ``POST /query`` octet-stream path is parsed, batched, and answered
    entirely in C++ around one ``query_batch_arrays`` call per flush.
    """

    def __init__(self, db, host: str = "127.0.0.1", port: int = 8901,
                 max_batch: int = 256, window_ms: float = 2.0,
                 wire_dtype: str = "auto"):
        lib = _host_lib._load()
        if lib is None or not _bind(lib):
            if not available():
                raise RuntimeError(
                    "native serving front-end unavailable (no compiler or "
                    "the host library failed to build); use "
                    "hyperdb_tpu.server.make_server instead"
                )
            lib = _host_lib._load()
        self._lib = lib
        self.db = db
        self.host_db = getattr(db, "db", db)  # ShardedHyperDB wraps host db
        self.dim = int(self.host_db.dim)
        self.lock = threading.Lock()  # hold this to mutate db while serving
        # Low-precision wire: host->device upload runs ~30-60 MB/s on the
        # tunnel (probe_readback.py), so f16 query blocks save ~36 ms per
        # 1024-query flush. "auto" casts when the corpus itself is low
        # precision (f16 stores already round the query to f16 on device;
        # int8 stores quantize it) — full-precision stores keep f32 wire.
        if wire_dtype not in ("auto", "float32", "float16"):
            raise ValueError(f"invalid wire_dtype {wire_dtype!r}")
        low = getattr(
            getattr(self.host_db, "_store", None),
            "low_precision_device",
            False,
        )
        self.wire_f16 = wire_dtype == "float16" or (
            wire_dtype == "auto" and low
        )
        self._srv = lib.hdb_srv_create(
            host.encode(), int(port), self.dim, int(max_batch),
            int(window_ms * 1000), 8 << 20,
        )
        if not self._srv:
            raise OSError(f"could not bind {host}:{port}")
        self.port = lib.hdb_srv_port(self._srv)
        # per-flush accounting (reported under /stats -> "native"): where a
        # serving second goes — engine wall per flush vs everything else —
        # and how big flushes actually are. Written only by the worker
        # thread; /stats reads without locking (approximate is fine).
        self.flushes = 0
        self.flushed_queries = 0
        self.engine_s = 0.0
        self.idle_s = 0.0  # blocked in hdb_srv_next (no work pending)
        self.max_flush = 0
        self._worker = threading.Thread(
            target=self._run, daemon=True, name="hyperdb-native-serve"
        )
        self._worker.start()

    # ------------------------------------------------------------------
    def close(self):
        if self._srv is None:
            return
        self._lib.hdb_srv_stop(self._srv)
        self._worker.join(timeout=10.0)
        self._lib.hdb_srv_destroy(self._srv)
        self._srv = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def serve_forever(self):
        """Block until the worker exits (the CLI entrypoint)."""
        try:
            while self._worker.is_alive():
                self._worker.join(timeout=1.0)
        except KeyboardInterrupt:
            pass
        finally:
            self.close()

    # ------------------------------------------------------------------
    def _run(self):
        lib, srv = self._lib, self._srv
        while True:
            t0 = time.perf_counter()
            tag = lib.hdb_srv_next(srv)  # blocks; GIL released in ctypes
            self.idle_s += time.perf_counter() - t0
            if tag == 0:
                return
            if tag == 1:
                self._handle_batch(lib, srv)
            elif tag == 3:
                self._handle_text_batch(lib, srv)
            else:
                self._handle_generic(lib, srv)

    def _run_flush(self, lib, srv, n, engine_call):
        """Shared tail of both hot-batch handlers: run the engine call,
        fail the flush on error (400 for validation errors, 500 for
        engine/device faults — clients must not be blamed for server-side
        failures), else account and hand (ids, scores) back to C++."""
        t0 = time.perf_counter()
        try:
            with self.lock:
                ids, scores = engine_call()
        except Exception as e:  # noqa: BLE001 — delivered per request
            status = 400 if isinstance(e, (ValueError, TypeError)) else 500
            lib.hdb_srv_batch_fail(srv, status, str(e).encode())
            return
        self.engine_s += time.perf_counter() - t0
        self.flushes += 1
        self.flushed_queries += n
        self.max_flush = max(self.max_flush, n)
        k = int(ids.shape[1])
        ids64 = np.ascontiguousarray(ids, dtype=np.int64)
        sc32 = np.ascontiguousarray(scores, dtype=np.float32)
        lib.hdb_srv_batch_complete(
            srv,
            ids64.ctypes.data_as(_P_LL),
            sc32.ctypes.data_as(_P_FLOAT),
            k,
        )

    @staticmethod
    def _batch_params(lib, srv):
        """The flush's shared query parameters (from the query string; part
        of the C++ group key, so one parse covers the whole batch):
        (filters, recency_bias, timestamp_key)."""
        filters = None
        raw = lib.hdb_srv_batch_filters(srv)
        if raw:
            spec = json.loads(raw.decode())
            filters = [tuple(f) for f in spec] if spec else None
        raw = lib.hdb_srv_batch_recency(srv)
        recency = float(raw) if raw else 0.0
        raw = lib.hdb_srv_batch_tskey(srv)
        tskey = raw.decode() if raw else None
        return filters, recency, tskey

    def _handle_batch(self, lib, srv):
        n = lib.hdb_srv_batch_size(srv)
        vecs = np.ctypeslib.as_array(
            lib.hdb_srv_batch_vecs(srv), shape=(n, self.dim)
        )
        topks = np.ctypeslib.as_array(lib.hdb_srv_batch_topks(srv), shape=(n,))
        metric = lib.hdb_srv_batch_metric(srv).decode()
        block = np.array(vecs)  # own the buffer before the C++ side reuses it
        if self.wire_f16:
            block = block.astype(np.float16)
        top_k = int(topks.max())

        filters, recency, tskey = self._batch_params(lib, srv)

        def call():
            return self.db.query_batch_arrays(
                block, top_k=top_k, metric=metric, filters=filters,
                recency_bias=recency, timestamp_key=tskey,
            )

        self._run_flush(lib, srv, n, call)

    def _handle_text_batch(self, lib, srv):
        """tag == 3: a flush of text/plain queries — ONE encoder pass embeds
        the whole batch, then the same array-level engine call as tag 1."""
        from hyperdb_tpu.query.engine import generate_query_vectors_batch

        n = lib.hdb_srv_batch_size(srv)
        texts = []
        tlen = ctypes.c_longlong(0)
        for i in range(n):
            ptr = lib.hdb_srv_batch_text(srv, i, ctypes.byref(tlen))
            raw = ctypes.string_at(ptr, tlen.value) if tlen.value else b""
            texts.append(raw.decode("utf-8", "replace"))
        topks = np.ctypeslib.as_array(lib.hdb_srv_batch_topks(srv), shape=(n,))
        metric = lib.hdb_srv_batch_metric(srv).decode()
        top_k = int(topks.max())

        filters, recency, tskey = self._batch_params(lib, srv)

        def call():
            if self.db is self.host_db:
                # single-chip engine: chain the encoder output into the
                # scan device-side — one tunnel round trip per flush
                # instead of two (None -> host fallback below; sharded
                # serving re-uploads per shard, so it gains nothing here)
                from hyperdb_tpu.query.engine import (
                    generate_query_vectors_batch_device,
                )

                dev = generate_query_vectors_batch_device(self.host_db, texts)
                if dev is not None:
                    return self.db.query_batch_arrays(
                        dev, top_k=top_k, metric=metric, filters=filters,
                        recency_bias=recency, timestamp_key=tskey,
                        n_valid=len(texts),
                    )
            q_block = generate_query_vectors_batch(self.host_db, texts)
            if self.wire_f16:
                q_block = q_block.astype(np.float16)
            return self.db.query_batch_arrays(
                q_block, top_k=top_k, metric=metric, filters=filters,
                recency_bias=recency, timestamp_key=tskey,
            )

        self._run_flush(lib, srv, n, call)

    def _handle_generic(self, lib, srv):
        from hyperdb_tpu.server import api_response

        method = lib.hdb_srv_req_method(srv).decode()
        path = lib.hdb_srv_req_path(srv).decode()
        blen = ctypes.c_longlong(0)
        bptr = lib.hdb_srv_req_body(srv, ctypes.byref(blen))
        body = ctypes.string_at(bptr, blen.value) if blen.value else b""
        try:
            status, payload = api_response(
                self.db, self.host_db, self.lock, None, method, path, body
            )
        except Exception as e:  # noqa: BLE001 — must answer the socket
            status, payload = 500, {"error": str(e)}
        if status == 200 and path.partition("?")[0] == "/stats":
            f = max(1, self.flushes)
            payload["native"] = {
                "flushes": self.flushes,
                "queries": self.flushed_queries,
                "mean_flush": round(self.flushed_queries / f, 1),
                "max_flush": self.max_flush,
                "engine_ms_per_flush": round(1e3 * self.engine_s / f, 2),
                "engine_s": round(self.engine_s, 3),
                "idle_s": round(self.idle_s, 3),
            }
        data = json.dumps(payload).encode()
        lib.hdb_srv_req_respond(
            srv, status, b"application/json", data, len(data)
        )
