"""Multi-HOST serving: an SPMD query service over a multi-process mesh.

The single-process serving stack (server.py / native/server.cc) wraps one
``query_batch_arrays`` implementation. Across PROCESS boundaries (a real
pod: one process per host) that is not enough — every process must enter
the same collective program for each query, or the mesh deadlocks. This
module adds the missing piece: a host-side CONTROL CHANNEL that keeps all
processes in lockstep.

    process 0 (leader)                     processes 1..P-1 (followers)
    ------------------                     ----------------------------
    HTTP front-end (any) wraps             serve_forever():
    MultihostQueryService                    recv (q, k, metric) ---+
      .query_batch_arrays(q,...)                                    |
        broadcast (q, k, metric) ----TCP--------------------------->+
        sharded_rank_top_k(...)   <--- same program, same args ---> sharded_rank_top_k(...)
        return replicated (ids, scores)                             discard replicated copy

Scope (v1, documented): the unchunked exact scan — rows == documents, no
filters/recency/chunk-refill. Those paths make a DATA-DEPENDENT number of
collective calls per query (refill loops), which requires the control
channel to relay every step; single-host serving already covers them.
Queries are padded to pow2 batch buckets on the leader so every process
compiles the same handful of programs.

Tested across real process boundaries in tests/test_multihost.py
(jax.distributed CPU mesh, Gloo collectives — the structure a v5e pod
runs over ICI/DCN).
"""

from __future__ import annotations

import pickle
import socket
import struct

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperdb_tpu.parallel.distributed import sharded_rank_top_k

_HDR = struct.Struct("<I")
_SENTINEL = {"op": "stop"}


def _send_msg(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(data)) + data)


def _recv_msg(sock: socket.socket):
    buf = b""
    while len(buf) < _HDR.size:
        chunk = sock.recv(_HDR.size - len(buf))
        if not chunk:
            raise ConnectionError("control channel closed")
        buf += chunk
    (n,) = _HDR.unpack(buf)
    parts = []
    got = 0
    while got < n:
        chunk = sock.recv(min(1 << 20, n - got))
        if not chunk:
            raise ConnectionError("control channel closed mid-message")
        parts.append(chunk)
        got += len(chunk)
    return pickle.loads(b"".join(parts))


def _pad_pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length()


class MultihostQueryService:
    """SPMD query service over a row-sharded multi-process corpus.

    Construct in EVERY process with the same arguments (after
    ``jax.distributed.initialize`` and mesh construction). The leader
    (process 0) gets the serving surface — ``query_batch_arrays`` with the
    same contract as ``HyperDB.query_batch_arrays`` (unchunked subset) —
    and relays each query block to followers, which must be parked in
    :meth:`serve_forever`.

    ``rows`` is the GLOBAL (n_pad, d) jax.Array sharded over ``axis``
    (build it with ``jax.make_array_from_process_local_data`` — each
    process contributes only its local rows); ``row_valid`` the matching
    (n_pad,) validity mask; ``num_rows`` the true row count.
    """

    def __init__(self, mesh: Mesh, rows, row_valid, num_rows: int,
                 axis: str = "data", control_port: int = 0,
                 leader_host: str = "127.0.0.1", prenormalized: bool = True):
        self.mesh = mesh
        self.axis = axis
        self.rows = rows
        self.row_valid = row_valid
        self.num_rows = int(num_rows)
        self.n_pad = int(rows.shape[0])
        self.dim = int(rows.shape[1])
        self.prenormalized = prenormalized
        self.process_id = jax.process_index()
        self._procs = jax.process_count()
        self._conns: list[socket.socket] = []
        self._sock: socket.socket | None = None
        if self._procs > 1:
            if self.process_id == 0:
                srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                srv.bind((leader_host, control_port))
                srv.listen(self._procs)
                self.control_port = srv.getsockname()[1]
                self._listener = srv
            else:
                self.control_port = control_port  # followers must be told

    # -------------------------------------------------------------- wiring
    def accept_followers(self, timeout_s: float = 180.0) -> None:
        """Leader: block until every follower connected (call once).
        Raises socket.timeout if a follower never arrives — better than
        hanging the whole mesh."""
        self._listener.settimeout(timeout_s)
        while len(self._conns) < self._procs - 1:
            conn, _ = self._listener.accept()
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._conns.append(conn)
        self._listener.settimeout(None)

    def connect(self, port: int | None = None,
                leader_host: str = "127.0.0.1",
                retry_s: float = 120.0) -> None:
        """Follower: open the control channel to the leader.

        Retries on refusal: the leader binds its listener after the mesh
        barrier, and under load a follower can reach this call first."""
        import time as _time

        deadline = _time.time() + retry_s
        while True:
            try:
                self._sock = socket.create_connection(
                    (leader_host, port or self.control_port), timeout=30.0
                )
                break
            except OSError:
                if _time.time() > deadline:
                    raise
                _time.sleep(0.5)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    # -------------------------------------------------------------- compute
    def _run_block(self, q_pad: np.ndarray, k_pad: int, metric: str):
        q = q_pad
        if metric == "cosine_similarity" and self.prenormalized:
            q32 = np.asarray(q, dtype=np.float32)
            norms = np.linalg.norm(q32, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            q = (q32 / norms).astype(q_pad.dtype)
            metric = "dot_product"  # unit rows: dot == cosine exactly
        vals, idx = sharded_rank_top_k(
            self.mesh,
            jnp.asarray(q),
            self.rows,
            self.row_valid,
            k=k_pad,
            metric=metric,
            axis=self.axis,
        )
        return vals, idx

    # -------------------------------------------------------------- leader
    def query_batch_arrays(self, query_vectors, top_k: int = 5,
                           metric: str = "cosine_similarity", filters=None,
                           recency_bias: float = 0, timestamp_key=None,
                           ann_percent: int = 5):
        """(B, d) -> ((B, k) int64 ids, (B, k) f32 scores), exact.

        v1 scope: no filters/recency (single-host serving covers those);
        raises on use so callers never get silently unfiltered results."""
        del ann_percent
        if filters or recency_bias or timestamp_key:
            raise ValueError(
                "multihost serving v1 supports the unfiltered exact scan "
                "only (filters/recency need a relayed refill protocol)"
            )
        if self.process_id != 0:
            raise RuntimeError("query_batch_arrays is leader-only")
        q = np.asarray(query_vectors)
        if q.dtype != np.float16:
            q = np.asarray(q, dtype=np.float32)
        if q.ndim != 2 or q.shape[1] != self.dim:
            raise ValueError(
                f"query block must be (B, {self.dim}); got {q.shape}"
            )
        b_real = q.shape[0]
        b_pad = _pad_pow2(b_real)
        if b_pad != b_real:
            q = np.concatenate(
                [q, np.repeat(q[:1], b_pad - b_real, axis=0)]
            )
        k = min(int(top_k), self.num_rows)
        k_pad = min(_pad_pow2(k), self.n_pad)
        msg = {
            "op": "query",
            "q": q.tobytes(),
            "dtype": q.dtype.str,
            "shape": q.shape,
            "k_pad": k_pad,
            "metric": metric,
        }
        for conn in self._conns:
            _send_msg(conn, msg)
        vals, idx = self._run_block(q, k_pad, metric)
        idx_h, vals_h = jax.device_get((idx, vals))
        return (
            np.asarray(idx_h[:b_real, :k], dtype=np.int64),
            np.asarray(vals_h[:b_real, :k], dtype=np.float32),
        )

    # ------------------------------------------------------- stats surface
    # The minimum attribute surface the HTTP front-ends touch, so the
    # leader can be fronted directly by NativeQueryServer/make_server:
    #   NativeQueryServer(svc) serves the binary/text hot paths over the
    #   whole multi-process mesh.
    @property
    def db(self):  # host_db unwrap: the service IS its own host surface
        return self

    def size(self, with_chunks=False, metadata_filter=None):
        del with_chunks, metadata_filter
        return self.num_rows

    @property
    def source_indices(self):
        return range(self.num_rows)  # rows == docs in v1

    ann_metric = "cosine"
    ann_index = None

    def get_cache_size_and_info(self):
        return {"cache_info": {"hits": 0, "misses": 0, "maxsize": 0,
                               "currsize": 0},
                "cache_memory_size": "0 bytes"}

    @property
    def stats(self):
        from hyperdb_tpu.utils.trace import Stats

        if not hasattr(self, "_stats"):
            self._stats = Stats()
        return self._stats

    def close(self) -> None:
        if self.process_id == 0:
            for conn in self._conns:
                try:
                    _send_msg(conn, _SENTINEL)
                    conn.close()
                except OSError:
                    pass
            self._conns.clear()
            if self._procs > 1:
                self._listener.close()
        elif self._sock is not None:
            self._sock.close()
            self._sock = None

    # ------------------------------------------------------------ follower
    def serve_forever(self) -> None:
        """Follower loop: execute the leader's collective calls until the
        stop sentinel arrives."""
        if self.process_id == 0:
            raise RuntimeError("serve_forever is follower-only")
        assert self._sock is not None, "call connect() first"
        while True:
            msg = _recv_msg(self._sock)
            if msg.get("op") == "stop":
                return
            q = np.frombuffer(
                msg["q"], dtype=np.dtype(msg["dtype"])
            ).reshape(msg["shape"])
            vals, idx = self._run_block(q, msg["k_pad"], msg["metric"])
            # materialize the replicated outputs so the collective fully
            # completes in this process before waiting for the next query
            jax.block_until_ready((vals, idx))


def build_sharded_rows(mesh: Mesh, local_rows: np.ndarray, num_rows: int,
                       axis: str = "data", normalize: bool = True):
    """Assemble the global (n_pad, d) row matrix + validity mask from each
    process's LOCAL row block (the multi-host ingest pattern — no process
    ever holds the whole corpus).

    ``local_rows`` is this process's contiguous slice of the padded global
    matrix (all processes pass the same ``num_rows``: the true global row
    count before padding). Rows are L2-normalized shard-locally when
    ``normalize`` (cosine-ready unit rows)."""
    local = np.asarray(local_rows, dtype=np.float32)
    if normalize:
        norms = np.linalg.norm(local, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        local = local / norms
    sharding = NamedSharding(mesh, P(axis, None))
    rows = jax.make_array_from_process_local_data(sharding, local)
    n_pad = int(rows.shape[0])
    start = jax.process_index() * local.shape[0]
    valid_local = np.zeros(local.shape[0], dtype=bool)
    global_ids = np.arange(start, start + local.shape[0])
    valid_local[global_ids < num_rows] = True
    row_valid = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), valid_local
    )
    return rows, row_valid, n_pad
