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

Array surface (v1): the unchunked exact scan — rows == documents, no
filters/recency. Queries are padded to pow2 batch buckets on the leader so
every process compiles the same handful of programs.

Full query surface (v2, VERDICT r3 #4): construct the service with the
leader's host ``HyperDB`` (``host_db=``) and :meth:`query_batch` serves
filters (metadata / sentence / skip_doc / key overrides), recency, and
chunked corpora with the single-chip engine's doc-level semantics. The
data-dependent pieces ride the same control channel:

  - filter masks and recency vectors are evaluated doc-level on the leader
    (it owns the documents), expanded to (n_pad,) row vectors, and relayed
    ONCE per (filter spec, recency spec) as a cached PLANE — every process
    builds its sharded block from its local slice, so the relay cost is
    paid per plane, not per query;
  - a key filter's per-document override block is relayed the same way
    (its own row-sharded matrix, identity row->doc map — the
    ShardedHyperDB._query_override formulation);
  - the chunk-refill loop's data-dependent fetch depth is just MORE
    broadcast+collective steps: the leader dedups host-side
    (parallel.sharded_db.dedup_doc_candidates — shared with the
    single-process sharded path) and relays each deeper refetch.

Followers stay dumb executors: they cache planes by token (leader and
follower evict in the same insertion order, so caches never diverge) and
run whatever collective the message names.

Tested across real process boundaries in tests/test_multihost.py
(jax.distributed CPU mesh, Gloo collectives — the structure a v5e pod
runs over ICI/DCN); the v2 oracle is the single-chip engine itself in
benchmarks/multihost_serve_dryrun.py.
"""

from __future__ import annotations

import pickle
import socket
import struct
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperdb_tpu.parallel.distributed import (
    sharded_rank_top_k,
    sharded_rank_top_k_int8,
)

_HDR = struct.Struct("<I")
_SENTINEL = {"op": "stop"}
_PLANE_CACHE_MAX = 8  # device blocks per process; leader+followers in sync


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
                 leader_host: str = "127.0.0.1", prenormalized: bool = True,
                 host_db=None, chunk_slack: int = 4, row_scales=None,
                 ack_timeout_s: float | None = 60.0):
        self.mesh = mesh
        self.axis = axis
        # Fault detection on the query path (VERDICT r4 #7): every relayed
        # message is acknowledged by each follower BEFORE it enters the
        # collective, with this deadline on the leader's socket. A follower
        # that CLOSES already raises (ConnectionError in _recv_msg / EPIPE
        # on send); a follower that HANGS — alive but not draining its
        # control socket — previously blocked the leader forever (in
        # sendall once the TCP buffer filled, or in the collective the
        # follower never joined). With the ack barrier the leader raises
        # RuntimeError within the deadline and, crucially, has NOT entered
        # the collective — the mesh is not wedged and the front-end can
        # surface the error. None disables (the pre-round-5 behavior).
        self.ack_timeout_s = ack_timeout_s
        self.rows = rows
        self.row_valid = row_valid
        # int8-pure pod serving: ``rows`` is the quantized (n_pad, d) int8
        # matrix and ``row_scales`` its (n_pad,) per-row f32 scales
        # (build with build_sharded_rows(..., precision="int8") — per-row
        # symmetric quantization needs no cross-shard calibration).
        # Queries quantize on device inside the shard program; cosine
        # requires prenormalized=True (rows normalized BEFORE quantizing).
        self.row_scales = row_scales
        self._int8 = str(rows.dtype) == "int8"
        if self._int8 and row_scales is None:
            raise ValueError("int8 rows need row_scales")
        self.num_rows = int(num_rows)
        self.n_pad = int(rows.shape[0])
        self.dim = int(rows.shape[1])
        self.prenormalized = prenormalized
        self.process_id = jax.process_index()
        self._procs = jax.process_count()
        # v2 doc-level surface: the leader's host HyperDB owns documents,
        # filters, and the row->doc map; followers pass host_db=None
        self.host_db = host_db
        self.chunk_slack = int(chunk_slack)
        if host_db is not None:
            self.row_docs = np.asarray(host_db.source_indices, dtype=np.int64)
            if self.row_docs.shape[0] != self.num_rows:
                raise ValueError(
                    f"host_db has {self.row_docs.shape[0]} chunk rows but "
                    f"num_rows={self.num_rows}: the sharded matrix must "
                    "hold one row per host chunk, in host order"
                )
            self._base_valid = np.arange(self.n_pad) < self.num_rows
        # plane caches: follower side keyed by token -> device arrays;
        # leader side keyed by plane spec -> token. Both sides evict in
        # the SAME insertion order (bounded at _PLANE_CACHE_MAX), so a
        # token the leader still remembers is always live on followers.
        self._plane_cache: "OrderedDict[int, tuple]" = OrderedDict()
        self._plane_tokens: "OrderedDict[tuple, int]" = OrderedDict()
        self._next_token = 1
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
            # bounds sendall against a hung follower's full TCP buffer as
            # well as the per-message ack read (see __init__)
            conn.settimeout(self.ack_timeout_s)
            self._conns.append(conn)
        self._listener.settimeout(None)

    def _broadcast(self, msg) -> None:
        """Leader: relay one control message to every follower and wait for
        each follower's 1-byte ack (deadline ``ack_timeout_s``) BEFORE the
        caller enters the collective. Raises RuntimeError naming the dead/
        hung follower instead of deadlocking the mesh (VERDICT r4 #7)."""
        for i, conn in enumerate(self._conns):
            try:
                _send_msg(conn, msg)
            except OSError as e:
                raise RuntimeError(
                    f"control-channel send to follower {i + 1} failed "
                    f"({e}); not entering the collective"
                ) from e
        if self.ack_timeout_s is None:
            return
        for i, conn in enumerate(self._conns):
            try:
                ack = conn.recv(1)
            except socket.timeout as e:
                raise RuntimeError(
                    f"follower {i + 1} did not acknowledge within "
                    f"{self.ack_timeout_s}s (hung follower?); not entering "
                    "the collective"
                ) from e
            except OSError as e:
                raise RuntimeError(
                    f"follower {i + 1} control channel failed ({e}); not "
                    "entering the collective"
                ) from e
            if not ack:
                raise RuntimeError(
                    f"follower {i + 1} closed the control channel; not "
                    "entering the collective"
                )

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

    # ----------------------------------------------------- planes (v2)
    def _install_plane(self, token: int, n: int, mask_full, recency_full,
                       rows_full) -> None:
        """Build THIS process's sharded device blocks for one plane from
        the full host-side vectors (every process holds the same full
        vectors at this point — the leader computed them, followers decoded
        the relay) and cache them by token. Eviction is FIFO at
        ``_PLANE_CACHE_MAX`` on every process: planes install in message
        order everywhere, so the caches evict identically and a token the
        leader still references is always live on followers."""
        local = n // self._procs
        lo = self.process_id * local
        axis_sh = NamedSharding(self.mesh, P(self.axis))
        rows_sh = NamedSharding(self.mesh, P(self.axis, None))
        mask_dev = jax.make_array_from_process_local_data(
            axis_sh, np.ascontiguousarray(mask_full[lo:lo + local])
        )
        rec_dev = None
        if recency_full is not None:
            rec_dev = jax.make_array_from_process_local_data(
                axis_sh, np.ascontiguousarray(recency_full[lo:lo + local])
            )
        rows_dev = None
        if rows_full is not None:
            rows_dev = jax.make_array_from_process_local_data(
                rows_sh, np.ascontiguousarray(rows_full[lo:lo + local])
            )
        if len(self._plane_cache) >= _PLANE_CACHE_MAX:
            self._plane_cache.popitem(last=False)
        self._plane_cache[token] = (n, rows_dev, mask_dev, rec_dev)

    def _ensure_plane(self, spec, n: int, mask_full, recency_full,
                      rows_full) -> int:
        """Leader: return the token of a live plane for ``spec``, relaying
        and installing it on every process first if it is not cached. The
        relay cost (mask bits + optional recency/override bytes) is paid
        once per plane, not per query."""
        tok = self._plane_tokens.get(spec)
        if tok is not None:
            return tok
        tok = self._next_token
        self._next_token += 1
        msg = {
            "op": "plane", "token": tok, "n": n,
            "mask": np.packbits(mask_full).tobytes(),
            "recency": (recency_full.astype(np.float32).tobytes()
                        if recency_full is not None else None),
            "rows": (rows_full.astype(np.float32).tobytes()
                     if rows_full is not None else None),
        }
        self._broadcast(msg)
        self._install_plane(tok, n, mask_full, recency_full, rows_full)
        if len(self._plane_tokens) >= _PLANE_CACHE_MAX:
            self._plane_tokens.popitem(last=False)
        self._plane_tokens[spec] = tok
        return tok

    def _run_plane_query(self, q: np.ndarray, k: int, metric: str,
                         token: int):
        """One collective step against a plane — run identically by the
        leader and every follower (same args arrive via the relay)."""
        if token == 0:
            rows_dev, mask_dev, rec_dev = self.rows, self.row_valid, None
            is_override = False
        else:
            _, rows_ov, mask_dev, rec_dev = self._plane_cache[token]
            is_override = rows_ov is not None
            rows_dev = rows_ov if is_override else self.rows
        if (not is_override and metric == "cosine_similarity"
                and self.prenormalized):
            # unit rows + unit query: dot IS cosine, and the doc-level
            # recency term composes additively exactly as on the
            # single-chip engine (override planes are NOT prenormalized:
            # their cosine runs inside the sharded program)
            q32 = np.asarray(q, dtype=np.float32)
            norms = np.linalg.norm(q32, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            q = (q32 / norms).astype(q.dtype)
            metric = "dot_product"
        if self._int8 and not is_override:
            # quantized scan over the int8 shards (queries quantize on
            # device inside the shard program, ops/quantized semantics);
            # override planes stay f32 — they replace the corpus entirely
            if metric != "dot_product":
                raise ValueError(
                    "int8 multihost rows support cosine_similarity and "
                    f"dot_product only (got '{metric}')"
                )
            return sharded_rank_top_k_int8(
                self.mesh, jnp.asarray(q, dtype=jnp.float32), self.rows,
                self.row_scales, mask_dev, k=k, recency=rec_dev,
                axis=self.axis,
            )
        return sharded_rank_top_k(
            self.mesh, jnp.asarray(q), rows_dev, mask_dev, k=k,
            metric=metric, recency=rec_dev, axis=self.axis,
        )

    def _relay_and_run(self, q: np.ndarray, k: int, metric: str,
                       token: int):
        msg = {
            "op": "query", "q": q.tobytes(), "dtype": q.dtype.str,
            "shape": q.shape, "k": k, "metric": metric, "token": token,
        }
        self._broadcast(msg)
        # observability: refill loops show up as >1 step per query_batch
        self.collective_steps = getattr(self, "collective_steps", 0) + 1
        return self._run_plane_query(q, k, metric, token)

    def _validate_metric(self, metric: str) -> None:
        """Leader-side pre-relay validation: a metric the executor would
        refuse must raise BEFORE any follower receives the message, or the
        mesh desynchronizes."""
        if not self._int8:
            return
        if metric not in ("cosine_similarity", "dot_product"):
            raise ValueError(
                "int8 multihost rows support cosine_similarity and "
                f"dot_product only (got '{metric}')"
            )
        if metric == "cosine_similarity" and not self.prenormalized:
            raise ValueError(
                "int8 cosine needs prenormalized rows (normalize before "
                "quantizing: build_sharded_rows(..., precision='int8'))"
            )

    # -------------------------------------------------------------- compute
    def _run_block(self, q_pad: np.ndarray, k_pad: int, metric: str):
        q = q_pad
        if metric == "cosine_similarity" and self.prenormalized:
            q32 = np.asarray(q, dtype=np.float32)
            norms = np.linalg.norm(q32, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            q = (q32 / norms).astype(q_pad.dtype)
            metric = "dot_product"  # unit rows: dot == cosine exactly
        if self._int8:
            return sharded_rank_top_k_int8(
                self.mesh, jnp.asarray(q, dtype=jnp.float32), self.rows,
                self.row_scales, self.row_valid, k=k_pad, axis=self.axis,
            )
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

        Filters/recency route through the doc-level :meth:`query_batch`
        (v2) when the leader was built with ``host_db``; without it they
        raise so callers never get silently unfiltered results. Rows are
        truncated to the shortest row when a filter leaves fewer than
        ``top_k`` documents for some query (ShardedHyperDB parity)."""
        del ann_percent
        if filters or recency_bias or timestamp_key:
            if self.host_db is None:
                raise ValueError(
                    "filters/recency on the multihost array surface need "
                    "the doc-level service: construct the leader with "
                    "host_db= (v1 relays the unfiltered exact scan only)"
                )
            rows = self.query_batch(
                np.asarray(query_vectors), top_k=top_k, filters=filters,
                metric=metric, recency_bias=recency_bias,
                timestamp_key=timestamp_key,
            )
            k = min((len(r) for r in rows), default=0)
            ids = np.array(
                [[r[2] for r in row[:k]] for row in rows], dtype=np.int64
            ).reshape(len(rows), k)
            scores = np.array(
                [[r[1] for r in row[:k]] for row in rows], dtype=np.float32
            ).reshape(len(rows), k)
            return ids, scores
        if self.process_id != 0:
            raise RuntimeError("query_batch_arrays is leader-only")
        self._validate_metric(metric)
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
        self._broadcast(msg)
        vals, idx = self._run_block(q, k_pad, metric)
        idx_h, vals_h = jax.device_get((idx, vals))
        return (
            np.asarray(idx_h[:b_real, :k], dtype=np.int64),
            np.asarray(vals_h[:b_real, :k], dtype=np.float32),
        )

    # ------------------------------------------------- full surface (v2)
    def query_batch(self, query_inputs, top_k: int = 5, filters=None,
                    metric: str = "cosine_similarity",
                    return_similarities: bool = True,
                    recency_bias: float = 0, timestamp_key=None):
        """Doc-level query surface over the multi-process mesh: filters,
        recency, key-filter overrides, and chunked-corpus dedup+refill with
        the single-chip engine's semantics (leader-only; requires
        ``host_db``). Every data-dependent step — a new filter plane, each
        deeper refill fetch — is one more relayed broadcast+collective, so
        followers stay in lockstep without understanding documents."""
        from hyperdb_tpu.parallel.sharded_db import (
            compute_filter_row_mask,
            dedup_doc_candidates,
        )
        from hyperdb_tpu.query import engine as _engine
        from hyperdb_tpu.query.filters import hashable_filters

        if self.process_id != 0:
            raise RuntimeError("query_batch is leader-only")
        self._validate_metric(metric)
        db = self.host_db
        if db is None:
            raise RuntimeError(
                "the full query surface needs the leader's host HyperDB: "
                "construct MultihostQueryService with host_db="
            )
        if isinstance(query_inputs, np.ndarray) and query_inputs.ndim == 2:
            q = np.asarray(query_inputs, dtype=np.float32)
        else:
            q = np.stack([
                _engine.generate_and_validate_query_vector(db, qi)
                for qi in query_inputs
            ]).astype(np.float32)
        if q.shape[1] != self.dim:
            raise ValueError(
                f"query block must be (B, {self.dim}); got {q.shape}"
            )
        b_real = q.shape[0]
        b_pad = _pad_pow2(b_real)
        if b_pad != b_real:
            q = np.concatenate([q, np.repeat(q[:1], b_pad - b_real, axis=0)])

        row_mask, (doc_mask, override) = compute_filter_row_mask(
            db, filters, self._base_valid, self.row_docs, self.num_rows,
        )
        if override is not None:
            return self._query_override_mh(
                q, doc_mask, override, top_k, metric, return_similarities,
                recency_bias, timestamp_key, filters,
            )[:b_real]
        if not row_mask[: self.num_rows].any():
            # filters emptied the corpus: empty rows, NO collective (the
            # followers never see a message, so nothing deadlocks)
            return [[] for _ in range(b_real)]

        num_docs = len(db.documents)
        recency_full = None
        if recency_bias != 0:
            dmask = np.zeros(num_docs, dtype=bool)
            surviving = np.unique(self.row_docs[row_mask[: self.num_rows]])
            dmask[surviving.astype(np.int64)] = True
            dense = _engine.handle_timestamps(
                db, recency_bias, timestamp_key, np.flatnonzero(dmask)
            )
            recency_full = np.zeros(self.n_pad, dtype=np.float32)
            recency_full[: self.num_rows] = dense[self.row_docs]

        if filters is None and recency_full is None:
            token = 0  # the base plane: padding-only mask, already sharded
        else:
            token = self._ensure_plane(
                ("rows", hashable_filters(filters), float(recency_bias),
                 timestamp_key),
                self.n_pad, row_mask, recency_full, None,
            )

        chunked = num_docs != self.num_rows
        if chunked:
            k_fetch = 1 << max(0, (top_k * self.chunk_slack - 1)).bit_length()
        else:
            k_fetch = top_k
        k_fetch = min(k_fetch, self.n_pad)
        while True:
            vals, idx = self._relay_and_run(q, k_fetch, metric, token)
            idx, vals = jax.device_get((idx, vals))
            results, need_refill = dedup_doc_candidates(
                vals, idx, self.row_docs, db.documents, top_k, k_fetch,
                self.num_rows, self.n_pad, return_similarities,
            )
            if not need_refill:
                return results[:b_real]
            # one worst-case jump instead of repeated doublings (the
            # single-process sharded path's refill rule)
            max_chunks = max(db.split_info.values(), default=1)
            worst = 1 << max(0, int(top_k * max_chunks - 1)).bit_length()
            k_fetch = min(max(k_fetch * 2, worst), self.n_pad)

    def _query_override_mh(self, q, doc_mask, override, top_k, metric,
                           return_similarities, recency_bias, timestamp_key,
                           filters):
        """Key-filter override scoring on the multi-process mesh: the
        per-document block is relayed once per filter spec as its own
        row-sharded plane (identity row->doc map, no dedup/refill) — the
        ShardedHyperDB._query_override formulation across processes."""
        from hyperdb_tpu.query import engine as _engine
        from hyperdb_tpu.query.filters import hashable_filters

        db = self.host_db
        if not doc_mask.any():
            return [[] for _ in range(q.shape[0])]
        num_docs = len(db.documents)
        n_dev = self.mesh.shape[self.axis]
        per_shard = -(-num_docs // n_dev)
        per_shard = -(-per_shard // 128) * 128
        n_ov = per_shard * n_dev  # procs divide n_dev, so local slices align

        spec = ("override", hashable_filters(filters), float(recency_bias),
                timestamp_key)
        if spec in self._plane_tokens:
            token = self._plane_tokens[spec]
        else:
            rows_full = np.zeros((n_ov, self.dim), dtype=np.float32)
            rows_full[:num_docs] = np.asarray(override, dtype=np.float32)
            valid = np.zeros(n_ov, dtype=bool)
            valid[:num_docs] = doc_mask
            rec = None
            if recency_bias != 0:
                dense = _engine.handle_timestamps(
                    db, recency_bias, timestamp_key, np.flatnonzero(doc_mask)
                )
                rec = np.zeros(n_ov, dtype=np.float32)
                rec[:num_docs] = dense
            token = self._ensure_plane(spec, n_ov, valid, rec, rows_full)

        k = min(min(top_k, int(doc_mask.sum())), n_ov)
        vals, idx = self._relay_and_run(q, k, metric, token)
        idx, vals = jax.device_get((idx, vals))
        results = []
        for b in range(q.shape[0]):
            row = []
            for doc_id, score in zip(idx[b], vals[b]):
                if doc_id >= num_docs or not np.isfinite(score):
                    continue
                if len(row) >= top_k:
                    break
                document = db.documents[int(doc_id)]
                if return_similarities:
                    row.append((document, float(score), int(doc_id)))
                else:
                    row.append(document)
            results.append(row)
        return results

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
    def serve_forever(self, max_msgs: int | None = None) -> None:
        """Follower loop: execute the leader's collective calls until the
        stop sentinel arrives. Each message is acknowledged with one byte
        BEFORE execution — the leader's liveness barrier (VERDICT r4 #7).

        ``max_msgs`` returns after that many non-stop messages (fault-
        injection hook for tests: a follower that stops draining its
        socket mid-stream simulates a hung host)."""
        if self.process_id == 0:
            raise RuntimeError("serve_forever is follower-only")
        assert self._sock is not None, "call connect() first"
        seen = 0
        while True:
            if max_msgs is not None and seen >= max_msgs:
                return
            msg = _recv_msg(self._sock)
            op = msg.get("op")
            if op == "stop":
                return
            try:
                self._sock.sendall(b"\x01")
            except OSError:
                return  # leader gone: nothing left to follow
            seen += 1
            if op == "plane":  # v2: install the relayed filter/override plane
                n = msg["n"]
                mask = np.unpackbits(
                    np.frombuffer(msg["mask"], dtype=np.uint8), count=n
                ).astype(bool)
                rec = (np.frombuffer(msg["recency"], dtype=np.float32)
                       if msg.get("recency") is not None else None)
                rows = None
                if msg.get("rows") is not None:
                    rows = np.frombuffer(
                        msg["rows"], dtype=np.float32
                    ).reshape(n, self.dim)
                self._install_plane(msg["token"], n, mask, rec, rows)
                continue
            q = np.frombuffer(
                msg["q"], dtype=np.dtype(msg["dtype"])
            ).reshape(msg["shape"])
            if "token" in msg:  # v2: plane-addressed collective step
                vals, idx = self._run_plane_query(
                    q, msg["k"], msg["metric"], msg["token"]
                )
            else:  # v1 array surface
                vals, idx = self._run_block(q, msg["k_pad"], msg["metric"])
            # materialize the replicated outputs so the collective fully
            # completes in this process before waiting for the next query
            jax.block_until_ready((vals, idx))


def build_sharded_rows(mesh: Mesh, local_rows: np.ndarray, num_rows: int,
                       axis: str = "data", normalize: bool = True,
                       precision: str = "f32"):
    """Assemble the global (n_pad, d) row matrix + validity mask from each
    process's LOCAL row block (the multi-host ingest pattern — no process
    ever holds the whole corpus).

    ``local_rows`` is this process's contiguous slice of the padded global
    matrix (all processes pass the same ``num_rows``: the true global row
    count before padding). Rows are L2-normalized shard-locally when
    ``normalize`` (cosine-ready unit rows).

    ``precision="int8"`` quantizes the local block per-row (symmetric,
    ops/quantized.quantize_rows — shard-local by construction, no
    cross-shard calibration) and returns ``(rows_q, row_scales, row_valid,
    n_pad)``; pass both blocks to MultihostQueryService(rows=rows_q,
    row_scales=...). Normalize-then-quantize makes the quantized dot a
    true (quantized) cosine, so ``prenormalized=True`` holds."""
    local = np.asarray(local_rows, dtype=np.float32)
    if normalize:
        norms = np.linalg.norm(local, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        local = local / norms
    sharding = NamedSharding(mesh, P(axis, None))
    axis_sh = NamedSharding(mesh, P(axis))
    start = jax.process_index() * local.shape[0]
    valid_local = np.zeros(local.shape[0], dtype=bool)
    global_ids = np.arange(start, start + local.shape[0])
    valid_local[global_ids < num_rows] = True
    row_valid = jax.make_array_from_process_local_data(axis_sh, valid_local)
    if precision == "int8":
        from hyperdb_tpu.ops.quantized import quantize_rows

        q_local, s_local = quantize_rows(local)
        rows_q = jax.make_array_from_process_local_data(sharding, q_local)
        row_scales = jax.make_array_from_process_local_data(
            axis_sh, s_local.astype(np.float32)
        )
        return rows_q, row_scales, row_valid, int(rows_q.shape[0])
    rows = jax.make_array_from_process_local_data(sharding, local)
    return rows, row_valid, int(rows.shape[0])
