"""ShardedHyperDB — serve one HyperDB's corpus across a device mesh.

BASELINE.json config 5's serving shape: the host-side HyperDB remains the
source of truth (documents, filters, metadata); its vector matrix is
row-sharded over the mesh's 'data' axis and queries run as per-chip scoring
+ local top-k + all-gather merge (exact — see parallel/distributed.py).
Filters are computed on host exactly as in the single-chip engine and ride
along as a sharded row mask.

Chunked corpora are supported: rows are ranked distributed, then chunk rows
of the same document are deduplicated host-side from the merged k*slack
candidates (documents rarely have more than a few chunks; ``chunk_slack``
controls the overfetch).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperdb_tpu.parallel.distributed import sharded_rank_top_k
from hyperdb_tpu.query import engine as _engine
from hyperdb_tpu.query import filters as _filters


class ShardedHyperDB:
    def __init__(
        self,
        db,
        mesh: Mesh,
        axis: str = "data",
        chunk_slack: int = 4,
        device_rows: jax.Array | None = None,
        num_rows: int | None = None,
    ):
        """``device_rows`` injects an already-sharded (n_pad, d) matrix (the
        from_checkpoint path, where the corpus never exists host-side);
        ``num_rows`` is its true row count. Without it the host db's vectors
        are padded and device_put here."""
        self.db = db
        self.mesh = mesh
        self.axis = axis
        self.chunk_slack = chunk_slack

        if device_rows is not None:
            if num_rows is None:
                raise ValueError("num_rows is required with device_rows.")
            self.n = int(num_rows)
            self.n_pad = int(device_rows.shape[0])
            self.rows = device_rows
            # shard-local row normalization on device (zero pad rows stay 0)
            f32 = device_rows.astype(jnp.float32)
            norms = jnp.linalg.norm(f32, axis=1, keepdims=True)
            self.rows_norm = (f32 / jnp.where(norms == 0, 1.0, norms)).astype(
                device_rows.dtype
            )
        else:
            if db.vectors is None or len(db.vectors) == 0:
                raise ValueError("Cannot shard an empty database.")
            n, d = db.vectors.shape
            n_shards = mesh.shape[axis]
            per_shard = -(-n // n_shards)
            per_shard = -(-per_shard // 128) * 128  # grouped-topk tile alignment
            self.n = n
            self.n_pad = per_shard * n_shards

            host = np.zeros((self.n_pad, d), dtype=np.float32)
            host[:n] = db.vectors.astype(np.float32, copy=False)
            norms = np.linalg.norm(host[:n], axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            host_norm = host.copy()
            host_norm[:n] = host[:n] / norms

            dev_dtype = (
                jnp.bfloat16 if db.vectors.dtype == np.float16 else jnp.float32
            )
            sharding = NamedSharding(mesh, P(axis, None))
            self.rows = jax.device_put(host.astype(dev_dtype), sharding)
            self.rows_norm = jax.device_put(host_norm.astype(dev_dtype), sharding)

        self.row_docs = np.zeros(self.n_pad, dtype=np.int64)
        self.row_docs[: self.n] = np.asarray(
            db.source_indices, dtype=np.int64
        )
        self._mask_sharding = NamedSharding(mesh, P(axis))
        self._base_valid = np.zeros(self.n_pad, dtype=bool)
        self._base_valid[: self.n] = True

    @classmethod
    def from_checkpoint(
        cls, directory: str, mesh: Mesh, axis: str = "data", chunk_slack: int = 4
    ) -> "ShardedHyperDB":
        """Serve a checkpoint whose vector matrix exceeds one host's RAM.

        Documents/config/bookkeeping load host-side (they are the payload
        store); the vector matrix streams from the checkpoint's shard files
        straight onto the mesh (persist/checkpoint.load_sharded_vectors) —
        it is never materialized as one host array.
        """
        from hyperdb_tpu.core.db import HyperDB
        from hyperdb_tpu.persist.checkpoint import (
            load_checkpoint,
            load_sharded_vectors,
        )

        db = HyperDB()
        load_checkpoint(db, directory, load_ann_index=False, load_vectors=False)
        rows, n = load_sharded_vectors(directory, mesh, axis=axis)
        return cls(
            db, mesh, axis=axis, chunk_slack=chunk_slack,
            device_rows=rows, num_rows=n,
        )

    def _row_mask(self, filters) -> np.ndarray:
        """Host-side filter evaluation -> sharded row validity mask."""
        db = self.db
        num_docs = len(db.documents)
        mask = np.ones(num_docs, dtype=bool)
        if filters:
            for name, params in filters:
                if name not in _filters.FILTER_NAMES:
                    raise ValueError(f"Invalid filter name {name}")
                if name == "skip_doc":
                    mask &= _filters.skip_doc_mask(num_docs, params)
            doc_mask, override = _filters.apply_filters(db, filters, mask)
            if override is not None:
                raise ValueError(
                    "key filters replace document vectors and are not "
                    "supported on the sharded path; use HyperDB.query."
                )
            mask = doc_mask
        rows = self._base_valid.copy()
        rows[: self.n] &= mask[self.row_docs[: self.n]]
        return rows

    def query_batch(
        self,
        query_inputs,
        top_k: int = 5,
        filters=None,
        metric: str = "cosine_similarity",
        return_similarities: bool = True,
    ):
        db = self.db
        if isinstance(query_inputs, np.ndarray) and query_inputs.ndim == 2:
            q = query_inputs.astype(np.float32)
        else:
            q = np.stack(
                [
                    _engine.generate_and_validate_query_vector(db, qi)
                    for qi in query_inputs
                ]
            ).astype(np.float32)

        row_mask = self._row_mask(filters)
        chunked = len(db.documents) != self.n
        k_fetch = min(
            top_k * (self.chunk_slack if chunked else 1),
            self.n_pad // self.mesh.shape[self.axis],
        )

        prenorm = metric == "cosine_similarity"
        vals, idx = sharded_rank_top_k(
            self.mesh,
            jnp.asarray(q),
            self.rows_norm if prenorm else self.rows,
            jax.device_put(row_mask, self._mask_sharding),
            k=k_fetch,
            metric="dot_product" if prenorm else metric,
            axis=self.axis,
        )
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        if prenorm:
            # dot over unit rows == cosine up to query norm; rescale so the
            # returned scores are true cosine similarities
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            vals = vals / qn

        results = []
        for b in range(q.shape[0]):
            row = []
            seen: set[int] = set()
            for r, score in zip(idx[b], vals[b]):
                if r >= self.n or not np.isfinite(score):
                    continue
                doc_id = int(self.row_docs[r])
                if doc_id in seen:
                    continue
                seen.add(doc_id)
                document = db.documents[doc_id]
                if return_similarities:
                    row.append((document, float(score), doc_id))
                else:
                    row.append(document)
                if len(row) >= top_k:
                    break
            results.append(row)
        return results
