"""IVF (inverted-file) index — the TPU-native Annoy replacement.

The reference's ANN layer is a C++ random-projection forest
(/root/reference/hyperdb/hyperdb.py:198-235) rebuilt from scratch on every
mutation. On TPU the natural index is IVF, because both of its phases are
MXU matmuls (SURVEY.md §2.3, BASELINE.json north star):

- build: k-means over the corpus — assignment is a (N, d) x (d, nlist)
  matmul + argmax, centroid update a segment-sum; trained on a subsample,
  then one full assignment pass. Rows are stored bucketed by cluster
  (CSR layout: ``row_order`` + ``offsets``).
- query: score the (nlist, d) centroid matrix against the query (one small
  matmul), walk clusters in descending score until the candidate budget is
  reached (reference Q12 semantics: max(top_k*20, ceil(N*ann%/100))), and
  hand the candidate row ids to the engine for **exact** re-scoring (the
  reference returns raw ANN distances in ANN order — Q3 — which we fix).

Metric handling mirrors the reference's cosine emulation (Q2): cosine /
angular / dot cluster on unit-sphere vectors; euclidean / manhattan /
hamming cluster raw with L2 k-means. The index only *generates candidates*;
metric exactness comes from the re-scoring pass, so an L2 coarse quantizer
is acceptable for all of them.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_TRAIN_SAMPLE = 131072
_KMEANS_ITERS = 12


def default_nlist(n: int) -> int:
    """sqrt-scaled cluster count, capped at 4096 (BASELINE.json config 3)."""
    return int(min(4096, max(16, 2 * round(np.sqrt(n)))))


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans(train: jax.Array, init: jax.Array, nlist: int, iters: int):
    """Lloyd iterations on device; assignment via argmax(x.c - |c|^2/2)."""

    def step(centroids, _):
        logits = train @ centroids.T - 0.5 * jnp.sum(
            centroids * centroids, axis=1
        )
        assign = jnp.argmax(logits, axis=1)
        sums = jax.ops.segment_sum(train, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(
            jnp.ones(train.shape[0], dtype=jnp.float32), assign, num_segments=nlist
        )
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were
        new_centroids = jnp.where(
            (counts > 0)[:, None], new_centroids, centroids
        )
        return new_centroids, None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids


@jax.jit
def _assign(rows: jax.Array, centroids: jax.Array):
    logits = rows @ centroids.T - 0.5 * jnp.sum(centroids * centroids, axis=1)
    return jnp.argmax(logits, axis=1)


class IVFIndex:
    is_ann = True

    def __init__(
        self,
        centroids: np.ndarray,
        row_order: np.ndarray,
        offsets: np.ndarray,
        metric: str,
        normalized: bool,
    ):
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self.row_order = np.asarray(row_order, dtype=np.int32)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.metric = metric
        self.normalized = bool(normalized)
        self.nlist = self.centroids.shape[0]
        self.dim = self.centroids.shape[1]
        self._sizes = np.diff(self.offsets)

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        metric: str = "cosine",
        nlist: int | None = None,
        n_trees: int = 10,
        seed: int = 0,
        device_rows=None,
    ) -> "IVFIndex":
        """``device_rows`` short-circuits the host->device corpus upload:
        an already-device-resident (N_pad >= N, d) matrix — the store's
        padded view, pre-normalized for cosine/angular/dot metrics — is
        sampled and assignment-scanned in place, so building the index adds
        no transfer beyond the view queries need anyway (a 2M x 384 build
        was upload-dominated without this)."""
        n, d = vectors.shape
        nlist = nlist or default_nlist(n)
        nlist = min(nlist, n)

        normalized = metric in ("cosine", "angular", "dot")
        rng = np.random.default_rng(seed)

        if device_rows is not None:
            # sample + train + assign on device; only centroids/assignments
            # (small) cross the link
            if n > _TRAIN_SAMPLE:
                train_idx = np.sort(rng.choice(n, size=_TRAIN_SAMPLE, replace=False))
            else:
                train_idx = np.arange(n)
            train = device_rows[jnp.asarray(train_idx)].astype(jnp.float32)
            init_idx = rng.choice(train_idx.size, size=nlist, replace=False)
            init = train[jnp.asarray(init_idx)]
            centroids = np.asarray(_kmeans(train, init, nlist, _KMEANS_ITERS))
            assign = np.empty(n, dtype=np.int64)
            cj = jnp.asarray(centroids)
            chunk = 1 << 20
            for start in range(0, n, chunk):
                stop = min(start + chunk, n)
                block = device_rows[start:stop].astype(jnp.float32)
                assign[start:stop] = np.asarray(_assign(block, cj))
        else:
            data = np.asarray(vectors, dtype=np.float32)
            if normalized:
                norms = np.linalg.norm(data, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                data = data / norms

            if n > _TRAIN_SAMPLE:
                train_idx = rng.choice(n, size=_TRAIN_SAMPLE, replace=False)
                train = data[train_idx]
            else:
                train = data
            init_idx = rng.choice(train.shape[0], size=nlist, replace=False)
            init = train[init_idx]

            centroids = np.asarray(
                _kmeans(jnp.asarray(train), jnp.asarray(init), nlist, _KMEANS_ITERS)
            )

            # full assignment pass, chunked to bound device memory
            assign = np.empty(n, dtype=np.int64)
            cj = jnp.asarray(centroids)
            chunk = 1 << 20
            for start in range(0, n, chunk):
                block = jnp.asarray(data[start : start + chunk])
                assign[start : start + chunk] = np.asarray(_assign(block, cj))

        row_order = np.argsort(assign, kind="stable").astype(np.int32)
        counts = np.bincount(assign, minlength=nlist)
        offsets = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return cls(centroids, row_order, offsets, metric, normalized)

    # ------------------------------------------------------------- update

    def add_rows(self, vectors: np.ndarray, first_row_id: int) -> None:
        """Incrementally assign new rows to existing clusters.

        The reference rebuilds its entire Annoy forest on every mutation
        (hyperdb.py:222-223, flagged ♨ in SURVEY.md §3.2). Appending rows
        only needs one assignment matmul; callers should trigger a full
        rebuild when the corpus has grown substantially past the clustering
        (HyperDB does this at 1.5x the size at build time).
        """
        data = np.asarray(vectors, dtype=np.float32)
        if self.normalized:
            norms = np.linalg.norm(data, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            data = data / norms
        assign = np.asarray(
            _assign(jnp.asarray(data), jnp.asarray(self.centroids))
        )
        new_ids = np.arange(
            first_row_id, first_row_id + data.shape[0], dtype=np.int32
        )
        # splice each new id into its cluster's segment (rebuild the CSR)
        order = []
        for cluster in range(self.nlist):
            lo, hi = self.offsets[cluster], self.offsets[cluster + 1]
            order.append(self.row_order[lo:hi])
            added = new_ids[assign == cluster]
            if added.size:
                order.append(added)
        self.row_order = np.concatenate(order).astype(np.int32)
        counts = np.diff(self.offsets) + np.bincount(assign, minlength=self.nlist)
        self.offsets = np.zeros(self.nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=self.offsets[1:])
        self._sizes = np.diff(self.offsets)

    @property
    def num_rows(self) -> int:
        return int(self.offsets[-1])

    # ------------------------------------------------------------- query

    def probe(self, query_vector: np.ndarray, budget: int) -> np.ndarray:
        """Candidate row ids: walk clusters by centroid score until the
        budget is covered (Q12's candidate-count contract mapped to nprobe)."""
        q = np.asarray(query_vector, dtype=np.float32).reshape(-1)
        if self.normalized:
            norm = np.linalg.norm(q)
            if norm > 0:
                q = q / norm
            order = np.argsort(-(self.centroids @ q))
        else:
            d2 = np.sum(self.centroids * self.centroids, axis=1) - 2 * (
                self.centroids @ q
            )
            order = np.argsort(d2)

        picked = []
        total = 0
        for cluster in order:
            lo, hi = self.offsets[cluster], self.offsets[cluster + 1]
            if hi <= lo:
                continue
            picked.append(self.row_order[lo:hi])
            total += hi - lo
            if total >= budget:
                break
        if not picked:
            return np.zeros(0, dtype=np.int32)
        return np.concatenate(picked)

    def probe_batch(
        self, q_block: np.ndarray, budget: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Shared probe frontier for a (B, d) query block.

        Every query walks its own centroid ranking until ``budget`` rows are
        covered (the same Q12 contract as :meth:`probe`), but the gathered
        candidate set is the **union** of all probed clusters, so the engine
        gathers each row once and scores the whole block against it in a
        single matmul. Returns ``(cand_ids, valid)`` where ``cand_ids`` is a
        (U,) i32 vector of global row ids and ``valid`` a (B, U) bool matrix
        marking which union rows each query actually probed.
        """
        q = np.asarray(q_block, dtype=np.float32)
        if self.normalized:
            norms = np.linalg.norm(q, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            q = q / norms
            order = np.argsort(-(q @ self.centroids.T), axis=1)
        else:
            d2 = np.sum(self.centroids * self.centroids, axis=1)[None, :] - 2 * (
                q @ self.centroids.T
            )
            order = np.argsort(d2, axis=1)

        nq = q.shape[0]
        sizes = self._sizes
        # per-query probed-cluster set: walk the per-query ranking until the
        # cumulative row count covers the budget (vectorized over the block)
        sizes_ranked = sizes[order]  # (B, nlist)
        covered = np.cumsum(sizes_ranked, axis=1)
        # probe cluster j iff everything before it hasn't covered the budget
        probe_col = np.concatenate(
            [np.ones((nq, 1), dtype=bool), covered[:, :-1] < budget], axis=1
        )
        probed = np.zeros((nq, self.nlist), dtype=bool)
        np.put_along_axis(probed, order, probe_col, axis=1)
        probed &= sizes[None, :] > 0  # never "probe" empty clusters

        union_clusters = np.flatnonzero(probed.any(axis=0))
        if union_clusters.size == 0:
            return np.zeros(0, dtype=np.int32), np.zeros((nq, 0), dtype=bool)
        segments = [
            self.row_order[self.offsets[c] : self.offsets[c + 1]]
            for c in union_clusters
        ]
        cand_ids = np.concatenate(segments).astype(np.int32)
        cluster_of_row = np.repeat(union_clusters, sizes[union_clusters])
        valid = probed[:, cluster_of_row]  # (B, U)
        return cand_ids, valid

    def candidate_doc_mask(self, db, query_vector, budget: int) -> np.ndarray:
        rows = self.probe(query_vector, budget)
        mask = np.zeros(len(db.documents), dtype=bool)
        if rows.size:
            src = np.asarray(db.source_indices, dtype=np.int64)
            mask[src[rows]] = True
        return mask

    # ------------------------------------------------------------- persist

    def state(self) -> dict:
        return {
            "kind": "ivf",
            "metric": self.metric,
            "normalized": self.normalized,
            "centroids": self.centroids,
            "row_order": self.row_order,
            "offsets": self.offsets,
        }

    @classmethod
    def from_state(cls, state: dict) -> "IVFIndex":
        return cls(
            centroids=state["centroids"],
            row_order=state["row_order"],
            offsets=state["offsets"],
            metric=str(state["metric"]),
            normalized=bool(state["normalized"]),
        )
