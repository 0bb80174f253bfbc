"""Versioned binary checkpoint (the recommended fast format).

The reference's formats round-trip the vector matrix through Python lists
(hyperdb.py:775 — a 1M x 384 corpus becomes ~400M Python floats; SURVEY.md
§5 flags this). This format is a directory with:

    manifest.json   — version, dtype, shapes, config echo (fp_precision,
                      ann_metric, metadata_keys, select_keys, add_timestamp)
    vectors.npy     — binary ndarray, exact dtype          (monolithic), or
    vectors/shard_XXXXX.npy — row-range shards             (sharded, v2)
    state.json      — documents, source_indices, split_info, metadata_index,
                      vectors_normalized
    index.npz       — ANN index state (optional)

Unlike the reference (which does not persist config and requires callers to
re-declare metadata_keys on load — SURVEY.md §3.4 note), the manifest
carries the config so a checkpoint is self-describing.

The sharded layout (``rows_per_shard=...`` at save time) exists for corpora
larger than one host's RAM: each shard file is written/read independently,
and :func:`load_sharded_vectors` places row ranges directly onto a device
mesh through memory-mapped reads — the full (N, d) matrix is never
materialized host-side (the shard files are mmapped and only the rows a
local device owns are touched).
"""

from __future__ import annotations

import json
import os

import numpy as np

FORMAT_VERSION = 2
_SUPPORTED_VERSIONS = (1, 2)


def _shard_paths(directory: str, num_shards: int) -> list[str]:
    return [
        os.path.join(directory, "vectors", f"shard_{i:05d}.npy")
        for i in range(num_shards)
    ]


def save_checkpoint(
    db,
    directory: str,
    save_ann_index: bool = True,
    rows_per_shard: int | None = None,
) -> None:
    os.makedirs(directory, exist_ok=True)
    if db.vectors is None or len(db.vectors) == 0 or not db.documents:
        print("Nothing to save. Exit.")
        return
    n = int(db.vectors.shape[0])
    shard_counts = None
    if rows_per_shard is not None and rows_per_shard > 0:
        shard_counts = [
            min(rows_per_shard, n - start) for start in range(0, n, rows_per_shard)
        ]
    manifest = {
        "version": FORMAT_VERSION,
        "dtype": str(np.dtype(db.fp_precision)),
        "num_rows": n,
        "dim": int(db.vectors.shape[1]),
        "fp_precision": str(np.dtype(db.fp_precision)),
        "ann_metric": db.ann_metric,
        "metadata_keys": list(db.metadata_keys),
        "select_keys": list(db.select_keys) if db.select_keys else None,
        "add_timestamp": bool(db.add_timestamp),
        "n_trees": db.n_trees,
        "vector_shards": shard_counts,
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if shard_counts is None:
        np.save(os.path.join(directory, "vectors.npy"), db.vectors)
    else:
        os.makedirs(os.path.join(directory, "vectors"), exist_ok=True)
        start = 0
        for path, count in zip(_shard_paths(directory, len(shard_counts)), shard_counts):
            np.save(path, db.vectors[start : start + count])
            start += count
    state = {
        "documents": db.documents,
        "source_indices": db.source_indices,
        "split_info": {str(k): v for k, v in db.split_info.items()},
        "metadata_index": {str(k): v for k, v in db._metadata_index.items()},
        "vectors_normalized": db.vectors_normalized,
    }
    with open(os.path.join(directory, "state.json"), "w") as f:
        json.dump(state, f)
    index_path = os.path.join(directory, "index.npz")
    if save_ann_index and db.ann_index is not None:
        from hyperdb_tpu.core.db import _flatten_state

        np.savez_compressed(index_path, **_flatten_state(db.ann_index.state()))
    elif os.path.exists(index_path):
        # overwriting a checkpoint without an index must not leave the
        # previous corpus's index behind for load() to pair with new vectors
        os.remove(index_path)


def read_manifest(directory: str) -> dict:
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("version") not in _SUPPORTED_VERSIONS:
        raise ValueError(f"Unsupported checkpoint version {manifest.get('version')}")
    return manifest


def _load_vectors_host(directory: str, manifest: dict) -> np.ndarray:
    shard_counts = manifest.get("vector_shards")
    if not shard_counts:
        return np.load(os.path.join(directory, "vectors.npy"))
    return np.concatenate(
        [np.load(p) for p in _shard_paths(directory, len(shard_counts))]
    )


def load_checkpoint(
    db,
    directory: str,
    load_ann_index: bool = True,
    load_vectors: bool = True,
) -> None:
    """Restore ``db`` from a checkpoint directory.

    ``load_vectors=False`` restores documents/config/bookkeeping only —
    the vectors-beyond-host-RAM path, where the matrix goes straight to a
    device mesh via :func:`load_sharded_vectors` (ShardedHyperDB
    .from_checkpoint) instead of through the host store.
    """
    manifest = read_manifest(directory)
    with open(os.path.join(directory, "state.json")) as f:
        state = json.load(f)

    # restore config (self-describing checkpoints; the reference loses this)
    db.fp_precision = np.dtype(manifest["fp_precision"]).type
    db._store.fp_dtype = np.dtype(manifest["fp_precision"])
    db.ann_metric = manifest["ann_metric"]
    db.metadata_keys = list(manifest.get("metadata_keys") or [])
    db.select_keys = manifest.get("select_keys")
    db.add_timestamp = bool(manifest.get("add_timestamp", False))
    db.n_trees = manifest.get("n_trees", 10)

    if load_vectors:
        db._store.set(_load_vectors_host(directory, manifest))
    db.ann_dim = int(manifest["dim"])
    db.documents = state["documents"]
    db.source_indices = [int(i) for i in state["source_indices"]]
    db.split_info = {int(k): v for k, v in state["split_info"].items()}
    db._metadata_index = {int(k): v for k, v in state["metadata_index"].items()}
    db.vectors_normalized = bool(state.get("vectors_normalized", False))
    db._on_mutation()
    db.clear_cache()

    index_path = os.path.join(directory, "index.npz")
    if load_ann_index and load_vectors:
        if os.path.exists(index_path):
            from hyperdb_tpu.core.db import _unflatten_state
            from hyperdb_tpu.index import index_from_state

            with np.load(index_path, allow_pickle=False) as f:
                istate = _unflatten_state(dict(f.items()))
            db.ann_index = index_from_state(istate)
            if getattr(db.ann_index, "is_ann", False):
                db._ivf_built_rows = int(db.ann_index.num_rows)
        else:
            db._build_ann_index()
    else:
        # the caller declined the index (or the vectors): a previous
        # corpus's index on this db instance must not survive the load
        db.ann_index = None
        db._ivf_built_rows = 0


def load_sharded_vectors(directory: str, mesh, axis: str = "data"):
    """Load checkpoint vectors directly onto a device mesh.

    Returns ``(rows, n)``: a (n_pad, d) jax.Array row-sharded over
    ``mesh[axis]`` (padded with zero rows to a multiple of 128 per shard —
    the ShardedHyperDB layout, aligned for the grouped top-k) and the true
    row count. Shard files are opened
    with ``mmap_mode='r'`` and each device's callback reads only the row
    range that device owns, so host RSS stays bounded by the largest single
    device shard, not the corpus.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    manifest = read_manifest(directory)
    n, d = int(manifest["num_rows"]), int(manifest["dim"])
    shard_counts = manifest.get("vector_shards")
    if shard_counts:
        mmaps = [
            np.load(p, mmap_mode="r")
            for p in _shard_paths(directory, len(shard_counts))
        ]
        starts = np.concatenate([[0], np.cumsum(shard_counts)]).astype(np.int64)
    else:
        mmaps = [np.load(os.path.join(directory, "vectors.npy"), mmap_mode="r")]
        starts = np.array([0, n], dtype=np.int64)

    n_shards = mesh.shape[axis]
    per_shard = -(-n // n_shards)
    per_shard = -(-per_shard // 128) * 128  # grouped-topk tile alignment
    n_pad = per_shard * n_shards
    dev_dtype = (
        jnp.bfloat16
        if np.dtype(manifest["dtype"]) == np.float16
        else jnp.float32
    )

    def read_rows(lo: int, hi: int) -> np.ndarray:
        """Rows [lo, hi) of the padded matrix, touching only owning files."""
        out = np.zeros((hi - lo, d), dtype=np.float32)
        for i, m in enumerate(mmaps):
            s, e = int(starts[i]), int(starts[i + 1])
            a, b = max(lo, s), min(min(hi, n), e)
            if a < b:
                out[a - lo : b - lo] = m[a - s : b - s]
        return out

    def callback(index):
        rows = index[0]
        lo = rows.start or 0
        hi = rows.stop if rows.stop is not None else n_pad
        return jnp.asarray(read_rows(lo, hi), dtype=dev_dtype)

    sharding = NamedSharding(mesh, P(axis, None))
    rows = jax.make_array_from_callback((n_pad, d), sharding, callback)
    return rows, n
