"""Versioned binary checkpoint (the recommended fast format).

The reference's formats round-trip the vector matrix through Python lists
(hyperdb.py:775 — a 1M x 384 corpus becomes ~400M Python floats; SURVEY.md
§5 flags this). This format is a directory with:

    manifest.json   — version, dtype, shapes, config echo (fp_precision,
                      ann_metric, metadata_keys, select_keys, add_timestamp)
    vectors.npy     — binary ndarray, exact dtype
    state.json      — documents, source_indices, split_info, metadata_index,
                      vectors_normalized
    index.npz       — ANN index state (optional)

Unlike the reference (which does not persist config and requires callers to
re-declare metadata_keys on load — SURVEY.md §3.4 note), the manifest
carries the config so a checkpoint is self-describing.
"""

from __future__ import annotations

import json
import os

import numpy as np

FORMAT_VERSION = 1


def save_checkpoint(db, directory: str, save_ann_index: bool = True) -> None:
    os.makedirs(directory, exist_ok=True)
    if db.vectors is None or len(db.vectors) == 0 or not db.documents:
        print("Nothing to save. Exit.")
        return
    manifest = {
        "version": FORMAT_VERSION,
        "dtype": str(np.dtype(db.fp_precision)),
        "num_rows": int(db.vectors.shape[0]),
        "dim": int(db.vectors.shape[1]),
        "fp_precision": str(np.dtype(db.fp_precision)),
        "ann_metric": db.ann_metric,
        "metadata_keys": list(db.metadata_keys),
        "select_keys": list(db.select_keys) if db.select_keys else None,
        "add_timestamp": bool(db.add_timestamp),
        "n_trees": db.n_trees,
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    np.save(os.path.join(directory, "vectors.npy"), db.vectors)
    state = {
        "documents": db.documents,
        "source_indices": db.source_indices,
        "split_info": {str(k): v for k, v in db.split_info.items()},
        "metadata_index": {str(k): v for k, v in db._metadata_index.items()},
        "vectors_normalized": db.vectors_normalized,
    }
    with open(os.path.join(directory, "state.json"), "w") as f:
        json.dump(state, f)
    if save_ann_index and db.ann_index is not None:
        from hyperdb_tpu.core.db import _flatten_state

        np.savez_compressed(
            os.path.join(directory, "index.npz"),
            **_flatten_state(db.ann_index.state()),
        )


def load_checkpoint(db, directory: str, load_ann_index: bool = True) -> None:
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("version") != FORMAT_VERSION:
        raise ValueError(
            f"Unsupported checkpoint version {manifest.get('version')}"
        )
    vectors = np.load(os.path.join(directory, "vectors.npy"))
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

    db._store.set(vectors)
    db.ann_dim = int(vectors.shape[1]) if vectors.size else None
    db.documents = state["documents"]
    db.source_indices = [int(i) for i in state["source_indices"]]
    db.split_info = {int(k): v for k, v in state["split_info"].items()}
    db._metadata_index = {int(k): v for k, v in state["metadata_index"].items()}
    db.vectors_normalized = bool(state.get("vectors_normalized", False))
    db._on_mutation()
    db.clear_cache()

    index_path = os.path.join(directory, "index.npz")
    if load_ann_index:
        if os.path.exists(index_path):
            from hyperdb_tpu.core.db import _unflatten_state
            from hyperdb_tpu.index.flat import FlatIndex

            with np.load(index_path, allow_pickle=False) as f:
                istate = _unflatten_state(dict(f.items()))
            if istate.get("kind") == "ivf":
                from hyperdb_tpu.index.ivf import IVFIndex

                db.ann_index = IVFIndex.from_state(istate)
            else:
                db.ann_index = FlatIndex.from_state(istate)
        else:
            db._build_ann_index()
