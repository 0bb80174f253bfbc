"""Checkpoint-format persistence + payload-level compatibility tests."""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.persist.io import load_payload, save_payload


def _db():
    docs = [{"name": f"doc{i}", "info": {"type": "even" if i % 2 == 0 else "odd"}} for i in range(6)]
    vectors = np.arange(6 * 8, dtype=np.float32).reshape(6, 8)
    return HyperDB(documents=docs, vectors=vectors, metadata_keys=["info.type"])


def test_checkpoint_roundtrip(tmp_path):
    db = _db()
    path = str(tmp_path / "ckpt")
    db.save(path, format="checkpoint")

    new_db = HyperDB()  # no config needed: checkpoint is self-describing
    new_db.load(path, format="checkpoint")
    assert new_db.documents == db.documents
    np.testing.assert_array_equal(new_db.vectors, db.vectors)
    assert new_db.source_indices == db.source_indices
    assert new_db._metadata_index == db._metadata_index
    assert new_db.metadata_keys == db.metadata_keys
    assert new_db.ann_metric == db.ann_metric
    assert np.dtype(new_db.fp_precision) == np.dtype(db.fp_precision)
    # metadata filtering works right after load (config restored)
    res = new_db.query(db.vectors[0], filters=[("metadata", {"info.type": "even"})])
    assert all(doc["info"]["type"] == "even" for doc, *_ in res)


def test_checkpoint_fp16(tmp_path):
    docs = [{"t": str(i)} for i in range(4)]
    db = HyperDB(documents=docs, vectors=np.eye(4, dtype=np.float16), fp_precision="float16")
    path = str(tmp_path / "ckpt16")
    db.save(path, format="checkpoint")
    new_db = HyperDB()  # default f32 config gets overridden by manifest
    new_db.load(path, format="checkpoint")
    assert new_db.vectors.dtype == np.float16


def test_payload_intkeys_json(tmp_path):
    data = {
        "vectors": [[1.0, 2.0]],
        "documents": [{"a": 1}],
        "source_indices": [0],
        "split_info": {0: 1},
        "metadata_index": {0: {"k": "v"}},
        "vectors_normalized": False,
    }
    path = str(tmp_path / "x.json")
    save_payload(path, data, format="json")
    loaded = load_payload(path, format="json")
    # JSON stringifies dict keys; loader must restore ints
    assert 0 in loaded["split_info"]
    assert 0 in loaded["metadata_index"]


def test_sentence_mask_cache_invalidation():
    db = HyperDB()
    db.add([{"text": "alpha beta"}, {"text": "gamma delta"}])
    r1 = db.query("alpha", filters=[("sentence", "alpha")])
    assert len(r1) == 1
    db.add({"text": "alpha again"})
    r2 = db.query("alpha", filters=[("sentence", "alpha")])
    assert len(r2) == 2


def test_checkpoint_sharded_roundtrip(tmp_path):
    """rows_per_shard splits vectors into shard files; host load rebuilds the
    exact matrix and state."""
    rng = np.random.default_rng(11)
    v = rng.standard_normal((130, 8)).astype(np.float32)
    docs = [{"i": int(i)} for i in range(130)]
    db = HyperDB(documents=docs, vectors=v)
    path = str(tmp_path / "ckpt_sharded")
    db.save(path, format="checkpoint", rows_per_shard=50)  # 50+50+30

    new_db = HyperDB()
    new_db.load(path, format="checkpoint")
    np.testing.assert_array_equal(np.asarray(new_db.vectors), v)
    assert new_db.documents == docs
    res = new_db.query(v[7], top_k=1)
    assert res[0][0]["i"] == 7
