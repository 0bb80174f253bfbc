"""Regression tests for the round-2 transactional/persistence review fixes."""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.core import db as dbmod


def test_add_documents_precomputed_vectors_add_timestamp():
    """add(list, vectors=..., add_timestamp=True) must stamp documents like
    the embedding arm does (reference hyperdb.py:664) so recency works."""
    rng = np.random.default_rng(0)
    db = HyperDB(metadata_keys=["metadata.timestamp"])
    docs = [{"i": i} for i in range(6)]
    db.add(docs, vectors=rng.standard_normal((6, 8)).astype(np.float32),
           add_timestamp=True)
    assert all("timestamp" in d.get("metadata", {}) for d in db.documents)
    # the metadata index carries the stamped value, never None
    for i in range(6):
        assert db._metadata_index[i]["metadata.timestamp"] is not None
    res = db.query(
        rng.standard_normal(8).astype(np.float32),
        top_k=3, recency_bias=0.5, timestamp_key="metadata.timestamp",
    )
    assert len(res) == 3


def test_failed_add_documents_leaves_no_ghost_metadata(capsys):
    """A rolled-back batch must not leave staged metadata at future doc
    indices (it was applied during staging, before validation)."""
    rng = np.random.default_rng(1)
    db = HyperDB(metadata_keys=["grp"])
    db.add([{"i": 0, "grp": "keep"}],
           vectors=rng.standard_normal((1, 8)).astype(np.float32))
    # mismatched vector count -> soft error before staging begins
    db.add_documents([{"i": 1, "grp": "ghost"}, {"i": 2, "grp": "ghost"}],
                     vectors=rng.standard_normal((3, 8)).astype(np.float32))
    # mixed-dimension staged rows -> commit soft-rolls-back (Q20)
    db.add_document({"i": 3, "grp": "ghost"},
                    vectors=rng.standard_normal((1, 12)).astype(np.float32))
    db.add_documents([{"i": 4, "grp": "ghost"}],
                     vectors=rng.standard_normal((1, 8)).astype(np.float32))
    capsys.readouterr()
    # hard contract: no metadata at indices beyond the real documents, and
    # no rolled-back 'ghost' values anywhere
    assert all(k < len(db.documents) for k in db._metadata_index)
    assert all(v.get("grp") != "ghost" for v in db._metadata_index.values())


def test_commit_mixed_dimensions_soft_rolls_back(capsys):
    rng = np.random.default_rng(2)
    db = HyperDB()
    db.add_document({"i": 0}, vectors=rng.standard_normal((1, 8)).astype(np.float32))
    db.add_document({"i": 1}, vectors=rng.standard_normal((1, 16)).astype(np.float32))
    db.commit_pending()  # must print + roll back, not raise (Q20)
    out = capsys.readouterr().out
    assert "Rolling back" in out
    assert len(db.documents) == 0


def test_load_without_ann_index_clears_previous_index(tmp_path, monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 50)
    rng = np.random.default_rng(3)
    db = HyperDB(
        documents=[{"i": int(i)} for i in range(100)],
        vectors=rng.standard_normal((100, 8)).astype(np.float32),
    )
    assert getattr(db.ann_index, "is_ann", False)
    small = HyperDB(
        documents=[{"i": int(i)} for i in range(10)],
        vectors=rng.standard_normal((10, 8)).astype(np.float32),
    )
    path = str(tmp_path / "small.pickle")
    small.save(path, save_ann_index=False)
    db.load(path, load_ann_index=False)
    assert db.ann_index is None
    # queries work (index rebuilt lazily as flat/exact)
    res = db.query(rng.standard_normal(8).astype(np.float32), top_k=3)
    assert len(res) == 3


def test_checkpoint_overwrite_removes_stale_index(tmp_path, monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 50)
    rng = np.random.default_rng(4)
    big = HyperDB(
        documents=[{"i": int(i)} for i in range(120)],
        vectors=rng.standard_normal((120, 8)).astype(np.float32),
    )
    d = str(tmp_path / "ckpt")
    big.save(d, format="checkpoint")
    import os
    assert os.path.exists(os.path.join(d, "index.npz"))

    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 1 << 62)
    small = HyperDB(
        documents=[{"i": int(i)} for i in range(10)],
        vectors=rng.standard_normal((10, 8)).astype(np.float32),
    )
    small.ann_index = None  # no index to save
    small.save(d, format="checkpoint")
    assert not os.path.exists(os.path.join(d, "index.npz"))
    fresh = HyperDB()
    fresh.load(d, format="checkpoint")
    res = fresh.query(rng.standard_normal(8).astype(np.float32), top_k=3)
    assert len(res) == 3


def test_loaded_ivf_takes_incremental_add_path(tmp_path, monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 50)
    rng = np.random.default_rng(5)
    db = HyperDB(
        documents=[{"i": int(i)} for i in range(100)],
        vectors=rng.standard_normal((100, 8)).astype(np.float32),
    )
    path = str(tmp_path / "db.pickle")
    db.save(path)
    new = HyperDB()
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 50)
    new.load(path)
    assert getattr(new.ann_index, "is_ann", False)
    assert new._ivf_built_rows == new.ann_index.num_rows > 0
    loaded_index = new.ann_index
    new.add([{"i": 100}], vectors=rng.standard_normal((1, 8)).astype(np.float32))
    # incremental add_rows keeps the SAME index object (no full rebuild)
    assert new.ann_index is loaded_index
    assert new.ann_index.num_rows == 101


def test_remove_all_then_bulk_add_rebuilds_index(monkeypatch):
    monkeypatch.setattr(dbmod, "IVF_THRESHOLD", 50)
    rng = np.random.default_rng(6)
    db = HyperDB(
        documents=[{"i": int(i)} for i in range(100)],
        vectors=rng.standard_normal((100, 8)).astype(np.float32),
    )
    old_index = db.ann_index
    db.remove_document(list(range(100)))
    assert db.ann_index is None  # stale clusters must not survive
    db.add([{"i": int(i)} for i in range(120)],
           vectors=rng.standard_normal((120, 8)).astype(np.float32))
    assert db.ann_index is not None and db.ann_index is not old_index
    assert db.ann_index.num_rows == 120
    res = db.query(rng.standard_normal(8).astype(np.float32), top_k=3)
    assert len(res) == 3
