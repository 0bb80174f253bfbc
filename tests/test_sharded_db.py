"""ShardedHyperDB vs the single-chip engine (the oracle)."""

import numpy as np
import pytest

import jax

from hyperdb_tpu import HyperDB
from hyperdb_tpu.parallel import make_mesh
from hyperdb_tpu.parallel.sharded_db import ShardedHyperDB


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.fixture
def db():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((200, 16)).astype(np.float32)
    docs = [
        {"i": int(i), "parity": "even" if i % 2 == 0 else "odd",
         "text": f"document number {i}"}
        for i in range(len(v))
    ]
    return HyperDB(documents=docs, vectors=v, metadata_keys=["parity"])


def test_matches_single_chip(mesh, db):
    sdb = ShardedHyperDB(db, mesh)
    q = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
    got = sdb.query_batch(q, top_k=5)
    want = db.query_batch(q, top_k=5)
    for g, w in zip(got, want):
        assert [r[2] for r in g] == [r[2] for r in w]
        for (_, gs, _), (_, ws, _) in zip(g, w):
            assert gs == pytest.approx(ws, rel=1e-4)


def test_filters_on_sharded_path(mesh, db):
    sdb = ShardedHyperDB(db, mesh)
    q = np.random.default_rng(2).standard_normal((2, 16)).astype(np.float32)
    got = sdb.query_batch(
        q, top_k=5, filters=[("metadata", {"parity": "even"}), ("skip_doc", 10)]
    )
    for row in got:
        assert all(doc["parity"] == "even" for doc, *_ in row)
        assert all(idx >= 10 for *_, idx in row)


def test_chunked_dedup(mesh):
    db = HyperDB()
    db.add([{"text": "word " * 700}, {"text": "other " * 100},
            {"text": "word " * 600}])
    mesh8 = make_mesh(8)
    sdb = ShardedHyperDB(db, mesh8)
    q = np.random.default_rng(3).standard_normal((1, db.dim)).astype(np.float32)
    results = sdb.query_batch(q, top_k=3)[0]
    ids = [idx for *_, idx in results]
    assert len(ids) == len(set(ids)) == 3  # every doc once


def test_key_filter_rejected(mesh, db):
    sdb = ShardedHyperDB(db, mesh)
    q = np.zeros((1, 16), dtype=np.float32)
    with pytest.raises(ValueError):
        sdb.query_batch(q, top_k=2, filters=[("key", "text")])


def test_from_checkpoint_sharded_vectors(mesh, db, tmp_path):
    """Sharded checkpoint -> mesh, no host materialization: results match a
    host-built ShardedHyperDB exactly."""
    path = str(tmp_path / "ckpt")
    db.save(path, format="checkpoint", rows_per_shard=64)
    import os
    shard_files = sorted(os.listdir(os.path.join(path, "vectors")))
    assert shard_files == [f"shard_{i:05d}.npy" for i in range(4)]  # 200/64

    sdb = ShardedHyperDB.from_checkpoint(path, mesh)
    assert sdb.n == 200
    ref = ShardedHyperDB(db, mesh)
    q = np.random.default_rng(5).standard_normal((3, 16)).astype(np.float32)
    got = sdb.query_batch(q, top_k=5)
    want = ref.query_batch(q, top_k=5)
    for g, w in zip(got, want):
        assert [r[2] for r in g] == [r[2] for r in w]
        for (_, gs, _), (_, ws, _) in zip(g, w):
            assert gs == pytest.approx(ws, rel=1e-4)
    # metadata filters work: the doc-side state round-tripped too
    fres = sdb.query_batch(q[:1], top_k=5, filters=[("metadata", {"parity": "odd"})])
    assert fres[0] and all(doc["parity"] == "odd" for doc, *_ in fres[0])


def test_from_checkpoint_monolithic_vectors(mesh, db, tmp_path):
    """from_checkpoint also serves v1-style monolithic vectors.npy (mmapped)."""
    path = str(tmp_path / "ckpt_mono")
    db.save(path, format="checkpoint")
    sdb = ShardedHyperDB.from_checkpoint(path, mesh)
    q = np.random.default_rng(6).standard_normal((2, 16)).astype(np.float32)
    got = sdb.query_batch(q, top_k=3)
    want = db.query_batch(q, top_k=3)
    for g, w in zip(got, want):
        assert [r[2] for r in g] == [r[2] for r in w]
