"""Engine planar-capacity routing: split device planes == the monolith.

Corpora past CONFIG.plane_rows store their float device planes SPLIT
(core/store._materialize_split_planes) and the engine's unchunked device
branch ranks them with ops/ranking.rank_top_k_planar — no XLA program ever
compiles against a monolithic capacity operand (query/engine.py planar
branch; round-5 2^24 compile forensics). These tests pin the planar route
to the monolithic route (itself oracle-pinned by test_engine_oracle.py) on
the same DB by flipping CONFIG.plane_rows: ids and scores must be
identical for every metric the device branch serves, with filters and
recency included, and the store's split planes must reassemble to the
monolithic plane bit-for-bit.
"""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.config import CONFIG
from hyperdb_tpu.core.store import VectorStore


N_ROWS, DIM, PLANE = 6144, 16, 2048  # 3 planes when planar


@pytest.fixture(scope="module")
def unchunked_db():
    rng = np.random.default_rng(11)
    v = rng.standard_normal((N_ROWS, DIM)).astype(np.float32)
    v[7] = 1.0  # constant row: pearson NaN case
    docs = [
        {"i": int(i), "grp": ["a", "b", "c"][i % 3], "ts": float(i % 5)}
        for i in range(N_ROWS)
    ]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp", "ts"])
    return db, rng.standard_normal((4, DIM)).astype(np.float32)


def _device(monkeypatch):
    monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)
    monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 512)


def _ids_scores(rows):
    return (
        [[r[2] if len(r) == 3 else r[0]["i"] for r in res] for res in rows],
        [[r[1] for r in res] for res in rows],
    )


@pytest.mark.parametrize(
    "metric",
    [
        "dot_product",
        "cosine_similarity",
        "euclidean_metric",
        "manhattan_distance",
        "pearson_correlation",
    ],
)
def test_planar_matches_monolithic(unchunked_db, monkeypatch, metric):
    db, qs = unchunked_db
    _device(monkeypatch)
    monkeypatch.setattr(CONFIG, "plane_rows", 0)
    mono = db.query_batch(qs, top_k=9, metric=metric)
    db.clear_cache()
    monkeypatch.setattr(CONFIG, "plane_rows", PLANE)
    assert db._store.is_planar(6144)
    plan = db.query_batch(qs, top_k=9, metric=metric)
    db.clear_cache()
    m_ids, m_scores = _ids_scores(mono)
    p_ids, p_scores = _ids_scores(plan)
    assert p_ids == m_ids
    np.testing.assert_allclose(p_scores, m_scores, rtol=1e-5, atol=1e-6)


def test_planar_with_filter_and_recency(unchunked_db, monkeypatch):
    db, qs = unchunked_db
    _device(monkeypatch)
    kwargs = dict(
        top_k=7,
        metric="cosine_similarity",
        filters=[("metadata", {"grp": "b"})],
        recency_bias=1.5,
        timestamp_key="ts",
    )
    monkeypatch.setattr(CONFIG, "plane_rows", 0)
    mono = db.query(qs[0], **kwargs)
    db.clear_cache()
    monkeypatch.setattr(CONFIG, "plane_rows", PLANE)
    plan = db.query(qs[0], **kwargs)
    db.clear_cache()
    m_ids, m_scores = _ids_scores([mono])
    p_ids, p_scores = _ids_scores([plan])
    assert p_ids == m_ids
    np.testing.assert_allclose(p_scores, m_scores, rtol=1e-5, atol=1e-6)


def test_planar_after_mutation(unchunked_db, monkeypatch):
    """Mutations invalidate the split planes like every other device plane."""
    db, qs = unchunked_db
    _device(monkeypatch)
    monkeypatch.setattr(CONFIG, "plane_rows", PLANE)
    before = db.query(qs[1], top_k=3, metric="dot_product")
    new_vec = np.asarray(qs[1] * 10.0, dtype=np.float32)
    db.add_document({"i": N_ROWS, "grp": "z", "ts": 0.0}, vectors=new_vec)
    db.commit_pending()
    db.clear_cache()  # commit_pending keeps the LRU (reference parity)
    try:
        after = db.query(qs[1], top_k=3, metric="dot_product")
        assert after[0][2] == N_ROWS  # the new best row wins
        assert before[0][2] != N_ROWS
    finally:
        db.remove_document(N_ROWS)
        db.clear_cache()


class TestStorePlanes:
    def test_plane_bounds_remainder_folds(self, monkeypatch):
        monkeypatch.setattr(CONFIG, "plane_rows", 1024)
        s = VectorStore(np.float32)
        assert s.plane_bounds(1024) == [0, 1024]  # not planar at the cap
        assert s.plane_bounds(3072) == [0, 1024, 2048, 3072]
        # 2048 + 64 remainder (< cap//8) folds into the last plane
        assert s.plane_bounds(2112) == [0, 1024, 2112]
        monkeypatch.setattr(CONFIG, "plane_rows", 0)
        assert s.plane_bounds(1 << 26) == [0, 1 << 26]  # 0 disables

    @pytest.mark.parametrize("key", ["rows", "rows_norm"])
    def test_split_planes_reassemble_bitwise(self, monkeypatch, key):
        monkeypatch.setattr(CONFIG, "plane_rows", 512)
        rng = np.random.default_rng(5)
        s = VectorStore(np.float32)
        s.set(rng.standard_normal((1500, 8)).astype(np.float32))
        dv = s.device_view(list(range(1500)))
        n_pad = dv["n_pad"]
        assert s.is_planar(n_pad)
        mono = np.asarray(dv[key])
        planes = dv[key + "_planes"]
        assert [p.shape[0] for p in planes] == [
            b - a
            for a, b in zip(s.plane_bounds(n_pad), s.plane_bounds(n_pad)[1:])
        ]
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(p) for p in planes]), mono
        )
        valid = dv["plane_row_valid"]
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(m) for m in valid]),
            np.asarray(dv["row_valid"]),
        )
