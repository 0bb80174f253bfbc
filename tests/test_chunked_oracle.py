"""Property-style oracle test: the chunk-aware engine vs a NumPy reference.

Random corpora with random chunk counts; the oracle computes per-document
scores as the max over each document's chunk rows (SURVEY.md Q1 semantics)
in plain NumPy and must agree with the engine's fused segment-max path.
"""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB


def _numpy_doc_topk(vectors, source_indices, q, num_docs, k, mask=None):
    qn = q / max(np.linalg.norm(q), 1e-12)
    vn = vectors / np.maximum(
        np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12
    )
    row_scores = vn @ qn
    doc_scores = np.full(num_docs, -np.inf)
    for row, doc in enumerate(source_indices):
        doc_scores[doc] = max(doc_scores[doc], row_scores[row])
    if mask is not None:
        doc_scores[~mask] = -np.inf
    order = np.argsort(-doc_scores, kind="stable")
    return order[:k]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chunked_engine_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    num_docs = 40
    chunk_counts = rng.integers(1, 4, size=num_docs)
    d = 24

    db = HyperDB()
    vectors = []
    source_indices = []
    for i, c in enumerate(chunk_counts):
        rows = rng.standard_normal((c, d)).astype(np.float32)
        vectors.append(rows)
        source_indices.extend([i] * c)
        # stage through the real ingest path with precomputed chunk rows
        db.add_document({"i": int(i)}, vectors=rows)
    db.commit_pending()
    db._build_ann_index()
    vectors = np.concatenate(vectors)
    assert db.source_indices == source_indices
    assert len(db.documents) == num_docs

    for _ in range(5):
        q = rng.standard_normal(d).astype(np.float32)
        got = [r[2] for r in db.query(q, top_k=7)]
        want = _numpy_doc_topk(vectors, source_indices, q, num_docs, 7).tolist()
        assert got == want


def test_chunked_engine_with_mask_matches_oracle():
    rng = np.random.default_rng(3)
    num_docs, d = 30, 16
    chunk_counts = rng.integers(1, 3, size=num_docs)
    db = HyperDB(metadata_keys=["grp"])
    vectors, source_indices = [], []
    for i, c in enumerate(chunk_counts):
        rows = rng.standard_normal((c, d)).astype(np.float32)
        vectors.append(rows)
        source_indices.extend([i] * c)
        db.add_document({"i": int(i), "grp": "a" if i % 3 == 0 else "b"}, vectors=rows)
    db.commit_pending()
    db._build_ann_index()
    vectors = np.concatenate(vectors)
    mask = np.array([i % 3 == 0 for i in range(num_docs)])

    q = rng.standard_normal(d).astype(np.float32)
    got = [r[2] for r in db.query(q, top_k=5, filters=[("metadata", {"grp": "a"})])]
    want = _numpy_doc_topk(vectors, source_indices, q, num_docs, 5, mask=mask).tolist()
    assert got == want


def test_chunked_oracle_after_removal():
    rng = np.random.default_rng(4)
    db = HyperDB()
    sizes = [1, 3, 2, 1, 2]
    for i, c in enumerate(sizes):
        db.add_document({"i": i}, vectors=rng.standard_normal((c, 16)).astype(np.float32))
    db.commit_pending()
    db._build_ann_index()
    db.remove_document([1, 3])  # drop the 3-chunk and a 1-chunk doc

    vectors = db.vectors
    src = db.source_indices
    q = rng.standard_normal(16).astype(np.float32)
    got = [r[2] for r in db.query(q, top_k=3)]
    want = _numpy_doc_topk(vectors, src, q, len(db.documents), 3).tolist()
    assert got == want
