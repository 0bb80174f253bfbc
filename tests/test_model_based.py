"""Stateful model-based test: random mutation/query interleavings.

The mutation paths (chunk-row bookkeeping, removal renumbering, metadata
shifting, cache clearing, persistence across all of it) are the trickiest
host-side code in the engine. This test drives a long random sequence of
operations — add (single/batch, chunked/unchunked), remove (single/multi),
query, save/load round trips — against a transparent Python model that
implements the reference semantics directly (one documents entry per doc,
one vector row per chunk, contiguous renumbering on delete: SURVEY.md
Q1/Q22 — split_info stays empty on the precomputed-vectors path, like the
reference, where it only ever comes from tokenizer chunking), asserting
full state equality and query-oracle agreement after every step.
"""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB

D = 16


class Model:
    """Reference semantics in plain Python/NumPy."""

    def __init__(self):
        self.docs = []        # list of dicts
        self.rows = []        # list of (d,) f32 rows
        self.src = []         # row -> doc index
        self.split = {}       # doc index -> chunk count (chunked docs only)

    def add(self, doc, rows):
        idx = len(self.docs)
        self.docs.append(doc)
        for r in rows:
            self.rows.append(np.asarray(r, dtype=np.float32))
            self.src.append(idx)

    def remove(self, indices):
        removed = sorted(set(indices))
        rset = set(removed)
        keep_rows = [i for i, s in enumerate(self.src) if s not in rset]
        self.rows = [self.rows[i] for i in keep_rows]

        def shift(i):
            return sum(1 for r in removed if r < i)

        self.src = [s - shift(s) for i, s in zip(keep_rows, (self.src[i] for i in keep_rows))]
        self.docs = [d for i, d in enumerate(self.docs) if i not in rset]
        self.split = {
            i - shift(i): c for i, c in self.split.items() if i not in rset
        }

    def topk(self, q, k):
        if not self.rows:
            return []
        rows = np.stack(self.rows)
        qn = q / max(np.linalg.norm(q), 1e-12)
        rn = rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-12
        )
        row_scores = rn @ qn
        doc_scores = np.full(len(self.docs), -np.inf)
        for row, doc in enumerate(self.src):
            doc_scores[doc] = max(doc_scores[doc], row_scores[row])
        order = np.argsort(-doc_scores, kind="stable")
        return order[: min(k, len(self.docs))].tolist()


def check_state(db, model):
    assert len(db.documents) == len(model.docs)
    assert db.source_indices == model.src
    n_rows = 0 if db.vectors is None else db.vectors.shape[0]
    assert n_rows == len(model.rows)
    if model.rows:
        np.testing.assert_allclose(
            np.asarray(db.vectors, dtype=np.float32),
            np.stack(model.rows),
            rtol=1e-6,
        )
    # split_info records only embedding-path chunking (reference Q1:
    # it comes from the tokenizer); precomputed multi-row adds leave it empty
    assert db.split_info == {}
    # the Q1 invariant
    assert len(db.source_indices) == n_rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_mutation_sequences(seed, tmp_path):
    rng = np.random.default_rng(seed)
    db = HyperDB()
    model = Model()
    next_id = 0

    for step in range(60):
        op = rng.choice(
            ["add", "add_batch", "remove", "query", "roundtrip"],
            p=[0.3, 0.2, 0.2, 0.2, 0.1],
        )
        if op == "add" or not model.docs and op in ("remove", "query"):
            chunks = int(rng.integers(1, 4))
            rows = rng.standard_normal((chunks, D)).astype(np.float32)
            doc = {"id": next_id, "text": f"doc {next_id}"}
            next_id += 1
            db.add_document(dict(doc), vectors=rows)
            db.commit_pending()
            model.add(doc, rows)
        elif op == "add_batch":
            count = int(rng.integers(1, 4))
            docs, vecs = [], []
            for _ in range(count):
                doc = {"id": next_id, "text": f"doc {next_id}"}
                next_id += 1
                docs.append(doc)
                vecs.append(rng.standard_normal(D).astype(np.float32))
            db.add_documents([dict(d) for d in docs], vectors=np.stack(vecs))
            for doc, vec in zip(docs, vecs):
                model.add(doc, [vec])
        elif op == "remove":
            count = min(len(model.docs), int(rng.integers(1, 3)))
            victims = rng.choice(len(model.docs), size=count, replace=False)
            victims = [int(v) for v in victims]
            db.remove_document(victims)
            model.remove(victims)
        elif op == "query":
            q = rng.standard_normal(D).astype(np.float32)
            got = [r[2] for r in db.query(q, top_k=5)]
            assert got == model.topk(q, 5), f"step {step}"
        elif op == "roundtrip" and model.docs:
            # an empty db prints "Nothing to save. Exit." (reference
            # parity, hyperdb.py:770-773) and writes no file
            fmt = ["pickle", "json", "sqlite"][int(rng.integers(0, 3))]
            path = str(tmp_path / f"state_{step}.{fmt}")
            db.save(path, format=fmt)
            db = HyperDB()
            db.load(path, format=fmt)
        check_state(db, model)

    # end with a final oracle query if anything is left
    if model.docs:
        q = rng.standard_normal(D).astype(np.float32)
        assert [r[2] for r in db.query(q, top_k=7)] == model.topk(q, 7)
