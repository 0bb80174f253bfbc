"""Streaming ingest (add_stream): equivalence with add(), chunking,
mid-stream failure semantics, deferred index builds."""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB


def _docs(n):
    return [{"i": int(i), "text": f"document number {i} about topic {i % 7}"}
            for i in range(n)]


def test_add_stream_matches_add():
    docs = _docs(257)  # not a multiple of the batch size
    db_stream = HyperDB()
    added = db_stream.add_stream(iter(docs), batch_size=64)
    db_bulk = HyperDB()
    db_bulk.add(list(docs))

    assert added == 257
    assert db_stream.documents == db_bulk.documents
    assert db_stream.source_indices == db_bulk.source_indices
    np.testing.assert_allclose(
        np.asarray(db_stream.vectors), np.asarray(db_bulk.vectors), rtol=1e-6
    )
    r1 = db_stream.query("topic 3", top_k=5)
    r2 = db_bulk.query("topic 3", top_k=5)
    assert [r[2] for r in r1] == [r[2] for r in r2]


def test_add_stream_chunked_documents():
    docs = [{"text": "word " * 700}, {"text": "short"}, {"text": "other " * 600}]
    db = HyperDB()
    db.add_stream(iter(docs), batch_size=2)
    assert len(db.documents) == 3
    assert len(db.source_indices) == db.vectors.shape[0]
    assert db.vectors.shape[0] > 3  # long docs split into multiple chunks
    assert sum(db.split_info.values()) == db.vectors.shape[0]


def test_add_stream_midstream_failure_keeps_committed_batches():
    def gen():
        for d in _docs(100):
            yield d
        raise RuntimeError("source went away")

    db = HyperDB()
    with pytest.raises(RuntimeError, match="source went away"):
        db.add_stream(gen(), batch_size=25)
    # all four full batches committed before the failure surfaced
    assert len(db.documents) == 100
    assert db.query("topic 3", top_k=3)


def test_add_stream_defer_index():
    docs = _docs(120)
    db = HyperDB()
    db.add_stream(iter(docs), batch_size=32, defer_index=True)
    assert db.ann_index is not None
    assert len(db.documents) == 120
    assert db.query("topic 5", top_k=3)


def test_add_stream_timestamps():
    db = HyperDB(metadata_keys=["metadata.timestamp"], add_timestamp=True)
    db.add_stream(iter(_docs(10)), batch_size=4, add_timestamp=True)
    assert all("timestamp" in d.get("metadata", {}) for d in db.documents)


def test_add_stream_empty_iterable():
    db = HyperDB()
    assert db.add_stream(iter([])) == 0
    assert db.vectors is None or len(db.vectors) == 0
