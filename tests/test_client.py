"""HyperDBClient (hyperdb_tpu/client.py) against BOTH serving front-ends."""

import threading

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.client import HyperDBClient
from hyperdb_tpu.server import make_server

N, D = 1024, 24


def _db():
    rng = np.random.default_rng(13)
    v = rng.standard_normal((N, D)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    def fake_embed(texts):
        return (
            np.stack([v[int(t.split()[-1])] for t in texts]),
            list(range(len(texts))),
            {},
        )

    db = HyperDB(
        documents=[{"i": int(i), "grp": ["a", "b"][i % 2]} for i in range(N)],
        vectors=v,
        embedding_function=fake_embed,
        metadata_keys=["grp"],
    )
    return db, v


def _oracle(v, q, k):
    qn = q / np.linalg.norm(q)
    return np.argsort(-(v @ qn), kind="stable")[:k]


@pytest.fixture(scope="module", params=["python", "native"])
def endpoint(request):
    db, v = _db()
    if request.param == "native":
        native_server = pytest.importorskip("hyperdb_tpu.native.server")
        if not native_server.available():
            pytest.skip("native host library unavailable")
        srv = native_server.NativeQueryServer(db, port=0, max_batch=64,
                                              window_ms=2.0)
        yield {"port": srv.port, "vectors": v, "kind": "native"}
        srv.close()
    else:
        httpd = make_server(db, port=0, dynamic_batch_ms=2.0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield {"port": httpd.server_address[1], "vectors": v,
               "kind": "python"}
        httpd.shutdown()
        if httpd.batcher is not None:
            httpd.batcher.close()
        httpd.server_close()


def test_vector_query(endpoint):
    v = endpoint["vectors"]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        ids, scores = c.query(v[42], top_k=5)
        assert ids.tolist() == _oracle(v, v[42], 5).tolist()
        assert scores[0] == pytest.approx(1.0, abs=1e-3)


def test_text_query(endpoint):
    v = endpoint["vectors"]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        ids, _ = c.query("doc 99", top_k=3)
        assert ids[0] == 99
        assert ids.tolist() == _oracle(v, v[99], 3).tolist()


def test_query_batch_pipelined(endpoint):
    v = endpoint["vectors"]
    qids = [3, 77, 500, 900]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        ids, scores = c.query_batch(v[qids], top_k=4)
        assert ids.shape == (4, 4) and scores.shape == (4, 4)
        for row, i in zip(ids, qids):
            assert row.tolist() == _oracle(v, v[i], 4).tolist()


def test_stats_and_healthz(endpoint):
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        assert c.healthz() == {"ok": True}
        st = c.stats()
        assert st["documents"] == N and st["dim"] == D


def test_error_maps_to_exception(endpoint):
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        with pytest.raises(RuntimeError, match="400|dimension"):
            c.query(np.zeros(D + 3, dtype=np.float32), top_k=3)
        # connection still usable afterwards
        v = endpoint["vectors"]
        ids, _ = c.query(v[1], top_k=1)
        assert ids[0] == 1


def test_query_batch_error_leaves_connection_usable(endpoint):
    """A failing batch drains all pipelined responses before raising; the
    next call on the same connection must return correct results."""
    v = endpoint["vectors"]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        with pytest.raises(RuntimeError):
            c.query_batch(v[[1, 2, 3]], top_k=2, metric="bogus_metric")
        ids, _ = c.query_batch(v[[7, 8]], top_k=1)
        assert ids[:, 0].tolist() == [7, 8]


def test_query_batch_larger_than_window(endpoint):
    """B > _PIPELINE_WINDOW exercises the sliding send/read window."""
    v = endpoint["vectors"]
    qids = list(range(0, 300, 2))[:150]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        assert len(qids) > c._PIPELINE_WINDOW
        ids, _ = c.query_batch(v[qids], top_k=1)
        assert ids[:, 0].tolist() == qids


def test_query_batch_texts(endpoint):
    """A list of text queries pipelines through the text hot path."""
    v = endpoint["vectors"]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        ids, scores = c.query_batch([f"doc {i}" for i in (4, 40, 400)],
                                    top_k=2)
        assert ids.shape == (3, 2)
        assert ids[:, 0].tolist() == [4, 40, 400]


def test_filters_on_hot_path(endpoint):
    """A metadata filter rides the query string; the native server batches
    filtered queries per (metric, filters) group — results respect it."""
    v = endpoint["vectors"]
    with HyperDBClient("127.0.0.1", endpoint["port"]) as c:
        flt = [("metadata", {"grp": "a"})]
        ids, _ = c.query(v[3], top_k=6, filters=flt)
        assert len(ids) == 6
        assert all(i % 2 == 0 for i in ids)  # grp 'a' == even ids
        ids2, _ = c.query_batch(v[[4, 8]], top_k=4, filters=flt)
        assert (ids2 % 2 == 0).all()
        assert ids2[0, 0] == 4 and ids2[1, 0] == 8


def test_recency_on_hot_path():
    """recency_bias/timestamp_key ride the query string and batch on the
    native hot path; results match the library's recency ranking."""
    native_server = pytest.importorskip("hyperdb_tpu.native.server")
    if not native_server.available():
        pytest.skip("native host library unavailable")
    rng = np.random.default_rng(41)
    n, d = 128, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    docs = [{"i": int(i), "ts": float(i)} for i in range(n)]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["ts"])
    srv = native_server.NativeQueryServer(db, port=0, max_batch=16)
    try:
        q = v[10]
        want_ids, want_scores = db.query_batch_arrays(
            q[None, :], top_k=5, recency_bias=2.0, timestamp_key="ts"
        )
        with HyperDBClient("127.0.0.1", srv.port) as c:
            ids, scores = c.query(q, top_k=5, recency_bias=2.0,
                                  timestamp_key="ts")
        assert ids.tolist() == want_ids[0].tolist()
        np.testing.assert_allclose(scores, want_scores[0], rtol=1e-4)
        # recency actually reordered: high-ts docs outrank pure cosine
        plain, _ = db.query_batch_arrays(q[None, :], top_k=5)
        assert ids.tolist() != plain[0].tolist()
    finally:
        srv.close()
