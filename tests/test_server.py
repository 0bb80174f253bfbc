"""HTTP serving endpoint (hyperdb_tpu/server.py) against a live DB."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.server import make_server


@pytest.fixture(scope="module")
def served():
    rng = np.random.default_rng(0)
    n, d = 64, 16
    v = rng.standard_normal((n, d)).astype(np.float32)
    docs = [{"i": int(i), "grp": ["a", "b"][i % 2]} for i in range(n)]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp"])
    httpd = make_server(db, port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield {"db": db, "base": base, "vectors": v}
    httpd.shutdown()
    httpd.server_close()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_and_stats(served):
    status, body = _get(served["base"], "/healthz")
    assert status == 200 and body == {"ok": True}
    status, body = _get(served["base"], "/stats")
    assert status == 200
    assert body["documents"] == 64 and body["dim"] == 16
    assert "cache" in body and "timers" in body


def test_query_matches_library(served):
    q = served["vectors"][7].tolist()
    status, body = _post(served["base"], "/query", {"vector": q, "top_k": 5})
    assert status == 200
    got = [(r["index"], round(r["score"], 5)) for r in body["results"]]
    want = [
        (r[2], round(float(r[1]), 5))
        for r in served["db"].query(np.asarray(q, dtype=np.float32), top_k=5)
    ]
    assert got == want
    assert got[0][0] == 7  # self-match first


def test_query_with_metadata_filter(served):
    q = served["vectors"][8].tolist()
    status, body = _post(
        served["base"],
        "/query",
        {"vector": q, "top_k": 4, "filters": [["metadata", {"grp": "a"}]]},
    )
    assert status == 200
    for r in body["results"]:
        assert r["document"]["grp"] == "a"


def test_query_batch(served):
    qs = served["vectors"][:3].tolist()
    status, body = _post(
        served["base"], "/query_batch", {"vectors": qs, "top_k": 3}
    )
    assert status == 200
    assert len(body["results"]) == 3
    for i, row in enumerate(body["results"]):
        assert row[0]["index"] == i  # each self-match wins its row


def test_error_paths(served):
    status, body = _post(served["base"], "/query", {"top_k": 3})
    assert status == 400 and "missing field" in body["error"]
    status, body = _post(
        served["base"], "/query", {"vector": [0.0] * 16, "metric": "bogus"}
    )
    assert status == 400
    status, body = _get(served["base"], "/stats")
    assert status == 200  # server still alive after errors


def test_query_ann_percent_passthrough(served):
    q = served["vectors"][5].tolist()
    status, body = _post(
        served["base"], "/query",
        {"vector": q, "top_k": 3, "ann_percent": 20},
    )
    assert status == 200
    assert body["results"][0]["index"] == 5


def test_concurrent_queries(served):
    """8 threads x 4 queries: the engine lock serializes correctly and every
    response matches the library result for its own query vector."""
    import concurrent.futures

    v = served["vectors"]
    want = {
        i: [r[2] for r in served["db"].query(v[i], top_k=4)] for i in range(8)
    }

    def one(i):
        status, body = _post(
            served["base"], "/query", {"vector": v[i].tolist(), "top_k": 4}
        )
        assert status == 200
        return i, [r["index"] for r in body["results"]]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        futures = [pool.submit(one, i % 8) for i in range(32)]
        for fut in concurrent.futures.as_completed(futures):
            i, got = fut.result()
            assert got == want[i]


def test_sharded_serving_matches_host_db(served):
    """The server duck-types ShardedHyperDB: same /query results as the
    single-chip engine over the 8-device test mesh."""
    import jax
    import threading as _threading
    from jax.sharding import Mesh

    from hyperdb_tpu.parallel.sharded_db import ShardedHyperDB
    from hyperdb_tpu.server import make_server

    sdb = ShardedHyperDB(served["db"], Mesh(np.array(jax.devices()), ("data",)))
    httpd = make_server(sdb, port=0)
    thread = _threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, body = _get(base, "/stats")
        assert status == 200 and body["sharded"] is True
        q = served["vectors"][11].tolist()
        status, body = _post(base, "/query", {"vector": q, "top_k": 5})
        assert status == 200
        got = [r["index"] for r in body["results"]]
        want = [
            r[2]
            for r in served["db"].query(np.asarray(q, dtype=np.float32), top_k=5)
        ]
        assert got == want
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.fixture()
def batched_server(served):
    from hyperdb_tpu.server import make_server

    httpd = make_server(served["db"], port=0, dynamic_batch_ms=15.0,
                        max_batch=16)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield {"httpd": httpd,
           "base": f"http://127.0.0.1:{httpd.server_address[1]}"}
    httpd.batcher.close()
    httpd.shutdown()
    httpd.server_close()


def test_dynamic_batching_coalesces_and_is_correct(served, batched_server,
                                                   monkeypatch):
    """Concurrent identical-parameter vector queries must coalesce into
    fewer query_batch device calls AND return each request's own exact
    results."""
    import concurrent.futures

    db = served["db"]
    calls = []
    real = db.query_batch

    def counting(q, **kw):
        calls.append(np.asarray(q).shape[0])
        return real(q, **kw)

    monkeypatch.setattr(db, "query_batch", counting)

    v = served["vectors"]
    want = {i: [r[2] for r in db.query(v[i], top_k=4)] for i in range(12)}
    base = batched_server["base"]

    def one(i):
        status, body = _post(base, "/query",
                             {"vector": v[i].tolist(), "top_k": 4})
        assert status == 200
        return i, [r["index"] for r in body["results"]]

    with concurrent.futures.ThreadPoolExecutor(max_workers=12) as pool:
        futures = [pool.submit(one, i) for i in range(12)]
        for fut in concurrent.futures.as_completed(futures):
            i, got = fut.result()
            assert got == want[i], i

    # 12 concurrent requests in far fewer device calls than 12
    assert sum(calls) >= 12
    assert len(calls) < 12, calls
    # mixed top_k values share a batch: queried at the max, sliced exactly
    status, body = _post(base, "/query", {"vector": v[0].tolist(), "top_k": 2})
    assert status == 200 and len(body["results"]) == 2
    assert [r["index"] for r in body["results"]] == want[0][:2]


def test_dynamic_batching_mixed_top_k(served, batched_server):
    """Requests differing only in top_k coalesce and each gets its own
    exact prefix."""
    import concurrent.futures

    db = served["db"]
    v = served["vectors"]
    ks = [2, 4, 6, 3, 5, 4, 2, 6]
    want = {i: [r[2] for r in db.query(v[i], top_k=ks[i])] for i in range(8)}
    base = batched_server["base"]

    def one(i):
        status, body = _post(base, "/query",
                             {"vector": v[i].tolist(), "top_k": ks[i]})
        assert status == 200
        return i, [r["index"] for r in body["results"]]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        for fut in concurrent.futures.as_completed(
            [pool.submit(one, i) for i in range(8)]
        ):
            i, got = fut.result()
            assert got == want[i], (i, ks[i])


def test_dynamic_batching_error_propagates(batched_server, served):
    status, body = _post(batched_server["base"], "/query",
                         {"vector": [0.0] * 99, "top_k": 2})
    assert status == 400
    # server still healthy
    status, _ = _get(batched_server["base"], "/healthz")
    assert status == 200


def test_null_top_k_returns_400(served):
    """JSON-valid but mistyped payloads ({"top_k": null} -> int(None)
    TypeError) must produce a 400, not a dropped connection (ADVICE r2)."""
    status, body = _post(
        served["base"], "/query", {"vector": [0.0] * 16, "top_k": None}
    )
    assert status == 400
    status, _ = _get(served["base"], "/stats")
    assert status == 200  # handler thread survived


def test_batcher_submit_after_close_serves_directly(served):
    """A submit() racing past close() must not hang forever on an event
    nobody will set (ADVICE r2): it falls back to a direct query."""
    from hyperdb_tpu.server import _DynamicBatcher

    db = served["db"]
    lock = threading.Lock()
    batcher = _DynamicBatcher(db, lock, max_batch=64, window_ms=2.0)
    batcher.close()
    v = served["vectors"][3]
    result = batcher.submit(v, 4, "cosine_similarity", None, 0, None)
    expected = db.query_batch(v[None, :], top_k=4, metric="cosine_similarity")[0]
    assert [r[2] for r in result] == [r[2] for r in expected]


def _post_binary(base, path, body, timeout=30):
    req = urllib.request.Request(
        base + path, data=body,
        headers={"Content-Type": "application/octet-stream"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_binary_query_matches_json(served):
    """POST /query with a raw f32 body (the serving fast path) returns the
    same ids/scores as the JSON surface, without the documents payload."""
    v = served["vectors"]
    status, want = _post(served["base"], "/query",
                         {"vector": v[9].tolist(), "top_k": 4})
    assert status == 200
    status, got = _post_binary(
        served["base"], "/query?top_k=4", v[9].tobytes()
    )
    assert status == 200
    assert got["ids"] == [r["index"] for r in want["results"]]
    for gs, r in zip(got["scores"], want["results"]):
        assert gs == pytest.approx(r["score"], rel=1e-5)

    # wrong byte count -> 400, not a crash or a hung connection
    status, err = _post_binary(served["base"], "/query?top_k=4",
                               v[9].tobytes()[:-4])
    assert status == 400 and "error" in err


def test_binary_query_through_dynamic_batcher():
    """The binary path rides the dynamic batcher when enabled."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal((32, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(32)], vectors=v)
    httpd = make_server(db, port=0, dynamic_batch_ms=2.0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, got = _post_binary(base, "/query?top_k=1", v[3].tobytes())
        assert status == 200
        assert got["ids"] == [3]
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        httpd.server_close()


def test_text_queries_batch_through_dynamic_batcher():
    """Text /query requests coalesce: one encoder pass per flush, answers
    exact per request, and text+vector requests may share a device batch."""
    rng = np.random.default_rng(9)
    n, d = 64, 12
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    calls = []

    def fake_embed(texts):
        calls.append(len(texts))
        return (
            np.stack([v[int(t.split()[-1])] for t in texts]),
            list(range(len(texts))),
            {},
        )

    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v,
                 embedding_function=fake_embed)
    httpd = make_server(db, port=0, dynamic_batch_ms=20.0, max_batch=32)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        results = {}

        def one(i):
            if i % 3 == 0:  # mixed: some vector, some text requests
                payload = {"vector": v[i].tolist(), "top_k": 1}
            else:
                payload = {"text": f"doc {i}", "top_k": 1}
            results[i] = _post(base, "/query", payload)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(12):
            status, out = results[i]
            assert status == 200
            assert out["results"][0]["index"] == i
        # fewer encoder passes than text requests -> they coalesced
        n_text = sum(1 for i in range(12) if i % 3 != 0)
        assert sum(calls) == n_text
        assert len(calls) < n_text
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        httpd.server_close()


def test_text_dim_mismatch_fails_only_that_entry():
    """A text query whose embedding dimension mismatches the corpus must
    400 alone — vector requests sharing its coalesced group still answer."""
    rng = np.random.default_rng(17)
    n, d = 32, 12
    v = rng.standard_normal((n, d)).astype(np.float32)

    def bad_embed(texts):
        return (np.zeros((len(texts), d + 5), dtype=np.float32),
                list(range(len(texts))), {})

    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v,
                 embedding_function=bad_embed)
    httpd = make_server(db, port=0, dynamic_batch_ms=30.0, max_batch=8)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        results = {}

        def one(i):
            if i == 0:
                results[i] = _post(base, "/query",
                                   {"text": "anything", "top_k": 1})
            else:
                results[i] = _post(base, "/query",
                                   {"vector": v[i].tolist(), "top_k": 1})

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        status0, out0 = results[0]
        assert status0 == 400 and "dimension" in out0["error"]
        for i in range(1, 4):
            status, out = results[i]
            assert status == 200
            assert out["results"][0]["index"] == i
    finally:
        httpd.shutdown()
        httpd.batcher.close()
        httpd.server_close()


def test_add_and_remove_over_http():
    """/add and /remove mutate the corpus; queries see the change."""
    rng = np.random.default_rng(23)
    n, d = 16, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v)
    httpd = make_server(db, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        new_vec = rng.standard_normal(d).astype(np.float32)
        new_vec /= np.linalg.norm(new_vec)
        status, out = _post(base, "/add", {
            "documents": [{"i": 999}],
            "vectors": [new_vec.tolist()],
        })
        assert status == 200 and out == {"added": 1, "documents": n + 1}
        status, out = _post(base, "/query",
                            {"vector": new_vec.tolist(), "top_k": 1})
        assert status == 200
        assert out["results"][0]["document"]["i"] == 999

        status, out = _post(base, "/remove", {"indices": [n]})
        assert status == 200 and out == {"documents": n}
        status, out = _post(base, "/query",
                            {"vector": new_vec.tolist(), "top_k": 1})
        assert out["results"][0]["document"]["i"] != 999
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_add_over_http_native_front_end():
    native_server = pytest.importorskip("hyperdb_tpu.native.server")
    if not native_server.available():
        pytest.skip("native host library unavailable")
    rng = np.random.default_rng(29)
    n, d = 16, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v)
    srv = native_server.NativeQueryServer(db, port=0)
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        vec = rng.standard_normal(d).astype(np.float32)
        payload = json.dumps({"documents": [{"i": 777}],
                              "vectors": [vec.tolist()]}).encode()
        conn.request("POST", "/add", payload,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 200 and out["documents"] == n + 1
        conn.close()
    finally:
        srv.close()


def test_remove_negative_and_out_of_range():
    """-1 removes the LAST document (python-list semantics) with consistent
    chunk bookkeeping; out-of-range returns 400, not a dropped connection."""
    rng = np.random.default_rng(31)
    n, d = 6, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v)
    httpd = make_server(db, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, out = _post(base, "/remove", {"indices": [-1]})
        assert status == 200 and out == {"documents": n - 1}
        assert len(db.documents) == n - 1
        assert len(db.source_indices) == n - 1  # no dangling chunk rows
        assert db.source_indices == list(range(n - 1))

        status, out = _post(base, "/remove", {"indices": [99]})
        assert status == 400 and "out of range" in out["error"]
        assert len(db.documents) == n - 1  # unchanged
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_add_validation_and_failure_surface():
    """Wrong-dimension or miscounted vectors 400 BEFORE mutating; an
    engine-level rollback surfaces as 500, never a silent 200."""
    rng = np.random.default_rng(37)
    n, d = 4, 6
    v = rng.standard_normal((n, d)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v)
    httpd = make_server(db, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, out = _post(base, "/add", {
            "documents": [{"i": 10}], "vectors": [[1.0, 2.0]],
        })
        assert status == 400 and "dimension" in out["error"]
        status, out = _post(base, "/add", {
            "documents": [{"i": 10}, {"i": 11}],
            "vectors": [np.zeros(d).tolist()],
        })
        assert status == 400 and "does not match 2 document" in out["error"]
        assert len(db.documents) == n  # nothing mutated
    finally:
        httpd.shutdown()
        httpd.server_close()
