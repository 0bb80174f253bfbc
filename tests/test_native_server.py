"""Native C++ epoll serving front-end (native/server.cc + native/server.py).

Exercises the full wire surface against a live engine on the hermetic CPU
backend: the binary hot path (JSON and binary responses), batching under
real concurrency (results must match the exact oracle regardless of how
requests coalesced), the shared JSON dispatcher on the generic path, error
mapping, keep-alive reuse, and clean shutdown. Skips when no compiler can
build the host library.
"""

import http.client
import json
import struct
import threading

import numpy as np
import pytest

from hyperdb_tpu import HyperDB

native_server = pytest.importorskip("hyperdb_tpu.native.server")

if not native_server.available():  # no compiler in this environment
    pytest.skip("native host library unavailable", allow_module_level=True)

N, D = 4096, 32


@pytest.fixture(scope="module")
def served():
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N, D)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    docs = [{"i": int(i), "grp": ["a", "b"][i % 2]} for i in range(N)]
    db = HyperDB(documents=docs, vectors=v, metadata_keys=["grp"])
    srv = native_server.NativeQueryServer(db, port=0, max_batch=32,
                                          window_ms=2.0)
    yield {"db": db, "srv": srv, "vectors": v, "port": srv.port}
    srv.close()


def _conn(served):
    c = http.client.HTTPConnection("127.0.0.1", served["port"], timeout=30)
    return c


def _binary_query(conn, vec, top_k=5, metric=None, binary_out=False):
    path = f"/query?top_k={top_k}"
    if metric:
        path += f"&metric={metric}"
    headers = {"Content-Type": "application/octet-stream"}
    if binary_out:
        headers["Accept"] = "application/octet-stream"
    conn.request("POST", path, vec.astype(np.float32).tobytes(), headers)
    resp = conn.getresponse()
    body = resp.read()
    if resp.status != 200:
        return resp.status, json.loads(body)
    if binary_out:
        k = struct.unpack("<I", body[:4])[0]
        ids = np.frombuffer(body[4:4 + 8 * k], dtype=np.int64)
        scores = np.frombuffer(body[4 + 8 * k:], dtype=np.float32)
        return 200, {"ids": ids.tolist(), "scores": scores.tolist()}
    return 200, json.loads(body)


def _oracle_ids(v, q, k):
    qn = q / np.linalg.norm(q)
    return np.argsort(-(v @ qn), kind="stable")[:k]


def test_healthz_inline(served):
    conn = _conn(served)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200 and json.loads(resp.read()) == {"ok": True}
    conn.close()


def test_binary_query_json_response(served):
    conn = _conn(served)
    q = served["vectors"][11] + 0.01
    status, out = _binary_query(conn, q, top_k=7)
    assert status == 200
    assert out["ids"] == _oracle_ids(served["vectors"], q, 7).tolist()
    assert len(out["scores"]) == 7
    assert out["scores"] == sorted(out["scores"], reverse=True)
    conn.close()


def test_binary_query_binary_response(served):
    conn = _conn(served)
    q = served["vectors"][42] + 0.01
    status, out = _binary_query(conn, q, top_k=5, binary_out=True)
    assert status == 200
    assert out["ids"] == _oracle_ids(served["vectors"], q, 5).tolist()
    # scores match the library's own to float32
    rows = served["db"].query_batch(q[None, :], top_k=5)[0]
    assert np.allclose(out["scores"], [r[1] for r in rows], atol=1e-5)
    conn.close()


def test_keep_alive_reuse(served):
    conn = _conn(served)
    for i in (3, 1000, 2048):
        q = served["vectors"][i] + 0.01
        status, out = _binary_query(conn, q, top_k=1)
        assert status == 200 and out["ids"][0] == _oracle_ids(
            served["vectors"], q, 1
        )[0]
    conn.close()


def test_generic_json_paths(served):
    conn = _conn(served)
    q = served["vectors"][9].tolist()
    body = json.dumps({"vector": q, "top_k": 3}).encode()
    conn.request("POST", "/query", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 200
    assert [r["index"] for r in out["results"]] == _oracle_ids(
        served["vectors"], np.asarray(q), 3
    ).tolist()
    # filters ride the generic path untouched
    body = json.dumps({
        "vector": q, "top_k": 3,
        "filters": [["metadata", {"grp": "a"}]],
    }).encode()
    conn.request("POST", "/query", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 200
    assert all(r["document"]["grp"] == "a" for r in out["results"])
    # /stats via the shared dispatcher
    conn.request("GET", "/stats")
    resp = conn.getresponse()
    st = json.loads(resp.read())
    assert resp.status == 200 and st["documents"] == N and st["dim"] == D
    conn.close()


def test_error_mapping(served):
    conn = _conn(served)
    # wrong body size -> inline C++ 400
    conn.request("POST", "/query?top_k=5", b"xyz",
                 {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    assert resp.status == 400 and b"corpus dimension" in resp.read()
    # bad metric -> engine error surfaced as 400 for the whole batch
    q = served["vectors"][0]
    status, out = _binary_query(conn, q, top_k=5, metric="bogus")
    assert status == 400 and "Invalid metric" in out["error"]
    # non-positive top_k -> inline C++ 400
    conn.request("POST", "/query?top_k=0", q.tobytes(),
                 {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    assert resp.status == 400 and b"top_k" in resp.read()
    # malformed JSON on the generic path
    conn.request("POST", "/query", b"{oops",
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400 and b"bad JSON" in resp.read()
    # unknown path
    conn.request("GET", "/nope")
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()
    conn.close()


def test_concurrent_batching_matches_oracle(served):
    """32 threads x 8 requests with mixed top_k: every response must be the
    exact per-query answer no matter how the C++ batcher grouped them (the
    flush queries at the group max top_k and slices per request)."""
    v = served["vectors"]
    rng = np.random.default_rng(3)
    errors = []

    def worker(tid):
        try:
            conn = _conn(served)
            for j in range(8):
                i = int(rng.integers(0, N))
                q = v[i] + 0.01
                k = [1, 3, 5, 9][(tid + j) % 4]
                status, out = _binary_query(conn, q, top_k=k,
                                            binary_out=j % 2 == 0)
                assert status == 200, out
                assert out["ids"] == _oracle_ids(v, q, k).tolist(), (
                    tid, j, k
                )
            conn.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors[0]


def test_mixed_metrics_are_not_coalesced(served):
    """Concurrent requests with different metrics must never share a batch
    (grouping is per metric); both must come back correct."""
    v = served["vectors"]
    q = v[77] + 0.01
    out = {}

    def ask(metric):
        conn = _conn(served)
        status, res = _binary_query(conn, q, top_k=3, metric=metric)
        out[metric] = (status, res)
        conn.close()

    threads = [
        threading.Thread(target=ask, args=(m,))
        for m in ("cosine_similarity", "dot_product")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert out["cosine_similarity"][0] == 200
    assert out["dot_product"][0] == 200
    assert out["cosine_similarity"][1]["ids"] == _oracle_ids(v, q, 3).tolist()
    dot_ids = np.argsort(-(v @ q), kind="stable")[:3].tolist()
    assert out["dot_product"][1]["ids"] == dot_ids


def test_close_unblocks_and_is_idempotent():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((256, 8)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(256)], vectors=v)
    srv = native_server.NativeQueryServer(db, port=0)
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
    conn.request("GET", "/healthz")
    assert conn.getresponse().status == 200
    conn.close()
    srv.close()
    srv.close()  # second close is a no-op
    assert not srv._worker.is_alive()


def test_native_server_wraps_sharded_db():
    """The native front-end serves a ShardedHyperDB through its
    query_batch_arrays adapter; answers must match the host db's."""
    import jax
    from jax.sharding import Mesh

    from hyperdb_tpu.parallel.sharded_db import ShardedHyperDB

    rng = np.random.default_rng(5)
    v = rng.standard_normal((512, 16)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    db = HyperDB(documents=[{"i": int(i)} for i in range(512)], vectors=v)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sdb = ShardedHyperDB(db, mesh)
    srv = native_server.NativeQueryServer(sdb, port=0, max_batch=8)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        q = v[33] + 0.01
        status, out = _binary_query(conn, q, top_k=4)
        assert status == 200
        assert out["ids"] == _oracle_ids(v, q, 4).tolist()
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["sharded"] is True
        conn.close()
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# text/plain hot path (tag 3): the worker embeds the whole flush in one
# encoder pass, then runs the same array-level engine call as the binary path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def served_text():
    rng = np.random.default_rng(11)
    v = rng.standard_normal((512, 24)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    calls = []  # one entry per encoder pass -> proves batching

    def fake_embed(texts):
        calls.append(len(texts))
        out = np.stack([v[int(t.split()[-1])] for t in texts])
        return out, list(range(len(texts))), {}

    docs = [{"i": int(i)} for i in range(512)]
    db = HyperDB(documents=docs, vectors=v, embedding_function=fake_embed)
    srv = native_server.NativeQueryServer(db, port=0, max_batch=16,
                                          window_ms=4.0)
    yield {"db": db, "srv": srv, "vectors": v, "port": srv.port,
           "calls": calls}
    srv.close()


def _text_query(conn, text, top_k=5, binary_out=False):
    headers = {"Content-Type": "text/plain"}
    if binary_out:
        headers["Accept"] = "application/octet-stream"
    conn.request("POST", f"/query?top_k={top_k}", text.encode(), headers)
    resp = conn.getresponse()
    body = resp.read()
    if resp.status != 200:
        return resp.status, json.loads(body)
    if binary_out:
        k = struct.unpack("<I", body[:4])[0]
        ids = np.frombuffer(body[4:4 + 8 * k], dtype=np.int64)
        scores = np.frombuffer(body[4 + 8 * k:], dtype=np.float32)
        return 200, {"ids": ids.tolist(), "scores": scores.tolist()}
    return 200, json.loads(body)


def test_text_query_roundtrip(served_text):
    v = served_text["vectors"]
    conn = http.client.HTTPConnection("127.0.0.1", served_text["port"],
                                      timeout=30)
    status, out = _text_query(conn, "doc 37", top_k=3)
    assert status == 200
    assert out["ids"][0] == 37
    assert out["ids"] == _oracle_ids(v, v[37], 3).tolist()
    status, out = _text_query(conn, "doc 99", top_k=2, binary_out=True)
    assert status == 200 and out["ids"][0] == 99
    conn.close()


def test_text_queries_coalesce_one_encoder_pass(served_text):
    """Concurrent text queries must flush as ONE batch: a single encoder
    call and per-query exact answers."""
    v = served_text["vectors"]
    served_text["calls"].clear()
    results = {}

    def one(i):
        conn = http.client.HTTPConnection("127.0.0.1", served_text["port"],
                                          timeout=30)
        results[i] = _text_query(conn, f"doc {i}", top_k=1)
        conn.close()

    threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(12):
        status, out = results[i]
        assert status == 200 and out["ids"][0] == i
    # 12 requests, far fewer encoder passes than requests (batched flushes)
    assert len(served_text["calls"]) < 12
    assert sum(served_text["calls"]) == 12


def test_text_query_errors(served_text):
    conn = http.client.HTTPConnection("127.0.0.1", served_text["port"],
                                      timeout=30)
    conn.request("POST", "/query?top_k=3", b"", {"Content-Type": "text/plain"})
    resp = conn.getresponse()
    assert resp.status == 400
    resp.read()
    # an embed failure (unparseable text) must 400 the batch, not kill it
    status, out = _text_query(conn, "not a number")
    assert status == 400 and "error" in out
    status, out = _text_query(conn, "doc 5", top_k=1)
    assert status == 200 and out["ids"] == [5]
    conn.close()


def test_generate_query_vectors_batch_chunk_mean():
    """Long queries (multi-chunk embeddings) average their chunks exactly
    like the single-query path (engine.generate_and_validate_query_vector)."""
    from hyperdb_tpu.query.engine import generate_query_vectors_batch

    d = 8

    def fake_embed(texts):
        # text "a" -> one chunk of ones; "b" -> two chunks (2s and 4s)
        rows, src = [], []
        for i, t in enumerate(texts):
            if t == "b":
                rows += [np.full(d, 2.0), np.full(d, 4.0)]
                src += [i, i]
            else:
                rows.append(np.ones(d))
                src.append(i)
        return np.stack(rows).astype(np.float32), src, {}

    class FakeDB:
        dim = d
        embedding_function = staticmethod(fake_embed)

    out = generate_query_vectors_batch(FakeDB, ["a", "b", "a"])
    assert out.shape == (3, d)
    np.testing.assert_allclose(out[0], np.ones(d))
    np.testing.assert_allclose(out[1], np.full(d, 3.0))  # mean of 2 and 4
    np.testing.assert_allclose(out[2], np.ones(d))


def test_f16_wire_auto_on_f16_store_exact():
    """An f16 store flips the server to f16 wire blocks (halved upload);
    with f16-representable corpus and queries the results stay EXACT."""
    rng = np.random.default_rng(21)
    v16 = rng.standard_normal((1024, 32)).astype(np.float16)
    v = v16.astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(1024)], vectors=v,
                 fp_precision="float16")
    srv = native_server.NativeQueryServer(db, port=0, max_batch=8)
    try:
        assert srv.wire_f16 is True
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        for i in (5, 700):
            q = v16[i].astype(np.float32)  # f16-representable: cast lossless
            status, out = _binary_query(conn, q, top_k=5)
            assert status == 200
            assert out["ids"][0] == i
        conn.close()
    finally:
        srv.close()


def test_f32_store_keeps_f32_wire():
    rng = np.random.default_rng(22)
    v = rng.standard_normal((64, 16)).astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(64)], vectors=v)
    srv = native_server.NativeQueryServer(db, port=0)
    try:
        assert srv.wire_f16 is False
    finally:
        srv.close()


def test_engine_accepts_f16_block():
    """query_batch_arrays preserves an f16 block end-to-end and matches the
    f32 result when the block is f16-representable."""
    rng = np.random.default_rng(23)
    v16 = rng.standard_normal((2048, 16)).astype(np.float16)
    v = v16.astype(np.float32)
    db = HyperDB(documents=[{"i": int(i)} for i in range(2048)], vectors=v,
                 fp_precision="float16")
    q16 = v16[[3, 900, 1500]]
    ids16, sc16 = db.query_batch_arrays(q16, top_k=4)
    ids32, sc32 = db.query_batch_arrays(q16.astype(np.float32), top_k=4)
    np.testing.assert_array_equal(ids16, ids32)
    np.testing.assert_allclose(sc16, sc32, rtol=2e-3)


# ---------------------------------------------------------------------------
# HTTP/1.1 pipelining: many in-flight requests per connection, responses in
# request order even when they complete in different flushes
# ---------------------------------------------------------------------------


def test_pipelined_requests_ordered_and_exact(served):
    """Write 40 binary queries back-to-back on ONE socket, then read 40
    responses: order must match request order and every answer must match
    the per-query oracle."""
    import socket

    v = served["vectors"]
    rng = np.random.default_rng(77)
    qids = rng.integers(0, N, size=40)

    sock = socket.create_connection(("127.0.0.1", served["port"]))
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    payload = b""
    for i in qids:
        body = v[int(i)].astype(np.float32).tobytes()
        payload += (
            f"POST /query?top_k=3 HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
    sock.sendall(payload)

    buf = b""
    answers = []
    for _ in range(len(qids)):
        while b"\r\n\r\n" not in buf:
            chunk = sock.recv(65536)
            assert chunk, "server closed mid-pipeline"
            buf += chunk
        head, rest = buf.split(b"\r\n\r\n", 1)
        clen = 0
        for line in head.split(b"\r\n")[1:]:
            if line[:15].lower() == b"content-length:":
                clen = int(line[15:])
        while len(rest) < clen:
            chunk = sock.recv(65536)
            assert chunk
            rest += chunk
        assert head.split(b" ", 2)[1] == b"200"
        answers.append(json.loads(rest[:clen]))
        buf = rest[clen:]
    sock.close()

    for i, out in zip(qids, answers):
        assert out["ids"] == _oracle_ids(v, v[int(i)], 3).tolist()


def test_pipelined_mixed_metrics_stay_ordered(served):
    """Interleave two metrics on one pipelined socket: flushes are
    per-metric (they complete at different times), but the connection's
    responses must still come back in request order."""
    import socket

    v = served["vectors"]
    ids = [3, 7, 11, 19, 23, 42]
    sock = socket.create_connection(("127.0.0.1", served["port"]))
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    payload = b""
    for j, i in enumerate(ids):
        metric = "cosine_similarity" if j % 2 == 0 else "dot_product"
        body = v[i].astype(np.float32).tobytes()
        payload += (
            f"POST /query?top_k=1&metric={metric} HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
    sock.sendall(payload)

    buf = b""
    got = []
    for _ in ids:
        while b"\r\n\r\n" not in buf:
            chunk = sock.recv(65536)
            assert chunk
            buf += chunk
        head, rest = buf.split(b"\r\n\r\n", 1)
        clen = 0
        for line in head.split(b"\r\n")[1:]:
            if line[:15].lower() == b"content-length:":
                clen = int(line[15:])
        while len(rest) < clen:
            rest += sock.recv(65536)
        got.append(json.loads(rest[:clen])["ids"][0])
        buf = rest[clen:]
    sock.close()
    assert got == ids  # unit rows: each query's top-1 is itself, in order


def test_pipelined_error_midstream_keeps_order(served):
    """A 400 (wrong byte count) in the middle of a pipeline must come back
    in position and leave the connection usable for the rest."""
    import socket

    v = served["vectors"]
    sock = socket.create_connection(("127.0.0.1", served["port"]))
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def req(body):
        return (
            f"POST /query?top_k=1 HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    good1 = v[5].astype(np.float32).tobytes()
    bad = v[6].astype(np.float32).tobytes()[:-4]  # wrong byte count -> 400
    good2 = v[9].astype(np.float32).tobytes()
    sock.sendall(req(good1) + req(bad) + req(good2))

    statuses, bodies = [], []
    buf = b""
    for _ in range(3):
        while b"\r\n\r\n" not in buf:
            chunk = sock.recv(65536)
            assert chunk, "server closed mid-pipeline"
            buf += chunk
        head, rest = buf.split(b"\r\n\r\n", 1)
        clen = 0
        for line in head.split(b"\r\n")[1:]:
            if line[:15].lower() == b"content-length:":
                clen = int(line[15:])
        while len(rest) < clen:
            rest += sock.recv(65536)
        statuses.append(int(head.split(b" ", 2)[1]))
        bodies.append(json.loads(rest[:clen]))
        buf = rest[clen:]
    sock.close()

    assert statuses == [200, 400, 200]
    assert bodies[0]["ids"][0] == 5
    assert "error" in bodies[1]
    assert bodies[2]["ids"][0] == 9


def test_text_with_nul_byte_embeds_full_body(served_text):
    """NUL bytes in a text body must reach the embedder intact (the
    accessor is (ptr, len), not a NUL-terminated string)."""
    v = served_text["vectors"]
    conn = http.client.HTTPConnection("127.0.0.1", served_text["port"],
                                      timeout=30)
    # fake embedder keys on the LAST whitespace token — a NUL in the middle
    # must not truncate the text before it
    body = b"doc\x00ignored 44"
    conn.request("POST", "/query?top_k=1", body,
                 {"Content-Type": "text/plain"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 200 and out["ids"][0] == 44
    conn.close()


def test_control_byte_metric_rejected(served):
    """A %01 byte in the metric param must 400, not forge the internal
    text-batch group marker."""
    conn = _conn(served)
    vec = served["vectors"][0].astype(np.float32).tobytes()
    conn.request("POST", "/query?top_k=3&metric=cosine_similarity%01t", vec,
                 {"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    assert resp.status == 400 and "invalid" in out["error"]
    conn.close()


def test_mutation_amid_pipelined_queries():
    """/add lands between pipelined query flushes (one worker serializes
    them); queries before and after both answer, counts stay consistent."""
    import socket

    rng = np.random.default_rng(51)
    n, d = 256, 16
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    db = HyperDB(documents=[{"i": int(i)} for i in range(n)], vectors=v)
    srv = native_server.NativeQueryServer(db, port=0, max_batch=16,
                                          window_ms=2.0)
    try:
        sock = socket.create_connection(("127.0.0.1", srv.port))
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        add_body = json.dumps({
            "documents": [{"i": 1000}],
            "vectors": [(-v[0]).tolist()],  # anti-parallel: unique top-1
        }).encode()
        payload = b""
        for i in (3, 4):
            body = v[i].astype(np.float32).tobytes()
            payload += (
                f"POST /query?top_k=1 HTTP/1.1\r\nHost: x\r\n"
                f"Content-Type: application/octet-stream\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        payload += (
            f"POST /add HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(add_body)}\r\n\r\n"
        ).encode() + add_body
        q_new = (-v[0]).astype(np.float32).tobytes()
        payload += (
            f"POST /query?top_k=1 HTTP/1.1\r\nHost: x\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {len(q_new)}\r\n\r\n"
        ).encode() + q_new
        sock.sendall(payload)

        outs = []
        buf = b""
        for _ in range(4):
            while b"\r\n\r\n" not in buf:
                chunk = sock.recv(65536)
                assert chunk, "server closed mid-pipeline"
                buf += chunk
            head, rest = buf.split(b"\r\n\r\n", 1)
            clen = 0
            for line in head.split(b"\r\n")[1:]:
                if line[:15].lower() == b"content-length:":
                    clen = int(line[15:])
            while len(rest) < clen:
                rest += sock.recv(65536)
            assert head.split(b" ", 2)[1] == b"200"
            outs.append(json.loads(rest[:clen]))
            buf = rest[clen:]
        sock.close()
        assert outs[0]["ids"][0] == 3 and outs[1]["ids"][0] == 4
        assert outs[2] == {"added": 1, "documents": n + 1}
        assert outs[3]["ids"][0] == n  # the freshly added document wins
    finally:
        srv.close()
