"""Multi-process SPMD SERVING dryrun (parallel/multihost_serve.py).

Two jax.distributed processes form one 8-device CPU mesh; the corpus is
row-sharded with each process contributing ONLY its local block
(make_array_from_process_local_data — the multi-host ingest pattern).
Process 0 plays the serving leader: it answers `query_batch_arrays` calls
by relaying each query block over the control channel and running the
sharded scan; process 1 parks in `serve_forever` and follows. Results are
checked against a local NumPy oracle.

Phase 2 (VERDICT r3 #4) drives the FULL doc-level surface across the same
process boundary: a CHUNKED corpus (1-3 rows/doc) with metadata, sentence,
skip_doc and key-filter (override) queries, recency bias, a forced
chunk-refill (chunk_slack=1 makes the first fetch too shallow, so the
leader relays a deeper collective), and plane-cache reuse on repeated
specs — ORACLE = the single-chip engine itself (HyperDB.query_batch on
the same host db).

This proves the full multi-host SERVING control flow across real process
boundaries — the piece single-host serving cannot exercise.

Usage: python benchmarks/multihost_serve_dryrun.py [--procs 2]
Exit 0 = leader's oracle checks passed and every process exited cleanly.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4
N, D, B, K = 1000, 32, 5, 4
N_PAD = 1024
SEED = 7
CTRL_PORT = 9931

# phase-2 chunked corpus: 48 docs x (1 + i%3) chunk rows = 96 rows
NDOCS2 = 48
NROWS2 = 96
N_PAD2 = 128


def _emb(texts):
    """Deterministic process-independent bag-of-words embedding (python
    hash() is salted per process, so char-code sums instead)."""
    import numpy as np

    out = np.zeros((len(texts), D), dtype=np.float32)
    for j, t in enumerate(texts):
        for w in str(t).split():
            out[j, sum(ord(c) for c in w) % D] += 1.0
    return out


def build_host_db():
    """The same chunked host db in every process (deterministic)."""
    import numpy as np

    from hyperdb_tpu import HyperDB

    db = HyperDB(embedding_function=_emb,
                 metadata_keys=["cat", "timestamp"])
    rng = np.random.default_rng(11)
    for i in range(NDOCS2):
        chunks = 1 + (i % 3)
        vecs = rng.standard_normal((chunks, D)).astype(np.float32)
        doc = {
            "name": f"item number {i}",
            "text": f"alpha item {i} " + ("beta" if i % 2 else "gamma"),
            "cat": "odd" if i % 2 else "even",
            "timestamp": float(1_000_000 + 60 * i),
        }
        db.add_document(doc, vectors=vecs)
    db.commit_pending()
    # document_keys is collected from CONSTRUCTOR documents only (reference
    # quirk); this corpus is built incrementally, so collect explicitly —
    # the single-chip oracle uses the same db, so key-filter parity holds
    db.document_keys = db.collect_document_keys(list(db.documents))
    assert len(db.source_indices) == NROWS2
    return db


def worker(process_id: int, procs: int, port: int, ctrl_port: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=procs,
        process_id=process_id,
    )
    import numpy as np
    from jax.sharding import Mesh

    from hyperdb_tpu.parallel.multihost_serve import (
        MultihostQueryService,
        build_sharded_rows,
    )

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

    # every process derives the same global corpus deterministically, then
    # contributes ONLY its local slice (real pods read local shards)
    rng = np.random.default_rng(SEED)
    full = rng.standard_normal((N_PAD, D)).astype(np.float32)
    full[N:] = 0.0
    local_rows = N_PAD // procs
    lo = process_id * local_rows
    rows, row_valid, n_pad = build_sharded_rows(
        mesh, full[lo:lo + local_rows], num_rows=N
    )
    assert n_pad == N_PAD

    svc = MultihostQueryService(
        mesh, rows, row_valid, num_rows=N, control_port=ctrl_port
    )

    # ---- phase-2 service: chunked corpus, full doc-level surface ----
    host_db = build_host_db()
    full2 = np.zeros((N_PAD2, D), dtype=np.float32)
    full2[:NROWS2] = np.asarray(host_db.vectors, dtype=np.float32)
    local2 = N_PAD2 // procs
    lo2 = process_id * local2
    rows2, valid2, n_pad2 = build_sharded_rows(
        mesh, full2[lo2:lo2 + local2], num_rows=NROWS2
    )
    svc2 = MultihostQueryService(
        mesh, rows2, valid2, num_rows=NROWS2, control_port=ctrl_port + 2,
        host_db=host_db if process_id == 0 else None,
        chunk_slack=1,  # forces a relayed chunk-refill at top_k=5
    )

    # ---- phase-3 service: int8-pure pod serving over quantized shards ----
    rows8, scales8, valid8, n_pad8 = build_sharded_rows(
        mesh, full[lo:lo + local_rows], num_rows=N, precision="int8"
    )
    assert n_pad8 == N_PAD
    svc3 = MultihostQueryService(
        mesh, rows8, valid8, num_rows=N, control_port=ctrl_port + 4,
        row_scales=scales8,
    )

    if process_id != 0:
        svc.connect(port=ctrl_port)
        svc.serve_forever()
        print(f"[proc {process_id}] follower v1 done", flush=True)
        svc2.connect(port=ctrl_port + 2)
        svc2.serve_forever()
        print(f"[proc {process_id}] follower v2 done", flush=True)
        svc3.connect(port=ctrl_port + 4)
        svc3.serve_forever()
        print(f"[proc {process_id}] follower exited cleanly", flush=True)
        return 0

    svc.accept_followers()
    qs = (full[:N][rng.integers(0, N, size=B)]
          + 0.05 * rng.standard_normal((B, D)).astype(np.float32))

    # oracle: exact cosine over the true rows
    vn = full[:N] / np.linalg.norm(full[:N], axis=1, keepdims=True)

    for trial in range(3):  # repeated queries exercise the relay loop
        ids, scores = svc.query_batch_arrays(qs, top_k=K)
        assert ids.shape == (B, K) and scores.shape == (B, K)
        for b in range(B):
            qn = qs[b] / np.linalg.norm(qs[b])
            sims = vn @ qn
            want = np.argsort(-sims, kind="stable")[:K]
            assert ids[b].tolist() == want.tolist(), (
                trial, b, ids[b], want)
            np.testing.assert_allclose(scores[b], sims[want], rtol=1e-5)

    # the full stack: the native C++ HTTP front-end serving the whole
    # multi-process mesh through the leader
    try:
        from hyperdb_tpu.client import HyperDBClient
        from hyperdb_tpu.native.server import NativeQueryServer, available

        if available():
            srv = NativeQueryServer(svc, port=0, max_batch=8)
            with HyperDBClient("127.0.0.1", srv.port) as client:
                h_ids, h_scores = client.query_batch(qs, top_k=K)
                qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
                sims = qn @ vn.T
                for b in range(B):
                    want = np.argsort(-sims[b], kind="stable")[:K]
                    assert h_ids[b].tolist() == want.tolist()
                st = client.stats()
                assert st["documents"] == N
            srv.close()
            print("HTTP-over-multihost: OK", flush=True)
    except RuntimeError as e:  # no compiler on this host: direct path only
        print(f"native front-end unavailable ({e}); direct path verified",
              flush=True)
    svc.close()

    # ---- phase 2: full doc-level surface, oracle = single-chip engine ----
    svc2.accept_followers()
    q2 = _emb([f"alpha item {i}" for i in (3, 17, 30)]) \
        + 0.01 * rng.standard_normal((3, D)).astype(np.float32)

    v2_passed = []

    def check(name, filters=None, recency_bias=0, timestamp_key=None,
              top_k=5):
        got = svc2.query_batch(
            q2, top_k=top_k, filters=filters,
            recency_bias=recency_bias, timestamp_key=timestamp_key,
        )
        want = host_db.query_batch(
            q2, top_k=top_k, filters=filters,
            recency_bias=recency_bias, timestamp_key=timestamp_key,
        )
        for b, (g, w) in enumerate(zip(got, want)):
            g_ids = [r[2] for r in g]
            w_ids = [r[2] for r in w]
            assert g_ids == w_ids, (name, b, g_ids, w_ids)
            for (_, gs, _), (_, ws, _) in zip(g, w):
                assert abs(gs - ws) <= 1e-4 * max(1.0, abs(ws)), (
                    name, b, gs, ws)
        v2_passed.append(name)
        print(f"v2 {name}: OK", flush=True)

    check("chunked plain")
    # forced refill: chunk_slack=1 at top_k=30 first fetches 32 rows, and
    # 32 rows over this corpus (48 docs, half the rows in multi-chunk
    # docs) cannot hold 30 distinct documents — the leader must relay a
    # deeper second collective
    steps0 = getattr(svc2, "collective_steps", 0)
    check("chunked deep (forced refill)", top_k=30)
    assert svc2.collective_steps >= steps0 + 2, (
        steps0, svc2.collective_steps)
    print("v2 refill relayed a deeper fetch: OK", flush=True)
    check("metadata filter", filters=[("metadata", {"cat": "odd"})])
    check("sentence filter", filters=[("sentence", "beta")])
    check("metadata+sentence",
          filters=[("metadata", {"cat": "odd"}), ("sentence", "beta")])
    check("skip_doc", filters=[("skip_doc", 10)])
    check("recency", recency_bias=2.0)
    check("recency+metadata", recency_bias=2.0,
          filters=[("metadata", {"cat": "even"})])
    check("key override", filters=[("key", "name")])
    check("key override + metadata",
          filters=[("metadata", {"cat": "odd"}), ("key", "name")])
    # plane reuse: repeated spec relays no new plane (token cache)
    tokens_before = dict(svc2._plane_tokens)
    check("metadata filter (repeat)", filters=[("metadata", {"cat": "odd"})])
    assert dict(svc2._plane_tokens) == tokens_before, "plane re-relayed"
    print("v2 plane cache reuse: OK", flush=True)

    svc2.close()
    print(f"V2 SURFACE: {len(v2_passed)} checks + refill + plane reuse OK",
          flush=True)

    # ---- phase 3: int8-pure quantized serving, exact numpy oracle ----
    svc3.accept_followers()
    from hyperdb_tpu.ops.quantized import quantize_rows

    vn3 = full[:N] / np.linalg.norm(full[:N], axis=1, keepdims=True)
    vq, vs = quantize_rows(vn3)  # replicates the shard-local quantization
    ids8, scores8 = svc3.query_batch_arrays(qs, top_k=K)
    qn3 = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    qq, qsc = quantize_rows(qn3)  # device _quantize_device: same math
    oracle = (qq.astype(np.int32) @ vq.T.astype(np.int32)).astype(
        np.float32
    ) * (qsc[:, None] * vs[None, :])
    for b in range(B):
        want = np.argsort(-oracle[b], kind="stable")[:K]
        assert ids8[b].tolist() == want.tolist(), (b, ids8[b], want)
        np.testing.assert_allclose(scores8[b], oracle[b][want], rtol=1e-5)
    svc3.close()
    print("INT8 POD SERVING: OK", flush=True)
    print("MULTIHOST SERVE DRYRUN: OK", flush=True)
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", type=int, default=2)
    parser.add_argument("--port", type=int, default=9929)
    parser.add_argument("--ctrl-port", type=int, default=CTRL_PORT)
    parser.add_argument("--worker", type=int, default=None)
    args = parser.parse_args()

    if args.worker is not None:
        return worker(args.worker, args.procs, args.port, args.ctrl_port)

    procs = []
    for pid in range(args.procs):
        env = dict(os.environ)
        env["HYPERDB_CHIP_LOCK_BYPASS"] = "1"
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(pid), "--procs", str(args.procs),
             "--port", str(args.port), "--ctrl-port", str(args.ctrl_port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        ))
    rc = 0
    ok = False
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        tail = out[-1500:]
        print(f"--- worker {pid} (rc={p.returncode}) ---\n{tail}",
              flush=True)
        rc |= p.returncode
        ok |= "MULTIHOST SERVE DRYRUN: OK" in out
    if rc == 0 and ok:
        print("MULTIHOST SERVE DRYRUN: OK (launcher)", flush=True)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
