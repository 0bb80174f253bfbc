"""Multi-process SPMD SERVING dryrun (parallel/multihost_serve.py).

Two jax.distributed processes form one 8-device CPU mesh; the corpus is
row-sharded with each process contributing ONLY its local block
(make_array_from_process_local_data — the multi-host ingest pattern).
Process 0 plays the serving leader: it answers `query_batch_arrays` calls
by relaying each query block over the control channel and running the
sharded scan; process 1 parks in `serve_forever` and follows. Results are
checked against a local NumPy oracle.

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

    if process_id != 0:
        svc.connect(port=ctrl_port)
        svc.serve_forever()
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
