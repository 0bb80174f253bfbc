"""Multi-process serving FAULT dryrun (VERDICT r4 #7).

A follower that CLOSES its control channel already raises on the leader;
the dangerous failure is a follower that HANGS — the process is alive,
the socket open, but it stops draining messages (wedged host, stuck
device call). Before round 5 that blocked the leader forever: the relay
send would eventually fill the TCP buffer, or the leader entered a
collective the follower never joined, deadlocking the whole mesh.

This dryrun proves the ack-barrier fix end to end across real process
boundaries: two jax.distributed CPU processes form a mesh; the follower
executes ONE query normally, then stops reading its control socket
(serve_forever(max_msgs=1) + sleep — the hung-host simulation). The
leader's second query must raise RuntimeError within the ack deadline
(5 s here) instead of deadlocking, and must raise BEFORE entering the
collective (the error arrives as an exception, not a wedged process).

Usage: python benchmarks/multihost_fault_dryrun.py
Exit 0 = first query matched the oracle, second raised within deadline.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4
N, D, B, K = 512, 32, 4, 4
SEED = 13
ACK_TIMEOUT_S = 5.0
RAISE_DEADLINE_S = 30.0  # generous: deadline + one slow-CI margin


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
    rng = np.random.default_rng(SEED)
    full = rng.standard_normal((N, D)).astype(np.float32)
    local = N // procs
    lo = process_id * local
    rows, row_valid, _ = build_sharded_rows(mesh, full[lo:lo + local],
                                            num_rows=N)
    svc = MultihostQueryService(
        mesh, rows, row_valid, num_rows=N, control_port=ctrl_port,
        ack_timeout_s=ACK_TIMEOUT_S,
    )

    if process_id != 0:
        svc.connect(port=ctrl_port)
        svc.serve_forever(max_msgs=1)  # one healthy query...
        print("[follower] hanging: socket open, no longer reading",
              flush=True)
        time.sleep(600)  # ...then simulate the hung host (launcher kills us)
        return 0

    svc.accept_followers()
    qs = full[rng.integers(0, N, size=B)] \
        + 0.05 * rng.standard_normal((B, D)).astype(np.float32)
    vn = full / np.linalg.norm(full, axis=1, keepdims=True)

    ids, scores = svc.query_batch_arrays(qs, top_k=K)
    for b in range(B):
        qn = qs[b] / np.linalg.norm(qs[b])
        want = np.argsort(-(vn @ qn), kind="stable")[:K]
        assert ids[b].tolist() == want.tolist(), (b, ids[b], want)
    print("[leader] healthy query matched oracle", flush=True)

    t0 = time.time()
    try:
        svc.query_batch_arrays(qs, top_k=K)
    except RuntimeError as e:
        dt = time.time() - t0
        assert dt < RAISE_DEADLINE_S, f"raised, but after {dt:.1f}s"
        assert "follower" in str(e), e
        print(f"[leader] hung follower raised in {dt:.1f}s: {e}",
              flush=True)
        print("MULTIHOST FAULT DRYRUN: OK", flush=True)
        # skip jax.distributed shutdown: the follower is (intentionally)
        # wedged and the coordinator barrier would wait for it
        sys.stdout.flush()
        os._exit(0)
    raise AssertionError("leader did not raise on the hung follower")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", type=int, default=2)
    parser.add_argument("--port", type=int, default=9951)
    parser.add_argument("--ctrl-port", type=int, default=9953)
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
    # the leader (worker 0) decides the verdict; the follower is wedged by
    # design and is killed once the leader exits (its own Popen handle —
    # never a pattern kill)
    out0, _ = procs[0].communicate(timeout=180)
    print(f"--- leader (rc={procs[0].returncode}) ---\n{out0[-1500:]}",
          flush=True)
    for p in procs[1:]:
        p.kill()
        p.communicate(timeout=30)
    if procs[0].returncode == 0 and "MULTIHOST FAULT DRYRUN: OK" in out0:
        print("MULTIHOST FAULT DRYRUN: OK (launcher)", flush=True)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
