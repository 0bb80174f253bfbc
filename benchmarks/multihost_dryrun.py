"""Multi-HOST (multi-process) validation of the distributed query path.

The shard_map serving program (parallel/distributed.py) was designed
multi-host-ready: row shards live per-device, only (B, k) candidates cross
the interconnect, and nothing in the program assumes one process. This
script PROVES it across real process boundaries: the launcher spawns N
worker processes that form one global JAX mesh over a localhost gRPC
coordinator (jax.distributed; CPU devices, Gloo collectives — the same
program structure a v5e pod would run over ICI/DCN with the axis laid out
across hosts), then

  1. row-shards a corpus over all global devices with
     jax.make_array_from_process_local_data (each process uploads only its
     local rows — the multi-host ingest pattern),
  2. runs sharded_rank_top_k (f32) and sharded_rank_top_k_int8 end to end,
  3. checks the replicated outputs against a local NumPy oracle in every
     process.

Usage:
  python benchmarks/multihost_dryrun.py                # launcher (2 procs)
  python benchmarks/multihost_dryrun.py --procs 4
Exit code 0 = every process matched the oracle.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4  # per process
N, D, B, K = 4096, 64, 8, 5
SEED = 0


def worker(process_id: int, procs: int, port: int) -> int:
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
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hyperdb_tpu.parallel.distributed import (
        sharded_rank_top_k,
        sharded_rank_top_k_int8,
    )
    from hyperdb_tpu.ops.quantized import quantize_rows

    n_global = LOCAL_DEVICES * procs
    assert jax.device_count() == n_global, jax.device_count()
    mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("data",))

    # identical corpus in every process (same seed); each process feeds the
    # mesh ONLY its local rows — the multi-host ingest pattern
    rng = np.random.default_rng(SEED)
    rows = rng.standard_normal((N, D)).astype(np.float32)
    valid = np.ones(N, dtype=bool)
    valid[-37:] = False  # exercise the mask across shard boundaries
    queries = rng.standard_normal((B, D)).astype(np.float32)

    shard = NamedSharding(mesh, P("data"))
    shard2d = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    per_proc = N // procs
    lo, hi = process_id * per_proc, (process_id + 1) * per_proc
    rows_g = jax.make_array_from_process_local_data(shard2d, rows[lo:hi], rows.shape)
    valid_g = jax.make_array_from_process_local_data(shard, valid[lo:hi], valid.shape)
    q_g = jax.device_put(jnp.asarray(queries), repl)

    vals, idx = sharded_rank_top_k(
        mesh, q_g, rows_g, valid_g, k=K, metric="dot_product"
    )
    got_idx = np.asarray(idx)
    s = rows @ queries.T  # (N, B)
    s[~valid] = -np.inf
    want = np.argsort(-s, axis=0, kind="stable")[:K].T  # (B, K)
    assert (got_idx == want).all(), (process_id, got_idx[0], want[0])
    print(f"proc {process_id}: f32 sharded top-k matches oracle", flush=True)

    # int8 path: per-row symmetric quantization, process-local shards
    q_i8, scales = quantize_rows(rows)
    qg = jax.make_array_from_process_local_data(shard2d, q_i8[lo:hi], q_i8.shape)
    sg = jax.make_array_from_process_local_data(shard, scales[lo:hi], scales.shape)
    vals8, idx8 = sharded_rank_top_k_int8(mesh, q_g, qg, sg, valid_g, k=K)
    got8 = np.asarray(idx8)
    # oracle mirrors the kernel: the query is ALSO int8-quantized on device
    # (ops/quantized._quantize_device), scores are int x int * both scales
    qmax = np.max(np.abs(queries), axis=1)
    q_scale = (qmax / 127.0).astype(np.float32)
    qsafe = np.where(q_scale == 0, 1.0, q_scale)
    qq8 = np.clip(np.rint(queries / qsafe[:, None]), -127, 127).astype(np.int32)
    s8 = (q_i8.astype(np.int32) @ qq8.T).astype(np.float32)
    s8 *= scales[:, None] * q_scale[None, :]
    s8[~valid] = -np.inf
    want8v = -np.sort(-s8, axis=0, kind="stable")[:K].T
    # quantized scores tie across shards, so tie-break order is not pinned;
    # require score-level equality and every returned id to carry its own
    # oracle score (same contract as tests/test_int8_db.py)
    np.testing.assert_allclose(np.asarray(vals8), want8v, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(vals8),
        np.take_along_axis(s8.T, got8, axis=1),
        rtol=1e-4,
        atol=1e-4,
    )
    print(f"proc {process_id}: int8 sharded top-k matches oracle", flush=True)
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", type=int, default=2)
    parser.add_argument("--port", type=int, default=9911)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    if args.process_id is not None:
        return worker(args.process_id, args.procs, args.port)

    procs = []
    for i in range(args.procs):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--process-id",
                    str(i),
                    "--procs",
                    str(args.procs),
                    "--port",
                    str(args.port),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
        )
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out = "(timeout)"
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- process {i} rc={p.returncode}\n{tail}")
        rc |= p.returncode or 0
    print("MULTIHOST DRYRUN:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
