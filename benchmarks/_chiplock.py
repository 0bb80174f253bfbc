"""Serialize TPU benchmark processes behind one advisory chip claim.

On this platform exactly ONE process may hold the tunnel chip: a second
python touching JAX steals the claim and the first blocks forever
(CLAUDE.md). Every benchmark entrypoint calls :func:`claim_chip` BEFORE
importing jax, so concurrent launches queue instead of wedging each other.

The lock is advisory (``flock`` on a file in /tmp) and held for the process
lifetime; it is released automatically by the kernel on exit, including
crashes. Runs that force the cpu backend the way tests/conftest.py does
(jax.config.update, not just the env var) may skip the claim with
``HYPERDB_CHIP_LOCK_BYPASS=1``.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCKFILE = os.environ.get("HYPERDB_CHIP_LOCK", "/tmp/hyperdb_tpu_chip.lock")

_handle = None  # keep the fd alive for the process lifetime


def claim_chip(timeout_s: float = 3600.0):
    """Block until this process holds the exclusive chip claim.

    Call before the first ``import jax``. Always claims unless the caller
    explicitly sets HYPERDB_CHIP_LOCK_BYPASS=1 (see NOTE below — the env
    var JAX_PLATFORMS alone does NOT keep a process off the chip here).
    """
    global _handle
    if _handle is not None:
        return
    # NOTE: JAX_PLATFORMS=cpu in the env is NOT enough to stay off the chip
    # on this image — the axon sitecustomize updates jax's config after env
    # resolution (tests/conftest.py works around it with jax.config.update).
    # The bypass is therefore explicit, for callers that force cpu the way
    # conftest does.
    if os.environ.get("HYPERDB_CHIP_LOCK_BYPASS") == "1":
        return
    fh = open(LOCKFILE, "a+")
    try:
        # evidence of a recent previous holder, whether or not we end up
        # blocking on its flock (it may have exited a second ago)
        prev_holder_age = time.time() - os.fstat(fh.fileno()).st_mtime
    except OSError:
        prev_holder_age = float("inf")
    start = time.time()
    warned = False
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except BlockingIOError:
            if time.time() - start > timeout_s:
                fh.close()
                raise TimeoutError(
                    f"chip claim {LOCKFILE} held by another benchmark for "
                    f">{timeout_s:.0f}s"
                )
            if not warned:
                print(
                    f"[chiplock] waiting for {LOCKFILE} "
                    "(another benchmark holds the chip)",
                    file=sys.stderr,
                    flush=True,
                )
                warned = True
            time.sleep(2.0)
    fh.seek(0)
    fh.truncate()
    fh.write(f"pid={os.getpid()} argv={' '.join(sys.argv)}\n")
    fh.flush()
    _handle = fh
    if warned or prev_holder_age < 600:
        # Another benchmark held the chip recently (we blocked on its
        # flock, or its lockfile write is fresh): its tunnel-side chip
        # claim can outlive its process exit by seconds, and a first
        # device call issued into a lingering claim has been observed to
        # wedge PERMANENTLY (no retry) rather than wait. A short grace
        # window is noise against multi-minute benchmark runs.
        grace = float(os.environ.get("HYPERDB_CHIP_CLAIM_GRACE", "15"))
        if grace > 0:
            time.sleep(grace)
