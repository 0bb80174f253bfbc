"""Device->host transfer helpers for the tunnel platform.

On this image every blocking ``np.asarray(device_array)`` is its own
~25 ms host<->device round trip, while ``jax.device_get`` fetches a whole
pytree in ONE round trip (measured: two np.asarray readbacks 51.6 ms vs
one device_get of the same pair 26.2 ms — benchmarks/probe_readback.py,
results.jsonl). Every query path that reads back more than one array per
call must go through :func:`fetch`.
"""

from __future__ import annotations

import numpy as np


def fetch(*arrays):
    """Read back any number of (device or host) arrays in one round trip.

    Returns a tuple of np.ndarrays in argument order. Host arrays pass
    through untouched (device_get is a no-op copy for them).
    """
    import jax

    out = jax.device_get(arrays)
    return tuple(np.asarray(a) for a in out)
