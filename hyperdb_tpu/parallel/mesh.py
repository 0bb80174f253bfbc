"""Device-mesh helpers.

The reference has no distributed code at all (SURVEY.md §2.2); here corpora
scale across chips by row-sharding the (N, d) matrix over a 1-D 'data' mesh
axis (ICI-local collectives), with an optional 'model' axis for
tensor-parallel embedding-model training.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"Requested {n_devices} devices, have {len(devices)}.")
    if n_devices % model_parallel != 0:
        raise ValueError("n_devices must be divisible by model_parallel.")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names=("data", "model"))
