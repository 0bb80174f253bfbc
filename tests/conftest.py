"""Test configuration.

Tests run on a CPU-simulated 8-device mesh so sharding/collective logic is
exercised hermetically without TPU hardware (SURVEY.md §4.4). This must run
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
