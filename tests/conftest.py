"""Test configuration.

Tests run on a CPU-simulated 8-device mesh so sharding/collective logic is
exercised hermetically without TPU hardware (SURVEY.md §4.4). This must run
before the first ``import jax`` anywhere in the test process.
"""

import os

# Keep the suite on the DEVICE paths: the tiny-corpus host fast path would
# otherwise absorb most small fixtures and silently drop device-kernel
# coverage. Host/device result equality is pinned in tests/test_host_path.py,
# which re-enables the path via CONFIG monkeypatching.
os.environ.setdefault("HYPERDB_HOST_PATH_MAX_CELLS", "0")

# The hermetic hash embedder keeps the suite fast and deterministic; the
# trained local encoder (models/assets/) is exercised by its own tests.
os.environ.setdefault("HYPERDB_DEFAULT_EMBEDDER", "hash")

# Force CPU even when the environment pins a TPU platform (JAX_PLATFORMS=axon
# in this image): tests must be hermetic and exercise the 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize re-registers the TPU platform via
# jax.config.update, which overrides the env var — override it back before
# any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
