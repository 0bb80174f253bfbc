"""Utility-layer tests: LRU cache, deep sizeof, stats, config."""

import time

import numpy as np

from hyperdb_tpu.config import EngineConfig
from hyperdb_tpu.utils.lru import LRUCache
from hyperdb_tpu.utils.sizeof import deep_sizeof
from hyperdb_tpu.utils.trace import Stats


class TestLRU:
    def test_eviction_order(self):
        c = LRUCache(maxsize=2)
        c["a"] = 1
        c["b"] = 2
        _ = c["a"]  # refresh a
        c["c"] = 3  # evicts b
        assert "a" in c and "c" in c and "b" not in c

    def test_zero_size(self):
        c = LRUCache(maxsize=0)
        c["a"] = 1
        assert "a" not in c and len(c) == 0

    def test_update_moves_to_end(self):
        c = LRUCache(maxsize=2)
        c["a"] = 1
        c["b"] = 2
        c["a"] = 10  # refresh via write
        c["c"] = 3
        assert c.get("a") == 10 and "b" not in c


class TestSizeof:
    def test_numpy_buffer_counted(self):
        arr = np.zeros(1000, dtype=np.float64)
        assert deep_sizeof(arr) >= 8000

    def test_nested_containers(self):
        obj = {"a": [1, 2, 3], "b": {"c": "hello" * 100}}
        assert deep_sizeof(obj) > deep_sizeof({})

    def test_cycle_safe(self):
        a = []
        a.append(a)
        assert deep_sizeof(a) > 0


class TestStats:
    def test_record_and_snapshot(self):
        s = Stats()
        s.record("query", 0.01)
        s.record("query", 0.03)
        snap = s.snapshot()
        assert snap["query"]["count"] == 2
        assert 0.039 < snap["query"]["total_s"] < 0.041
        assert snap["query"]["ewma_ms"] > 0

    def test_phase_context(self):
        s = Stats()
        with s.phase("sleepy"):
            time.sleep(0.01)
        assert s.snapshot()["sleepy"]["total_s"] >= 0.009


def test_engine_config_env(monkeypatch):
    monkeypatch.setenv("HYPERDB_IVF_THRESHOLD", "1234")
    cfg = EngineConfig()
    assert cfg.ivf_threshold == 1234


def test_deep_sizeof_object_arrays_count_elements():
    import numpy as np

    from hyperdb_tpu.utils.sizeof import deep_sizeof

    big = ["x" * 10000, "y" * 10000]
    arr = np.empty(2, dtype=object)
    arr[0], arr[1] = big
    assert deep_sizeof(arr) > 20000  # elements, not 16 pointer bytes


def test_devio_fetch_order_and_types():
    """fetch() returns np arrays in argument order, passing host arrays
    through and pulling device arrays in one device_get."""
    import jax.numpy as jnp
    import numpy as np

    from hyperdb_tpu.utils.devio import fetch

    a = np.arange(6).reshape(2, 3)
    b = jnp.ones((3,), dtype=jnp.float32)
    out_a, out_b = fetch(a, b)
    assert isinstance(out_a, np.ndarray) and isinstance(out_b, np.ndarray)
    np.testing.assert_array_equal(out_a, a)
    np.testing.assert_array_equal(out_b, np.ones(3, dtype=np.float32))
