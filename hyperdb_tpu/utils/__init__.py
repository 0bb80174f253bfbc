"""Host-side utilities: LRU cache, deep sizeof, logging, timers."""

from hyperdb_tpu.utils.lru import LRUCache
from hyperdb_tpu.utils.sizeof import deep_sizeof
from hyperdb_tpu.utils.log import info, warn

__all__ = ["LRUCache", "deep_sizeof", "info", "warn"]
