"""ctypes bindings for the C++ word tokenizer (see tokenizer.cc).

Plays the role the HF Rust ``tokenizers`` crate plays for the reference
(/root/reference/hyperdb/hyperdb.py:18,248): fast host-side tokenization for
chunking and filters. Falls back to None when the shared library has not
been built; callers then use the pure-Python WordTokenizer.
"""

from __future__ import annotations

import ctypes
import os

_LIB_NAME = "libhyperdb_host.so"


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), _LIB_NAME)


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.hdb_tokenize_words.restype = ctypes.c_void_p
    lib.hdb_tokenize_words.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.hdb_free.restype = None
    lib.hdb_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeWordTokenizer:
    """Whitespace word tokenizer backed by C++; same semantics as
    hyperdb_tpu.core.chunker.WordTokenizer."""

    def __init__(self, lib):
        self._lib = lib

    @classmethod
    def maybe_load(cls):
        lib = _load()
        return cls(lib) if lib is not None else None

    def encode(self, text: str) -> list[str]:
        raw = text.encode("utf-8")
        n = ctypes.c_size_t(0)
        ptr = self._lib.hdb_tokenize_words(raw, len(raw), ctypes.byref(n))
        if not ptr:
            return []
        try:
            # The library returns one '\n'-joined buffer of tokens.
            buf = ctypes.string_at(ptr, n.value)
        finally:
            self._lib.hdb_free(ptr)
        if not buf:
            return []
        return buf.decode("utf-8").split("\n")

    def decode(self, tokens: list[str]) -> str:
        return " ".join(tokens)
