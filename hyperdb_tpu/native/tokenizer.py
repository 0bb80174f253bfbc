"""ctypes bindings for the C++ host library (see tokenizer.cc).

Plays the role the HF Rust ``tokenizers`` crate and NumPy C loops play for
the reference (/root/reference/hyperdb/hyperdb.py:18,248, SURVEY.md §2.3):
fast host-side tokenization for chunking and for the sentence filter, plus
an exact top-k merge for multi-host result aggregation. Every entry point
has a pure-Python fallback, so the package works before `make` runs; the
library is also built on demand when a compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_NAME = "libhyperdb_host.so"
_DIR = os.path.dirname(__file__)


def _lib_path() -> str:
    return os.path.join(_DIR, _LIB_NAME)


def build(force: bool = False) -> bool:
    """Compile the shared library in place. Returns True on success."""
    if not force and os.path.exists(_lib_path()):
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_lib_path())
    except Exception:
        return False


_lib = None
_load_attempted = False


def _load():
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    path = _lib_path()
    if not os.path.exists(path) and not build():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    for fn in ("hdb_tokenize_words", "hdb_tokenize_filter"):
        getattr(lib, fn).restype = ctypes.c_void_p
        getattr(lib, fn).argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
    lib.hdb_wordpiece_load.restype = ctypes.c_void_p
    lib.hdb_wordpiece_load.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int32,
    ]
    lib.hdb_wordpiece_free.restype = None
    lib.hdb_wordpiece_free.argtypes = [ctypes.c_void_p]
    lib.hdb_wordpiece_encode.restype = ctypes.c_int64
    lib.hdb_wordpiece_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.hdb_merge_topk.restype = None
    lib.hdb_merge_topk.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_size_t,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hdb_free.restype = None
    lib.hdb_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _call_tokenize(lib, fn_name: str, text: str) -> list[str]:
    raw = text.encode("utf-8")
    n = ctypes.c_size_t(0)
    ptr = getattr(lib, fn_name)(raw, len(raw), ctypes.byref(n))
    if not ptr:
        return []
    try:
        buf = ctypes.string_at(ptr, n.value)
    finally:
        lib.hdb_free(ptr)
    if not buf:
        return []
    return buf.decode("utf-8").split("\n")


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
        if not text.isascii():
            # byte-level splitting cannot see Unicode whitespace (NBSP etc.);
            # keep exact parity with the Python WordTokenizer's \S+ split
            from hyperdb_tpu.core.chunker import _WORD_RE

            return _WORD_RE.findall(text)
        return _call_tokenize(self._lib, "hdb_tokenize_words", text)

    def decode(self, tokens: list[str]) -> str:
        return " ".join(tokens)


def native_filter_tokenize(text: str):
    """Sentence-filter tokenization (lowercase word set, punctuation
    stripped) via C++; returns None when the library is unavailable.

    The C++ path is ASCII-only: byte-level lowercasing cannot reproduce
    Python's Unicode-aware ``str.lower()`` / ``\\w`` semantics ('CAFÉ' must
    tokenize as {'café'}), so any non-ASCII input falls back to the Python
    tokenizer (parity pinned in tests/test_native.py)."""
    if not text.isascii():
        return None
    lib = _load()
    if lib is None:
        return None
    return set(_call_tokenize(lib, "hdb_tokenize_filter", text))


class NativeWordPiece:
    """C++ greedy WordPiece encoder over a fixed vocab (the in-repo
    replacement for the HF Rust tokenizers dependency, SURVEY.md §2.3).

    ASCII-only by the same contract as the filter tokenizer: the caller
    (models/wordpiece.WordPieceTokenizer) routes non-ASCII text to Python.
    """

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle
        self._buf = (ctypes.c_int32 * 4096)()

    @classmethod
    def maybe_load(cls, vocab: list[str], unk_id: int):
        lib = _load()
        if lib is None:
            return None
        blob = "\n".join(vocab).encode("utf-8")
        handle = lib.hdb_wordpiece_load(blob, len(blob), unk_id)
        if not handle:
            return None
        return cls(lib, handle)

    def __del__(self):
        try:
            if self._handle:
                self._lib.hdb_wordpiece_free(self._handle)
        except Exception:
            pass

    def encode_ids(self, text: str) -> list[int] | None:
        raw = text.encode("utf-8")
        need = max(4096, len(raw) + 8)
        if need > len(self._buf):
            self._buf = (ctypes.c_int32 * need)()
        n = self._lib.hdb_wordpiece_encode(
            self._handle, raw, len(raw), self._buf, len(self._buf)
        )
        return list(self._buf[:n])


def native_merge_topk(scores: np.ndarray, ids: np.ndarray, k: int):
    """Exact merge of concatenated per-shard top-k lists; None if no lib."""
    lib = _load()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    out_scores = np.empty(k, dtype=np.float32)
    out_ids = np.empty(k, dtype=np.int64)
    lib.hdb_merge_topk(
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        scores.size,
        k,
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_scores, out_ids
