"""In-repo native (C++) host-side components.

The reference delegates its host-side hot loops to native pip dependencies
(Annoy C++, HF Rust tokenizers, onnxruntime — SURVEY.md §2.3). Here the
native pieces live in-repo as small C++ shared libraries bound via ctypes,
each with a pure-Python fallback so the package works before `make` runs.
"""
