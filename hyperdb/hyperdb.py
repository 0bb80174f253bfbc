"""Reference-shaped compat module (mirror of /root/reference/hyperdb/hyperdb.py).

Reference user code imports from this exact module path
(``from hyperdb.hyperdb import HyperDB``) and relies on its module-level
surface — ``from hyperdb import *`` re-exports everything public here
(reference __init__.py:1). This module reproduces that surface over the
TPU-native engine:

- ``HyperDB``: the engine, with reference quirk semantics (see below)
- ``MAX_LENGTH`` (= 510, reference hyperdb.py:26)
- ``NESTED_PATTERN`` (reference hyperdb.py:27)
- ``EMBEDDING_MODEL`` / ``tokenizer`` module globals (reference
  hyperdb.py:24-25 — lazy-initialized there; here the engine owns its
  encoder singleton, so these stay None unless user code assigns them)
- ``ranking``: the ``hyperdb.ranking_algorithm`` module alias
  (reference hyperdb.py:13)

Bug-for-bug quirk: the reference's precomputed-vectors constructor branch
never populates the metadata index (hyperdb.py:127-135), so metadata
filters over such corpora return nothing — and the reference's own test
suite depends on exactly that (test_hyperdb.py:470-480 unpacks 2-tuples,
which only works on an empty result; ground-truthed by
benchmarks/reference_groundtruth.py). This compat class reproduces the
quirk; ``hyperdb_tpu.HyperDB`` keeps the conscious fix.
"""

from __future__ import annotations

import re

import hyperdb.ranking_algorithm as ranking  # noqa: F401 — reference alias
from hyperdb_tpu import HyperDB as _TPUHyperDB

EMBEDDING_MODEL = None
tokenizer = None
MAX_LENGTH = 510  # 512 - 2 special tokens, reference hyperdb.py:26
NESTED_PATTERN = re.compile(r"[\[\].]")


class HyperDB(_TPUHyperDB):
    """Drop-in reference ``HyperDB`` (bug-for-bug constructor metadata quirk)."""

    _index_constructor_metadata = False


__all__ = [
    "HyperDB",
    "EMBEDDING_MODEL",
    "tokenizer",
    "MAX_LENGTH",
    "NESTED_PATTERN",
    "ranking",
]
