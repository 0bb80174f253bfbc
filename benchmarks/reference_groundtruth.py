"""Ground-truth the reference's key+metadata filter arity (VERDICT r2 #2b).

The one reference test that failed against the compat package
(/root/reference/tests/test_hyperdb.py:470-480, ``test_query_with_filters``)
unpacks each result as a 2-tuple (``for r, _ in filtered_results``), while
the reference's own result assembly returns 3-tuples on that path
(hyperdb.py:1546-1575) and 15 other tests unpack 3-tuples
(test_hyperdb.py:492-573). Both can only hold if the result is EMPTY.

This script answers the question with the reference's OWN code, not a
desk-check: it imports /root/reference/hyperdb/hyperdb.py verbatim with its
unavailable native deps stubbed (annoy, onnxruntime, pympler,
fast_sentence_transformers, cachetools, BertTokenizerFast — none of which
participate in the behavior under test: the metadata index is pure Python),
reproduces the test's exact fixture, and prints what the reference returns.

Expected finding (and the recorded ground truth): the reference's
precomputed-vectors constructor branch never populates ``_metadata_index``
(hyperdb.py:127-135 — no ``_store_metadata`` call), so the metadata filter
matches nothing, the query returns ``[]``, and the 2-tuple test passes
vacuously. The compat package therefore reproduces the quirk
(hyperdb/hyperdb.py: ``_index_constructor_metadata = False``) while
``hyperdb_tpu.HyperDB`` keeps the conscious fix.

Run: python benchmarks/reference_groundtruth.py   (pure host, no TPU)
"""

from __future__ import annotations

import copy
import json
import sys
import types

import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


def install_stubs() -> None:
    """Register import-time stand-ins for the reference's unavailable deps.

    Each stub is behavior-preserving for the scenario under test; the Annoy
    stub is a real exact-search index (stronger than Annoy — recall 1.0) so
    the ANN path runs rather than being skipped.
    """
    # onnxruntime: only set_default_logger_severity at import + an
    # isinstance check against InferenceSession (never true here)
    ort = types.ModuleType("onnxruntime")
    ort.set_default_logger_severity = lambda *_: None

    class _NeverSession:  # isinstance target only
        pass

    ort.InferenceSession = _NeverSession
    sys.modules["onnxruntime"] = ort

    # cachetools: the repo's LRU shim has the same surface
    from hyperdb_tpu.utils.lru import LRUCache

    cachetools = types.ModuleType("cachetools")
    cachetools.LRUCache = LRUCache
    sys.modules["cachetools"] = cachetools

    # pympler.asizeof: cache introspection only — not under test
    pympler = types.ModuleType("pympler")
    asizeof_mod = types.ModuleType("pympler.asizeof")
    asizeof_mod.asizeof = lambda obj: 0
    pympler.asizeof = asizeof_mod
    sys.modules["pympler"] = pympler
    sys.modules["pympler.asizeof"] = asizeof_mod

    # Tokenizer: whitespace word-split with torch tensors — the scenario's
    # texts are all << 510 tokens so chunk boundaries don't matter
    import torch

    class _StubTokenizer:
        def __call__(self, texts, **_kw):
            ids = [list(range(1, len(t.split()) + 1)) for t in texts]
            width = max(len(i) for i in ids)
            mat = [i + [0] * (width - len(i)) for i in ids]
            return {
                "input_ids": torch.tensor(mat),
                "attention_mask": torch.tensor(
                    [[1] * len(i) + [0] * (width - len(i)) for i in ids]
                ),
            }

        def decode(self, token_ids, **_kw):
            return " ".join(f"tok{int(t)}" for t in token_ids if int(t) != 0)

    class _StubBertTokenizerFast:
        @staticmethod
        def from_pretrained(*_a, **_k):
            return _StubTokenizer()

    transformers = types.ModuleType("transformers")
    transformers.BertTokenizerFast = _StubBertTokenizerFast
    sys.modules["transformers"] = transformers

    # Embedding model: deterministic hash features, (len(texts), 384)
    class _StubSentenceTransformer:
        def __init__(self, *_a, **_k):
            pass

        def encode(self, texts):
            out = np.zeros((len(texts), 384), dtype=np.float32)
            for i, t in enumerate(texts):
                for w in str(t).lower().split():
                    out[i, hash(w) % 384] += 1.0
            return out

    fst = types.ModuleType("fast_sentence_transformers")
    fst.FastSentenceTransformer = _StubSentenceTransformer
    sys.modules["fast_sentence_transformers"] = fst

    # Annoy: exact euclidean search (the reference normalizes vectors and
    # builds a euclidean index for cosine — hyperdb.py:205-209)
    class _StubAnnoyIndex:
        def __init__(self, dim, metric):
            self.dim, self.metric, self.items = dim, metric, []

        def add_item(self, i, v):
            assert i == len(self.items)
            self.items.append(np.asarray(v, dtype=np.float64))

        def build(self, n_trees):
            self._mat = np.stack(self.items) if self.items else None

        def get_nns_by_vector(self, v, n, include_distances=False):
            d = np.linalg.norm(self._mat - np.asarray(v, dtype=np.float64), axis=1)
            order = np.argsort(d, kind="stable")[:n]
            if include_distances:
                return list(map(int, order)), [float(x) for x in d[order]]
            return list(map(int, order))

        def save(self, path):
            pass

        def load(self, path, prefault=False):
            raise IOError("stub index has no file format")

        def get_n_items(self):
            return len(self.items)

    annoy = types.ModuleType("annoy")
    annoy.AnnoyIndex = _StubAnnoyIndex
    sys.modules["annoy"] = annoy


def main() -> int:
    install_stubs()
    sys.path.insert(0, REFERENCE)
    # make sure the REFERENCE package wins over the repo's compat package
    for mod in [m for m in sys.modules if m == "hyperdb" or m.startswith("hyperdb.")]:
        del sys.modules[mod]
    from hyperdb import HyperDB  # the REAL reference class

    assert "reference" in sys.modules["hyperdb"].__file__, sys.modules["hyperdb"].__file__

    sample_docs = [
        {"name": "Abra", "hp": 160, "info": {"id": 63, "type": "psychic", "weakness": "dark",
         "description": "Sleeps 18 hours a day."}},
        {"name": "Aerodactyl", "hp": 270, "info": {"id": 142, "type": "flying", "weakness": "water",
         "description": "Flew in ancient skies."}},
        {"name": "Alakazam", "hp": 220, "info": {"id": 65, "type": "psychic", "weakness": "dark",
         "description": "Its brain can outperform a supercomputer."}},
        {"name": "Arbok", "hp": 230, "info": {"id": 24, "type": "poison", "weakness": "psychic",
         "description": "Ferocious warning markings on its belly."}},
        {"name": "Arcanine", "hp": 290, "info": {"id": 59, "type": "fire", "weakness": "water",
         "description": "A legendary Chinese Pokemon."}},
    ]
    sample_vectors = np.array([np.full(384, k) for k in range(1, 6)])

    # test_hyperdb.py:25-31 fixture, verbatim semantics
    db = HyperDB(
        documents=copy.deepcopy(sample_docs),
        vectors=copy.deepcopy(sample_vectors),
        metadata_keys=["info.type"],
    )
    db._build_ann_index()

    finding = {
        "metadata_index_after_precomputed_constructor": dict(db._metadata_index),
        "metadata_index_is_empty": len(db._metadata_index) == 0,
    }

    # test_hyperdb.py:471-476 scenario, verbatim
    filters = [("key", "name"), ("metadata", {"info.type": "psychic"})]
    results = db.query("Abra", filters=filters)
    finding["query_result"] = [
        (type(r).__name__, len(r) if isinstance(r, tuple) else None) for r in results
    ]
    finding["query_result_is_empty"] = len(results) == 0
    try:
        ok = all(r["info"]["type"] == "psychic" for r, _ in results)
        finding["two_tuple_unpack"] = f"passes (vacuously={len(results) == 0})"
        del ok
    except ValueError as e:
        finding["two_tuple_unpack"] = f"raises ValueError: {e}"

    # Contrast: after an add() (which DOES store metadata, hyperdb.py:626),
    # the same filter matches the added doc — proving the constructor
    # branch, not the filter, is what leaves the index empty.
    db2 = HyperDB(metadata_keys=["info.type"])
    db2.add([{"name": "Mewtwo", "info": {"type": "psychic"}}])
    finding["metadata_index_after_add_path"] = dict(db2._metadata_index)

    print(json.dumps(finding, indent=2, default=str))
    verdict = (
        "GROUND TRUTH: the reference query returns [] because the "
        "precomputed-vectors constructor never populates _metadata_index; "
        "test_query_with_filters passes vacuously."
        if finding["query_result_is_empty"] and finding["metadata_index_is_empty"]
        else "UNEXPECTED: reference returned non-empty results — re-examine."
    )
    print(verdict)
    return 0 if finding["query_result_is_empty"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
