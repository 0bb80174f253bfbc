"""Embedding engines.

The reference embeds with MiniLM-L6-v2 via onnxruntime behind an injectable
``embedding_function`` boundary (/root/reference/hyperdb/hyperdb.py:82,
237-248,311-337). We keep the same boundary and provide two engines:

- :class:`HashEmbedder` — a deterministic, dependency-free feature-hashing
  encoder (word + character n-gram hashing with signed buckets, L2
  normalized). It is the hermetic default in this image, where model weights
  cannot be downloaded; it gives meaningful lexical similarity for demos and
  keeps every test offline.
- :class:`hyperdb_tpu.models.minilm.MiniLMEmbedder` — the real
  MiniLM-L6-v2 architecture in Flax, jitted on TPU, loading HF weights when
  present locally (deterministic random init otherwise).

``make_embedding_function`` wires either engine to the chunker to produce
the reference-shaped triple ``(embeddings, source_indices, split_info)``.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Callable, Protocol

import numpy as np

from hyperdb_tpu.core import chunker as _chunker

_TOKEN_RE = re.compile(r"\b\w+\b")


class Embedder(Protocol):
    dim: int

    def encode(self, texts: list[str]) -> np.ndarray:
        """(len(texts), dim) float32 embeddings."""
        ...


class HashEmbedder:
    """Deterministic signed feature hashing over words and char n-grams.

    Words capture topical overlap; character 3-5-grams give robustness to
    inflection ("sleep" vs "sleeps"). Buckets are crc32-based so embeddings
    are stable across processes and platforms.
    """

    def __init__(self, dim: int = 384, ngram_range: tuple[int, int] = (3, 5),
                 sublinear_tf: bool = False):
        self.dim = int(dim)
        self._ngram_range = ngram_range
        # sqrt term-frequency damping: long natural texts repeat function
        # words ("the", "of") whose raw counts drown topical words; sqrt(tf)
        # keeps lexical overlap while flattening that head (measured on the
        # OOD docstring eval, benchmarks/eval_hybrid.py)
        self.sublinear_tf = bool(sublinear_tf)
        # word -> accumulated (dim,) contribution. Natural text repeats a
        # small vocabulary, so memoizing per *word* (which covers all its
        # n-grams) makes ingest throughput vocabulary-bound, not token-bound.
        self._word_cache: dict[str, np.ndarray] = {}

    def _word_vector(self, tok: str) -> np.ndarray:
        vec = self._word_cache.get(tok)
        if vec is not None:
            return vec
        feats = ["w:" + tok]
        padded = f"^{tok}$"
        lo, hi = self._ngram_range
        for n in range(lo, hi + 1):
            if len(padded) < n:
                continue
            for i in range(len(padded) - n + 1):
                feats.append("g:" + padded[i : i + n])
        vec = np.zeros(self.dim, dtype=np.float32)
        for feat in feats:
            h = zlib.crc32(feat.encode("utf-8"))
            sign = 1.0 if (h >> 31) & 1 else -1.0
            vec[h % self.dim] += sign
        if len(self._word_cache) < 2_000_000:  # bound memory
            self._word_cache[tok] = vec
        return vec

    def encode_one(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float32)
        toks = _TOKEN_RE.findall(text.lower())
        if self.sublinear_tf:
            import collections

            for tok, count in collections.Counter(toks).items():
                vec += np.float32(np.sqrt(count)) * self._word_vector(tok)
        else:
            for tok in toks:
                vec += self._word_vector(tok)
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec = vec / norm
        return vec

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self.encode_one(t) for t in texts])


class HybridEmbedder:
    """Concatenation of a unit dense embedding and a unit lexical hash
    embedding with mixing weight ``w`` — cosine over the concat equals
    ``w * s_dense + (1-w) * s_lexical``.

    Shipped because the OOD eval (benchmarks/eval_ood.py) shows the
    trained dense encoder and the lexical encoder win DIFFERENT regimes:
    with the round-4 retrained checkpoint, dense 0.995 / lexical 0.005
    recall@10 on the in-distribution concept benchmark, dense 0.368 /
    lexical(4096, sublinear-tf) 0.560 on held-out 800-doc stdlib
    docstring retrieval. No fusion dominates both (linear sweep +
    reciprocal-rank fusion measured in benchmarks/eval_hybrid.py on a
    validation slice DISJOINT from the reported eval; results.jsonl
    hybrid_encoder_sweep), so the mix is a knob:
    HYPERDB_DEFAULT_EMBEDDER=hybrid, HYPERDB_HYBRID_W (default 0.70 since
    round 5's lexically-distilled encoder — concept-hard 0.965 / OOD-val
    0.641, the best point holding the in-dist >= 0.95 bar; round 4's
    w=0.65 point was 0.98 / 0.60).
    """

    def __init__(self, dense, w: float = 0.70, hash_dim: int = 4096):
        self.dense = dense
        self.w = float(w)
        self.lexical = HashEmbedder(dim=hash_dim, sublinear_tf=True)
        self.dim = int(getattr(dense, "dim", 384)) + hash_dim
        # the chunk tokenizer rides along from the dense encoder (C3)
        chunk_tok = getattr(dense, "chunk_tokenizer", None)
        if chunk_tok is not None:
            self.chunk_tokenizer = chunk_tok

    @staticmethod
    def _unit(x: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(x, axis=1, keepdims=True)
        return x / np.maximum(n, 1e-12)

    def encode(self, texts: list[str]) -> np.ndarray:
        d = self._unit(np.asarray(self.dense.encode(texts), dtype=np.float32))
        h = self._unit(np.asarray(self.lexical.encode(texts), dtype=np.float32))
        return np.concatenate(
            [np.sqrt(self.w) * d, np.sqrt(1.0 - self.w) * h], axis=1
        )


def corpus_self_eval_set(texts, max_docs: int = 400, seed: int = 0):
    """Split-half retrieval eval set built from the USER'S OWN corpus:
    each sampled text splits into two disjoint word halves — given the
    first half, retrieve the second among every other text's second half.
    This measures an encoder on the corpus it will actually serve, with no
    dependence on the encoder's training distribution (the round-3 lesson:
    in-distribution benchmarks flattered the trained encoder 4x vs its
    unseen-text reality). Returns (docs, queries, targets) in the
    localdata.evaluate_retrieval shape."""
    import numpy as np

    rng = np.random.default_rng(seed)
    usable = [t for t in (str(t) for t in texts) if len(t.split()) >= 12]
    if len(usable) > max_docs:
        idx = rng.choice(len(usable), size=max_docs, replace=False)
        usable = [usable[i] for i in sorted(idx)]
    docs, queries = [], []
    for t in usable:
        words = t.split()
        half = len(words) // 2
        queries.append(" ".join(words[:half]))
        docs.append(" ".join(words[half:]))
    return docs, queries, list(range(len(docs)))


def select_embedder_for_corpus(texts, max_docs: int = 400, seed: int = 0):
    """Measure the candidate default encoders on :func:`corpus_self_eval_set`
    over the user's corpus and return ``(best_name, embedder, report)`` —
    the build-time MEASURED answer to "which encoder should this corpus
    use" (VERDICT r3 #3). Candidates: the trained local dense encoder, the
    default-w hybrid, and the 384/4096-dim lexical hash encoders; ranked by
    recall@10 then MRR. Exposed on the CLI as
    ``python -m hyperdb_tpu selectembed``."""
    from hyperdb_tpu.models.localdata import evaluate_retrieval

    eval_set = corpus_self_eval_set(texts, max_docs=max_docs, seed=seed)
    if len(eval_set[0]) < 20:
        raise ValueError(
            f"corpus sample too small for a meaningful self-eval "
            f"({len(eval_set[0])} usable texts; need >= 20 with >= 12 words)"
        )
    candidates: dict[str, Embedder] = {
        "hash_384": HashEmbedder(dim=384),
        "lexical_4096": HashEmbedder(dim=4096, sublinear_tf=True),
    }
    try:
        from hyperdb_tpu.models.minilm import MiniLMEmbedder

        dense = MiniLMEmbedder.from_local_assets()
    except Exception:
        dense = None
    if dense is not None:
        candidates["trained_local"] = dense
        candidates["hybrid_w70"] = HybridEmbedder(dense, w=0.70)
    report = {}
    for name, emb in candidates.items():
        m = evaluate_retrieval(emb.encode, eval_set=eval_set)
        report[name] = {k: round(v, 4) for k, v in m.items()}
    best = max(report, key=lambda k: (report[k]["recall@10"],
                                      report[k]["mrr"]))
    return best, candidates[best], report


def default_embedder(dim: int | None = None) -> Embedder:
    """Best semantic encoder available, in order: HF-pretrained MiniLM (when
    its cache exists locally — the reference's actual product), the HYBRID
    of the in-repo trained encoder and the lexical hash encoder (the
    zero-egress default since round 4), then the hermetic hash encoder.

    Why hybrid is the zero-egress default (VERDICT r3 #3 / Missing #1): by
    the repo's own measurements the pure trained-local dense encoder loses
    to a lexical hash on UNSEEN text (held-out 800-doc stdlib docstrings:
    dense 0.368 recall@10 vs lexical-4096 0.560 for the round-4
    checkpoint; the round-5 LEXICALLY-DISTILLED encoder — trained so its
    natural-prose similarities agree with the lexical channel it ships
    beside, models/train.info_nce_distill_loss — closes most of the
    remaining gap) while winning in-distribution. The default w=0.70
    hybrid is the measured best point holding in-dist >= 0.95:
    concept-hard 0.965 / OOD-val 0.641 (round 4's w=0.65: 0.98 / 0.60)
    on the disjoint validation slice — strictly better than dense on
    unseen text at a small in-dist cost, so it is the
    defensible default for arbitrary user corpora. Cost: embedding dim is
    384+4096 (the lexical block); set HYPERDB_DEFAULT_EMBEDDER=local for
    the compact pure-dense encoder when the corpus matches its training
    distribution, or run ``python -m hyperdb_tpu selectembed`` to MEASURE
    the right encoder on a sample of your own corpus.

    ``dim`` semantics: None means "a NEW corpus — pick the best encoder"
    (the hybrid, dim 4480). A given ``dim`` means "an EXISTING corpus of
    this dimensionality needs its text queries embedded" — the returned
    encoder PRODUCES that dim (a migrated 384-d reference corpus keeps
    getting 384-d query vectors: the dense local encoder, not the hybrid).

    Override with HYPERDB_DEFAULT_EMBEDDER=auto|hash|local|hf|hybrid|lexical
    (lexical = the 4096-dim sqrt-tf hash, the OOD eval's strongest cheap
    encoder); HYPERDB_HYBRID_W tunes the hybrid mix.

    Process-wide singleton mirrors the reference's module-level
    EMBEDDING_MODEL (hyperdb.py:24-25,241-248) — but with an init lock (the
    reference's check-then-set is racy under threads, SURVEY.md §5)."""
    import os

    with _EMBEDDER_LOCK:
        cached = _DEFAULT_EMBEDDERS.get(dim)
        if cached is not None:
            return cached
        mode = os.environ.get("HYPERDB_DEFAULT_EMBEDDER", "auto")
        hybrid_dim = 384 + 4096
        embedder: Embedder | None = None
        if embedder is None and mode in ("auto", "hf"):
            try:
                from hyperdb_tpu.models.minilm import MiniLMEmbedder

                embedder = MiniLMEmbedder.maybe_pretrained(dim=dim or 384)
            except Exception:
                embedder = None
        if (embedder is None and mode in ("auto", "hybrid")
                and dim in (None, hybrid_dim)):
            try:
                from hyperdb_tpu.models.minilm import MiniLMEmbedder

                dense = MiniLMEmbedder.from_local_assets()
            except Exception:
                dense = None
            if dense is not None:
                embedder = HybridEmbedder(
                    dense,
                    w=float(os.environ.get("HYPERDB_HYBRID_W", "0.70")),
                )
            # assets unavailable: fall through to the hash encoder below
        if (embedder is None and mode in ("auto", "local")
                and dim in (None, 384)):
            # auto reaches here for EXISTING 384-d corpora (hybrid would
            # change the query dim); mode=local selects it outright
            try:
                from hyperdb_tpu.models.minilm import MiniLMEmbedder

                embedder = MiniLMEmbedder.from_local_assets()
            except Exception:
                embedder = None
        if embedder is None and mode == "lexical":
            # the selectembed report's lexical_4096 candidate (sqrt-tf):
            # 0.630 recall@10 on the held-out stdlib OOD eval
            embedder = HashEmbedder(dim=4096, sublinear_tf=True)
        if embedder is None:
            embedder = HashEmbedder(dim=dim or 384)
        _DEFAULT_EMBEDDERS[dim] = embedder
        return embedder


import threading as _threading  # noqa: E402

_EMBEDDER_LOCK = _threading.Lock()
# one cached embedder per requested dim: alternating dims must not thrash
# the (expensively jitted) MiniLM rebuild — reference parity is a single
# module-global model, but the reference also supports exactly one dim
_DEFAULT_EMBEDDERS: dict[int, Embedder] = {}


def make_embedding_function(
    embedder: Embedder,
    tokenizer: _chunker.Tokenizer,
    fp_dtype: np.dtype = np.float32,
) -> Callable[[Any], tuple[np.ndarray, list[int], dict[int, int]]]:
    """Build the reference-shaped embedding function
    (hyperdb.py:311-337): documents -> (embeddings, source_indices, split_info).
    """

    def embedding_function(documents):
        if documents is None:
            raise ValueError("Documents cannot be None.")
        texts, source_indices, split_info = _chunker.prepare_texts_and_indices(
            documents, tokenizer
        )
        embeddings = np.asarray(embedder.encode(texts), dtype=fp_dtype)
        return embeddings, source_indices, split_info

    # expose the pipeline pieces so the serving text hot path can keep the
    # encoder output on device (query.engine.generate_query_vectors_batch_device)
    embedding_function.embedder = embedder
    embedding_function.tokenizer = tokenizer
    return embedding_function
