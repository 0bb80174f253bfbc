"""MiniLM-L6-v2 sentence encoder in Flax — the TPU replacement for the
reference's onnxruntime embedding path
(/root/reference/hyperdb/hyperdb.py:19,237-248,311-337).

Architecture (sentence-transformers/all-MiniLM-L6-v2 default): BERT encoder
with hidden=384, 6 layers, 12 heads, intermediate=1536, vocab=30522, post-LN,
GELU; sentence embedding = attention-masked mean pooling + L2 normalize.
The encoder is size-configurable (:class:`EncoderConfig`): PRESETS covers
minilm-l6 (384-d), minilm-l12, and bert-base (768-d, for the 10M x 768
BASELINE config).

TPU-first details:
- the whole batch forward is one jitted program; sequence lengths are
  padded to {32, 64, 128, 256, 512} buckets and batch to power-of-two
  buckets so XLA compiles a handful of shapes, never per-input;
- matmuls run in bfloat16 with f32 accumulation (MXU-native);
- pretrained HF weights are converted from the locally cached torch
  checkpoint when available; otherwise parameters are deterministically
  initialized (seed 0) — same architecture, useful for compile checks,
  benchmarking, and fine-tuning from scratch.
"""

from __future__ import annotations

import math
import re
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

VOCAB_SIZE = 30522
HIDDEN = 384
LAYERS = 6
HEADS = 12
INTERMEDIATE = 1536
MAX_POSITIONS = 512
TYPE_VOCAB = 2
LAYER_NORM_EPS = 1e-12

SEQ_BUCKETS = (32, 64, 128, 256, 512)


import dataclasses


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    hidden: int = HIDDEN
    layers: int = LAYERS
    heads: int = HEADS
    intermediate: int = INTERMEDIATE
    vocab_size: int = VOCAB_SIZE
    max_positions: int = MAX_POSITIONS


PRESETS = {
    "minilm-l6": EncoderConfig(),
    "minilm-l12": EncoderConfig(layers=12),
    "bert-base": EncoderConfig(hidden=768, layers=12, heads=12, intermediate=3072),
    # The in-repo trained encoder (benchmarks/train_encoder.py): same 384-d
    # sentence embeddings as MiniLM-L6 but 4 layers and an 8k in-repo
    # WordPiece vocab — small enough to ship trained weights as a repo
    # artifact (models/assets/) in a zero-egress image.
    "local-384": EncoderConfig(layers=4, vocab_size=8192),
}

ASSETS_DIR = __file__.rsplit("/", 1)[0] + "/assets"


class MiniLMLayer(nn.Module):
    """One post-LN BERT encoder block."""

    dtype: Any = jnp.bfloat16
    config: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, hidden, attn_bias):
        cfg = self.config
        # --- self attention ---
        head_dim = cfg.hidden // cfg.heads
        dense = lambda name: nn.Dense(cfg.hidden, dtype=self.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], cfg.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        scores = scores + attn_bias  # (B, 1, 1, S) additive mask
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], cfg.hidden)
        attn_out = nn.Dense(cfg.hidden, dtype=self.dtype, name="attn_output")(ctx)
        hidden = nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=jnp.float32, name="attn_ln"
        )(attn_out + hidden)

        # --- FFN ---
        ff = nn.Dense(cfg.intermediate, dtype=self.dtype, name="intermediate")(hidden)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(cfg.hidden, dtype=self.dtype, name="output")(ff)
        hidden = nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=jnp.float32, name="ffn_ln"
        )(ff + hidden)
        return hidden


class MiniLM(nn.Module):
    """BERT-style encoder with masked mean pooling -> unit-norm embeddings."""

    dtype: Any = jnp.bfloat16
    config: EncoderConfig = EncoderConfig()

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        seq = input_ids.shape[1]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden, dtype=self.dtype, name="tok_emb")(
            input_ids
        )
        pos_ids = jnp.arange(seq)[None, :]
        pos = nn.Embed(
            cfg.max_positions, cfg.hidden, dtype=self.dtype, name="pos_emb"
        )(pos_ids)
        typ = nn.Embed(TYPE_VOCAB, cfg.hidden, dtype=self.dtype, name="type_emb")(
            jnp.zeros_like(input_ids)
        )
        hidden = nn.LayerNorm(
            epsilon=LAYER_NORM_EPS, dtype=jnp.float32, name="emb_ln"
        )(tok + pos + typ).astype(self.dtype)

        attn_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e9
        ).astype(jnp.float32)

        for i in range(cfg.layers):
            hidden = MiniLMLayer(
                dtype=self.dtype, config=cfg, name=f"layer_{i}"
            )(hidden, attn_bias)

        # masked mean pooling (sentence-transformers pooling mode)
        mask = attention_mask[:, :, None].astype(jnp.float32)
        hidden = hidden.astype(jnp.float32)
        summed = jnp.sum(hidden * mask, axis=1)
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
        emb = summed / counts
        norm = jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb / norm


def init_params(seed: int = 0, dtype=jnp.bfloat16, config: EncoderConfig | None = None):
    model = MiniLM(dtype=dtype, config=config or EncoderConfig())
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, 8), dtype=jnp.int32)
    params = model.init(rng, dummy, jnp.ones((1, 8), dtype=jnp.int32))
    return model, params


# --------------------------------------------------------------------------
# HF weight conversion (local cache only; no network)
# --------------------------------------------------------------------------

_HF_MODEL = "sentence-transformers/all-MiniLM-L6-v2"


def load_hf_params(dtype=jnp.bfloat16):
    """Convert the locally cached torch checkpoint to our param tree.
    Returns None when assets are unavailable (zero-egress images)."""
    import os

    # Belt and suspenders: even with local_files_only, hub helpers probe the
    # network for sibling files (adapter_config.json etc.) and burn tens of
    # seconds on DNS timeouts in zero-egress images.
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    try:
        import torch  # noqa: F401
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(_HF_MODEL, local_files_only=True)
    except Exception:
        return None
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def t(name):
        return jnp.asarray(sd[name], dtype=dtype)

    def lin(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"].T, dtype=dtype),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype=dtype)}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"], dtype=jnp.float32),
                "bias": jnp.asarray(sd[prefix + ".bias"], dtype=jnp.float32)}

    params = {
        "tok_emb": {"embedding": t("embeddings.word_embeddings.weight")},
        "pos_emb": {"embedding": t("embeddings.position_embeddings.weight")},
        "type_emb": {"embedding": t("embeddings.token_type_embeddings.weight")},
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(LAYERS):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": lin(f"{p}.attention.self.query"),
            "key": lin(f"{p}.attention.self.key"),
            "value": lin(f"{p}.attention.self.value"),
            "attn_output": lin(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "ffn_ln": ln(f"{p}.output.LayerNorm"),
        }
    return {"params": params}


# --------------------------------------------------------------------------
# Repo-artifact persistence for trained parameters (models/assets/)
# --------------------------------------------------------------------------


def save_params(params, path: str) -> None:
    """Flatten a param tree into a compressed npz (float16 leaves)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            arr = np.asarray(node)
            if arr.dtype in (np.float32, np.float64) or str(arr.dtype) == "bfloat16":
                arr = arr.astype(np.float16)
            flat[prefix] = arr

    walk("", params)
    np.savez_compressed(path, **flat)


def load_saved_params(path: str, dtype=jnp.bfloat16):
    """Inverse of :func:`save_params`; float leaves cast to ``dtype``
    (layer norms back to f32, matching the model's mixed precision)."""
    tree: dict = {}
    with np.load(path, allow_pickle=False) as f:
        for key, arr in f.items():
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            leaf = parts[-1]
            target = (
                jnp.float32
                if leaf == "scale"
                or (len(parts) > 1 and parts[-2].endswith("_ln"))
                else dtype
            )
            node[leaf] = jnp.asarray(arr, dtype=target)
    return tree


# --------------------------------------------------------------------------
# Hermetic tokenizer: words -> stable ids in the BERT id space
# --------------------------------------------------------------------------

_CLS, _SEP, _PAD = 101, 102, 0
_WORD_RE = re.compile(r"\b\w+\b")


class HashingTokenizer:
    """Deterministic word -> id hashing into the BERT vocab range.

    Used when the real WordPiece vocab is unavailable: preserves lexical
    identity (same word -> same id), which is what the encoder needs to
    produce meaningful lexical similarity when running with random or
    fine-tuned-from-scratch weights.
    """

    def encode(self, text: str, max_len: int) -> tuple[list[int], list[int]]:
        import zlib

        words = _WORD_RE.findall(text.lower())[: max_len - 2]
        ids = [_CLS] + [
            1000 + (zlib.crc32(w.encode()) % (VOCAB_SIZE - 2000)) for w in words
        ] + [_SEP]
        mask = [1] * len(ids)
        return ids, mask


class MiniLMEmbedder:
    """Batched TPU sentence encoder with bucketed shapes."""

    def __init__(
        self,
        params=None,
        dtype=jnp.bfloat16,
        tokenizer=None,
        dim=HIDDEN,
        config: EncoderConfig | None = None,
        max_seq: int | None = None,
    ):
        if config is None:
            # pick the preset matching the requested embedding dimension
            config = next(
                (c for c in PRESETS.values() if c.hidden == dim), EncoderConfig()
            )
        self.config = config
        self.dim = config.hidden
        # Inference truncation window (opt-in, manifest "inference_seq").
        # Capping at the trained seq length was MEASURED on the round-3
        # seq-64 encoder and does NOT help (OOD recall@10 0.151 truncated
        # vs 0.166 full — mean pooling dilutes the untrained-position
        # noise, results.jsonl ood_encoder_eval 2026-08-18), so nothing
        # sets this implicitly; it exists for encoders whose manifest
        # records a measured win.
        self.max_seq = min(max_seq or config.max_positions,
                           config.max_positions)
        self.model = MiniLM(dtype=dtype, config=config)
        if params is None:
            _, params = init_params(seed=0, dtype=dtype, config=config)
        self.params = params
        self._tokenizer = tokenizer or HashingTokenizer()
        self._apply = jax.jit(self.model.apply)
        # lazily-built f32-epilogue forward for encode_device (the cast
        # rides the same program; a separate eager astype would be its own
        # per-shape compile on this platform)
        self._apply_f32 = None

    @classmethod
    def from_local_assets(cls, assets_dir: str | None = None):
        """The in-repo trained encoder: WordPiece vocab + trained weights
        shipped as repo artifacts (built by benchmarks/train_encoder.py).
        Returns None when the artifacts are absent."""
        import json
        import os

        from hyperdb_tpu.models.wordpiece import WordPieceTokenizer

        assets = assets_dir or ASSETS_DIR
        vocab_path = os.path.join(assets, "vocab.txt")
        params_path = os.path.join(assets, "encoder_local.npz")
        manifest_path = os.path.join(assets, "manifest.json")
        if not (os.path.exists(vocab_path) and os.path.exists(params_path)):
            return None
        config = PRESETS["local-384"]
        trained_seq = None
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            config = EncoderConfig(**manifest.get("config", {}))
            trained_seq = manifest.get("inference_seq")
        tokenizer = WordPieceTokenizer.load(vocab_path)
        params = load_saved_params(params_path)
        emb = cls(params=params, tokenizer=tokenizer, config=config,
                  max_seq=trained_seq)
        emb.chunk_tokenizer = tokenizer  # WordPiece chunking (C3 upgrade)
        return emb

    @classmethod
    def maybe_pretrained(cls, dim: int = HIDDEN):
        """Only returns an embedder when real pretrained weights exist
        locally; None otherwise (callers fall back to the hash encoder)."""
        if dim != HIDDEN:
            return None
        params = load_hf_params()
        if params is None:
            return None
        tok = None
        try:
            from transformers import AutoTokenizer

            hf_tok = AutoTokenizer.from_pretrained(_HF_MODEL, local_files_only=True)

            class _HFTok:
                def encode(self, text, max_len):
                    out = hf_tok(text, truncation=True, max_length=max_len)
                    return out["input_ids"], out["attention_mask"]

            tok = _HFTok()
        except Exception:
            tok = None
        if tok is None:
            # Pretrained WordPiece weights paired with the CRC32 hashing
            # tokenizer would index the embedding table at unrelated
            # positions — meaningless embeddings with no warning. A partial
            # HF cache (weights without tokenizer files) falls back whole.
            return None
        return cls(params=params, tokenizer=tok)

    @staticmethod
    def _bucket(n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    # Largest single-dispatch batch: bigger inputs loop over slices so the
    # jitted program shapes stay within a small reusable set (an unbounded
    # next-pow2 batch compiled a fresh one-off program per corpus size —
    # 60-90 s of remote compile for a 10k-doc add on this platform).
    _MAX_BATCH = 512

    def _prep_batch(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize one <=_MAX_BATCH slice into bucketed host ``(ids, mask)``
        int32 arrays; the batch dim is padded to the next power of two."""
        encoded = [self._tokenizer.encode(t, self.max_seq) for t in texts]
        max_len = max(len(ids) for ids, _ in encoded)
        seq = self._bucket(max_len, SEQ_BUCKETS)
        batch = 1 << (len(encoded) - 1).bit_length()

        pad_id = getattr(self._tokenizer, "pad_id", _PAD)
        cls_id = getattr(self._tokenizer, "cls_id", _CLS)
        ids = np.full((batch, seq), pad_id, dtype=np.int32)
        mask = np.zeros((batch, seq), dtype=np.int32)
        for i, (tok_ids, tok_mask) in enumerate(encoded):
            tok_ids = tok_ids[:seq]
            tok_mask = tok_mask[:seq]
            ids[i, : len(tok_ids)] = tok_ids
            mask[i, : len(tok_mask)] = tok_mask
        # fully padded rows would mean-pool over nothing; give them one live
        # CLS token so the kernel stays NaN-free
        empty = mask.sum(axis=1) == 0
        ids[empty, 0] = cls_id
        mask[empty, 0] = 1
        return ids, mask

    def encode(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        if len(texts) > self._MAX_BATCH:
            parts = [
                self.encode(texts[i : i + self._MAX_BATCH])
                for i in range(0, len(texts), self._MAX_BATCH)
            ]
            return np.concatenate(parts, axis=0)
        ids, mask = self._prep_batch(texts)
        emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(emb[: len(texts)], dtype=np.float32)

    def encode_device(self, texts: list[str]):
        """Device-resident twin of :meth:`encode` for the serving text hot
        path: the embeddings never visit the host, so the query scan chains
        on them device-side and the flush pays ONE tunnel round trip instead
        of two (encoder readback + query upload — each ~25 ms on this
        platform, benchmarks/probe_readback.py).

        Returns a committed ``(b_pad, dim)`` float32 ``jax.Array`` with
        ``b_pad`` = next power of two >= ``len(texts)``; rows past
        ``len(texts)`` are finite padding (bare-CLS embeddings) that callers
        slice off the RESULTS — never reshape the block itself, every
        distinct shape is a fresh 30-90 s remote compile. Program shapes
        stay within the same bounded set as :meth:`encode`: one
        f32-epilogue forward per power-of-two slice, plus one concatenate
        keyed only on the part count for blocks past ``_MAX_BATCH``."""
        if not texts:
            return None
        if self._apply_f32 is None:
            model_apply = self.model.apply
            self._apply_f32 = jax.jit(
                lambda p, i, m: model_apply(p, i, m).astype(jnp.float32)
            )
        n = len(texts)
        if n <= self._MAX_BATCH:
            ids, mask = self._prep_batch(list(texts))
            return self._apply_f32(self.params, jnp.asarray(ids), jnp.asarray(mask))
        b_out = 1 << (n - 1).bit_length()
        parts = []
        for i in range(0, b_out, self._MAX_BATCH):
            chunk = list(texts[i : i + self._MAX_BATCH])
            if len(chunk) < self._MAX_BATCH:
                # fill to the full slice so every part dispatches the SAME
                # (_MAX_BATCH, seq-bucket) program; "" rows embed a bare CLS
                chunk += [""] * (self._MAX_BATCH - len(chunk))
            ids, mask = self._prep_batch(chunk)
            parts.append(
                self._apply_f32(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )
        return jnp.concatenate(parts, axis=0)
