"""Sharded contrastive fine-tuning of the MiniLM embedder.

The reference treats its embedding model as a frozen external binary; a
production retrieval stack needs to fine-tune it. This module provides an
in-batch-negative InfoNCE training step, jitted over a ('data', 'model')
mesh:

- data parallel: the (query, document) pair batch is sharded over 'data';
  gradients are reduced by XLA-inserted psums.
- tensor parallel: attention and FFN projection kernels are sharded over
  'model' (column-parallel in, row-parallel out), so activations stay
  sharded through each block and XLA inserts the reduce-scatter/all-gather
  pairs on ICI.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperdb_tpu.models.minilm import MiniLM, init_params

# Column-parallel projections (output features sharded) and their
# row-parallel counterparts (input features sharded).
_COL_PARALLEL = ("query", "key", "value", "intermediate")
_ROW_PARALLEL = ("attn_output", "output")


def param_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if leaf.ndim == 2:
        for name in names:
            if name in _COL_PARALLEL:
                return P(None, "model")
            if name in _ROW_PARALLEL:
                return P("model", None)
    if leaf.ndim == 1:
        for name in names:
            if name in _COL_PARALLEL:
                return P("model")
    return P()  # embeddings, layer norms, biases of row-parallel layers


def make_param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def info_nce_loss(params, model, batch, temperature: float = 0.05):
    q_emb = model.apply(params, batch["q_ids"], batch["q_mask"])  # (B, d) unit
    d_emb = model.apply(params, batch["d_ids"], batch["d_mask"])
    logits = (q_emb @ d_emb.T) / temperature
    labels = jnp.arange(logits.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return loss.mean()


def info_nce_distill_loss(params, model, batch,
                          temperature: float = 0.05,
                          distill_weight: float = 10.0):
    """InfoNCE plus lexical distillation on natural-prose batches
    (VERDICT r4 #3): the off-diagonal dense cross-view cosines are pulled
    toward the lexical hash-4096 cosines (``batch['lex_sims']``, host-
    computed). Rationale: the shipped default embedder is the CONCAT
    hybrid (models/embedder.HybridEmbedder — score = w*dense_cos +
    (1-w)*lex_cos), and on out-of-distribution text the untamed dense
    channel ranks *against* the lexical channel, dragging the hybrid
    below pure lexical (0.485 vs 0.560 recall@10, BASELINE.md). Teaching
    the dense channel to AGREE with lexical structure on natural prose —
    while InfoNCE on the diagonal (excluded from the distill term) keeps
    pulling true pairs above their lexical overlap — makes the channels
    complementary instead of adversarial. Applied only to prose batches;
    templated concept batches (where lexical sims are ~0 by construction
    and dense must win alone) keep the pure InfoNCE loss."""
    q_emb = model.apply(params, batch["q_ids"], batch["q_mask"])
    d_emb = model.apply(params, batch["d_ids"], batch["d_mask"])
    sims = q_emb @ d_emb.T  # (B, B) dense cross-view cosines
    logits = sims / temperature
    labels = jnp.arange(logits.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
    off = 1.0 - jnp.eye(sims.shape[0], dtype=sims.dtype)
    distill = jnp.sum(off * (sims - batch["lex_sims"]) ** 2) / jnp.sum(off)
    return loss + distill_weight * distill


def make_train_state(mesh: Mesh, seed: int = 0, learning_rate: float = 2e-5):
    """Initialize (model, params, opt, opt_state) with mesh shardings."""
    model, params = init_params(seed=seed)
    shardings = make_param_shardings(mesh, params)
    params = jax.device_put(params, shardings)
    opt = optax.adamw(learning_rate)
    opt_state = opt.init(params)
    return model, params, opt, opt_state


def make_train_step(mesh: Mesh, model: MiniLM, opt, params_example, donate: bool = True):
    """Build the jitted sharded train step:
    (params, opt_state, batch) -> (params, opt_state, loss)."""
    param_sh = make_param_shardings(mesh, params_example)
    batch_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(info_nce_loss)(params, model, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # opt_state shardings stay None: the compiler lays optimizer state out
    # to mirror the (sharded) params it tracks.
    return jax.jit(
        step,
        in_shardings=(param_sh, None, {k: batch_sh for k in
                                       ("q_ids", "q_mask", "d_ids", "d_mask")}),
        out_shardings=(param_sh, None, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def synthetic_batch(batch_size: int, seq_len: int, seed: int = 0) -> dict[str, Any]:
    """Deterministic token batch for compile checks and benchmarks."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(1000, 30000, size=(batch_size, seq_len), dtype=np.int32)
    mask = np.ones((batch_size, seq_len), dtype=np.int32)
    return {
        "q_ids": ids,
        "q_mask": mask,
        "d_ids": rng.integers(1000, 30000, size=(batch_size, seq_len), dtype=np.int32),
        "d_mask": mask.copy(),
    }
