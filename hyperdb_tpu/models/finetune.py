"""Contrastive fine-tuning of the MiniLM embedder on (query, document) pairs.

The reference treats its embedding model as a frozen external artifact; a
retrieval stack owns its encoder. This wraps models/train.py's sharded
InfoNCE step into a data-in/embedder-out API:

    pairs = [("likes to sleep", doc_text), ...]
    embedder = finetune(pairs, epochs=2)
    db = HyperDB(docs, embedding_function=make_embedding_function(embedder, tok))

With a mesh, the step runs data-parallel over 'data' and tensor-parallel
over 'model' (models/train.py); without one it runs single-device.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from hyperdb_tpu.models.minilm import (
    MAX_POSITIONS,
    HashingTokenizer,
    MiniLM,
    MiniLMEmbedder,
    init_params,
)
from hyperdb_tpu.models.train import info_nce_loss


def _tokenize_batch(texts, tokenizer, seq_len: int):
    ids = np.zeros((len(texts), seq_len), dtype=np.int32)
    mask = np.zeros((len(texts), seq_len), dtype=np.int32)
    for i, text in enumerate(texts):
        tok_ids, tok_mask = tokenizer.encode(text, seq_len)
        tok_ids = tok_ids[:seq_len]
        ids[i, : len(tok_ids)] = tok_ids
        mask[i, : len(tok_ids)] = tok_mask[: len(tok_ids)]
    empty = mask.sum(axis=1) == 0
    ids[empty, 0] = getattr(tokenizer, "cls_id", 101)
    mask[empty, 0] = 1
    return ids, mask


def finetune(
    pairs,
    *,
    mesh=None,
    epochs: int = 1,
    batch_size: int = 32,
    seq_len: int = 64,
    learning_rate: float = 2e-5,
    seed: int = 0,
    params=None,
    tokenizer=None,
    verbose: bool = False,
):
    """Fine-tune MiniLM with in-batch-negative InfoNCE; returns an embedder.

    Args:
        pairs: iterable of (query_text, positive_document_text).
        mesh: optional ('data', 'model') Mesh for sharded training.
        params: starting parameters (default: pretrained if locally cached,
            else deterministic init).
    """
    pairs = list(pairs)
    if len(pairs) < 2:
        raise ValueError("Need at least 2 pairs for in-batch negatives.")
    seq_len = min(seq_len, MAX_POSITIONS)
    batch_size = min(batch_size, len(pairs))
    if mesh is not None:
        # the train step pins the batch to P('data', None); round down to a
        # multiple of the data axis so the sharding divides evenly
        data_size = int(mesh.shape.get("data", 1))
        batch_size = max(data_size, (batch_size // data_size) * data_size)
        if batch_size > len(pairs):
            raise ValueError(
                f"Need at least {batch_size} pairs (one batch divisible by "
                f"the mesh's {data_size}-way 'data' axis); got {len(pairs)}."
            )
    tokenizer = tokenizer or HashingTokenizer()

    model = MiniLM()
    if params is None:
        from hyperdb_tpu.models.minilm import load_hf_params

        params = load_hf_params()
        if params is None:
            _, params = init_params(seed=seed)

    opt = optax.adamw(learning_rate)

    if mesh is not None:
        from hyperdb_tpu.models.train import make_param_shardings, make_train_step

        params = jax.device_put(params, make_param_shardings(mesh, params))
        opt_state = opt.init(params)
        step = make_train_step(mesh, model, opt, params, donate=False)
    else:
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(info_nce_loss)(params, model, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for epoch in range(epochs):
        order = rng.permutation(len(pairs))
        for start in range(0, len(pairs) - batch_size + 1, batch_size):
            idx = order[start : start + batch_size]
            q_texts = [pairs[i][0] for i in idx]
            d_texts = [pairs[i][1] for i in idx]
            q_ids, q_mask = _tokenize_batch(q_texts, tokenizer, seq_len)
            d_ids, d_mask = _tokenize_batch(d_texts, tokenizer, seq_len)
            batch = {"q_ids": q_ids, "q_mask": q_mask,
                     "d_ids": d_ids, "d_mask": d_mask}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
            if verbose:
                print(f"epoch {epoch} step {start // batch_size}: "
                      f"loss {losses[-1]:.4f}")

    embedder = MiniLMEmbedder(params=params, tokenizer=tokenizer)
    embedder.losses = losses
    return embedder
