"""Multi-chip correctness on the CPU-simulated 8-device mesh.

The single-device fused ranker is the oracle: the distributed per-shard
top-k + all-gather merge must reproduce it exactly (SURVEY.md §4.4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hyperdb_tpu.ops.ranking import rank_top_k
from hyperdb_tpu.parallel import DistributedCorpus, make_mesh, sharded_rank_top_k


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 simulated devices"
    return make_mesh(8)


@pytest.mark.parametrize("metric", ["cosine_similarity", "dot_product", "euclidean_metric"])
def test_sharded_matches_single_device(mesh, metric):
    rng = np.random.default_rng(0)
    n, d, b, k = 512, 32, 4, 10
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)

    corpus = DistributedCorpus(mesh, v, metric=metric)
    vals, idx = corpus.query(q, k=k)

    oracle_vals, oracle_idx = rank_top_k(jnp.asarray(q), jnp.asarray(v), k=k, metric=metric)
    np.testing.assert_allclose(vals, np.asarray(oracle_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx, np.asarray(oracle_idx))


def test_sharded_with_uneven_rows_and_mask(mesh):
    rng = np.random.default_rng(1)
    n, d, b, k = 333, 16, 2, 7  # not divisible by 8 -> exercises padding
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    corpus = DistributedCorpus(mesh, v, metric="dot_product")
    vals, idx = corpus.query(q, k=k)
    assert (idx < n).all(), "padding rows must never be returned"
    oracle_vals, oracle_idx = rank_top_k(
        jnp.asarray(q), jnp.asarray(v), k=k, metric="dot_product"
    )
    np.testing.assert_array_equal(idx, np.asarray(oracle_idx))


def test_sharded_recency(mesh):
    rng = np.random.default_rng(2)
    n, d = 64, 8
    v = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(1, d)).astype(np.float32)
    recency = np.zeros(n, dtype=np.float32)
    recency[5] = 100.0  # force row 5 to the top
    corpus = DistributedCorpus(mesh, v, metric="cosine_similarity")
    rec_pad = np.zeros(corpus.n_pad, dtype=np.float32)
    rec_pad[:n] = recency
    from jax.sharding import NamedSharding, PartitionSpec as P

    vals, idx = sharded_rank_top_k(
        mesh,
        jnp.asarray(q),
        corpus.rows,
        corpus.row_valid,
        k=3,
        metric="cosine_similarity",
        recency=jax.device_put(rec_pad, NamedSharding(mesh, P("data"))),
    )
    assert int(np.asarray(idx)[0, 0]) == 5


def test_train_step_compiles_and_runs(mesh):
    from hyperdb_tpu.models.train import (
        make_train_state,
        make_train_step,
        synthetic_batch,
    )

    model, params, opt, opt_state = make_train_state(mesh)
    step = make_train_step(mesh, model, opt, params, donate=False)
    batch = synthetic_batch(batch_size=8, seq_len=16)
    params2, opt_state2, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))
    # one more step to confirm state threading
    _, _, loss2 = step(params2, opt_state2, batch)
    assert np.isfinite(float(loss2))


def test_minilm_encoder_smoke():
    from hyperdb_tpu.models.minilm import MiniLMEmbedder

    emb = MiniLMEmbedder()
    out = emb.encode(["hello world", "hello world", "different sentence entirely"])
    assert out.shape == (3, 384)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
    # identical inputs -> identical embeddings; different input -> different
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5)
    assert not np.allclose(out[0], out[2])


def test_sharded_grouped_topk_matches_oracle(monkeypatch):
    """Per-shard grouped selection inside shard_map == plain sharded path."""
    import jax
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.parallel import make_mesh
    from hyperdb_tpu.parallel.distributed import sharded_rank_top_k

    mesh = make_mesh(8)
    rng = np.random.default_rng(17)
    n, d, b, k = 8 * 512, 16, 130, 7  # batch >= 128 -> group 128 divides 512
    rows = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    valid = np.ones(n, dtype=bool)
    valid[::5] = False
    rec = rng.standard_normal(n).astype(np.float32) * 0.05

    monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 10**9)
    ov, oi = sharded_rank_top_k(
        mesh, q, rows, jnp.asarray(valid), k=k, metric="dot_product",
        recency=jnp.asarray(rec),
    )
    monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 256)
    gv, gi = sharded_rank_top_k(
        mesh, q, rows, jnp.asarray(valid), k=k, metric="dot_product",
        recency=jnp.asarray(rec),
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(oi))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov), rtol=1e-5)


def test_sharded_int8_matches_unsharded_int8(mesh):
    """Merged per-shard int8 top-k == the unsharded int8 scan (same
    quantization, top-k distributive over row partitions)."""
    from hyperdb_tpu.ops.quantized import quantize_rows, rank_top_k_int8
    from hyperdb_tpu.parallel.distributed import sharded_rank_top_k_int8

    rng = np.random.default_rng(21)
    n, d, b, k = 8 * 256, 32, 4, 9
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    v_i8, scales = quantize_rows(v)
    valid = np.ones(n, dtype=bool)
    valid[::7] = False
    rec = (rng.standard_normal(n) * 0.02).astype(np.float32)

    sv, si = sharded_rank_top_k_int8(
        mesh, jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(scales),
        jnp.asarray(valid), k=k, recency=jnp.asarray(rec),
    )
    ov, oi = rank_top_k_int8(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(scales), k=k,
        row_mask=jnp.asarray(valid), recency=jnp.asarray(rec),
    )
    np.testing.assert_array_equal(np.asarray(si), np.asarray(oi))
    np.testing.assert_allclose(np.asarray(sv), np.asarray(ov), rtol=1e-5)


def test_distributed_corpus_int8_recall(mesh):
    rng = np.random.default_rng(22)
    n, d, b, k = 4096, 48, 6, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    corpus = DistributedCorpus(mesh, v, metric="cosine_similarity", precision="int8")
    vals, idx = corpus.query(q, k=k)
    ov, oi = rank_top_k(jnp.asarray(q), jnp.asarray(v), k=k, metric="cosine_similarity")
    oi = np.asarray(oi)
    recall = np.mean(
        [len(set(idx[i].tolist()) & set(oi[i].tolist())) / k for i in range(b)]
    )
    assert recall >= 0.9, recall
    # int8 corpus actually stored as int8 (capacity claim)
    assert corpus.rows_q.dtype == jnp.int8


def test_distributed_corpus_int8_rejects_other_metrics(mesh):
    rng = np.random.default_rng(23)
    v = rng.standard_normal((256, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        DistributedCorpus(mesh, v, metric="euclidean_metric", precision="int8")
