"""Fused Pallas kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hyperdb_tpu.ops.pallas_topk import fused_topk
from hyperdb_tpu.ops.ranking import rank_top_k


@pytest.mark.parametrize("metric", ["dot_product", "euclidean_metric"])
@pytest.mark.parametrize("n", [96, 300])
def test_fused_matches_oracle(metric, n):
    rng = np.random.default_rng(0)
    d, b, k = 128, 8, 5
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)

    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(v), k=k, metric=metric, tile_n=64,
        interpret=True,
    )
    ovals, oidx = rank_top_k(jnp.asarray(q), jnp.asarray(v), k=k, metric=metric)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ovals), rtol=1e-5)


def test_fused_cosine_prenormalized():
    rng = np.random.default_rng(1)
    n, d, b, k = 256, 128, 8, 10
    v = rng.standard_normal((n, d)).astype(np.float32)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(vn), k=k, metric="dot_product",
        tile_n=64, interpret=True,
    )
    ovals, oidx = rank_top_k(
        jnp.asarray(q), jnp.asarray(vn), k=k, metric="cosine_similarity",
        prenormalized=True,
    )
    # same up to query normalization scale: compare indices only
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oidx))


def test_fused_mask_and_recency():
    rng = np.random.default_rng(2)
    n, d, b, k = 128, 128, 8, 4
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    mask = np.ones(n, dtype=bool)
    mask[: n // 2] = False
    rec = np.zeros(n, dtype=np.float32)
    rec[100] = 1000.0

    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(v), k=k, metric="dot_product",
        row_valid=jnp.asarray(mask), recency=jnp.asarray(rec),
        tile_n=64, interpret=True,
    )
    idx = np.asarray(idx)
    assert (idx >= n // 2).all(), "masked rows must not appear"
    assert (idx[:, 0] == 100).all(), "recency-boosted row must win"


def test_fused_masked_out_rows_are_neg_inf():
    rng = np.random.default_rng(3)
    n, d, b = 64, 128, 8
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    mask = np.zeros(n, dtype=bool)
    mask[:2] = True  # only two live rows, k=4 -> two -inf slots
    vals, _ = fused_topk(
        jnp.asarray(q), jnp.asarray(v), k=4, metric="dot_product",
        row_valid=jnp.asarray(mask), tile_n=64, interpret=True,
    )
    vals = np.asarray(vals)
    assert np.isfinite(vals[:, :2]).all()
    assert np.isneginf(vals[:, 2:]).all()
