"""Int8 scan: quantization round-trip, recall vs exact, rescored exactness."""

import numpy as np

import jax.numpy as jnp

from hyperdb_tpu.ops.quantized import int8_scores, quantize_rows, rank_top_k_int8
from hyperdb_tpu.ops.ranking import rank_top_k


def _data(n=2000, d=64, b=8, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    return v, q


def test_quantize_roundtrip_error():
    v, _ = _data()
    q_i8, scales = quantize_rows(v)
    recon = q_i8.astype(np.float32) * scales[:, None]
    err = np.abs(recon - v).max()
    assert err <= (scales.max() / 2) + 1e-6


def test_int8_scores_close_to_exact():
    v, q = _data()
    v_i8, scales = quantize_rows(v)
    s_q = np.asarray(
        int8_scores(
            *_dev_quant(q), jnp.asarray(v_i8), jnp.asarray(scales)
        )
    )
    s_exact = q @ v.T
    assert np.abs(s_q - s_exact).max() < 0.05


def _dev_quant(q):
    from hyperdb_tpu.ops.quantized import _quantize_device

    out = _quantize_device(jnp.asarray(q))
    return out


def test_int8_topk_recall():
    v, q = _data()
    v_i8, scales = quantize_rows(v)
    _, idx_q = rank_top_k_int8(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(scales), k=10
    )
    _, idx_exact = rank_top_k(jnp.asarray(q), jnp.asarray(v), k=10, metric="dot_product")
    idx_q, idx_exact = np.asarray(idx_q), np.asarray(idx_exact)
    recall = np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(idx_q.tolist(), idx_exact.tolist())]
    )
    assert recall >= 0.9


def test_int8_with_rescore_is_exact():
    v, q = _data()
    v_i8, scales = quantize_rows(v)
    vals_q, idx_q = rank_top_k_int8(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(scales), k=10,
        rescore_rows=jnp.asarray(v),
    )
    vals_e, idx_e = rank_top_k(jnp.asarray(q), jnp.asarray(v), k=10, metric="dot_product")
    np.testing.assert_array_equal(np.asarray(idx_q), np.asarray(idx_e))
    np.testing.assert_allclose(np.asarray(vals_q), np.asarray(vals_e), rtol=1e-4)


def test_int8_mask_and_recency():
    v, q = _data(n=256, b=2)
    v_i8, scales = quantize_rows(v)
    mask = np.zeros(256, dtype=bool)
    mask[100:] = True
    rec = np.zeros(256, dtype=np.float32)
    rec[200] = 50.0
    vals, idx = rank_top_k_int8(
        jnp.asarray(q), jnp.asarray(v_i8), jnp.asarray(scales), k=5,
        row_mask=jnp.asarray(mask), recency=jnp.asarray(rec),
        rescore_rows=jnp.asarray(v),
    )
    idx = np.asarray(idx)
    assert (idx >= 100).all()
    assert (idx[:, 0] == 200).all()


def test_int8_chunked_scan_matches_unchunked():
    """The row-chunked lax.scan form (engaged when the grouped epilogue would
    blow the HBM budget — measured OOM at 10M x 768 batch 256) must return
    exactly what the one-shot grouped kernel returns."""
    from hyperdb_tpu.ops.quantized import (
        _int8_grouped_topk,
        _int8_grouped_topk_chunked,
        _quantize_device,
    )

    rng = np.random.default_rng(3)
    n, d, b, k, group = 4096, 32, 4, 5, 64
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    v_i8, scales = quantize_rows(v)
    mask = rng.random(n) < 0.9
    rec = (rng.random(n) * 0.01).astype(np.float32)

    q_i8, q_scale = _quantize_device(jnp.asarray(q))
    base = _int8_grouped_topk(
        q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(scales), k, group,
        jnp.asarray(mask), jnp.asarray(rec),
    )
    for n_chunks in (2, 4, 8):
        got = _int8_grouped_topk_chunked(
            q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(scales), k, group,
            jnp.asarray(mask), jnp.asarray(rec), n_chunks,
        )
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(base[1]))
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(base[0]), rtol=1e-5
        )


def test_int8_chunked_no_mask_no_recency():
    from hyperdb_tpu.ops.quantized import (
        _int8_grouped_topk,
        _int8_grouped_topk_chunked,
        _quantize_device,
    )

    rng = np.random.default_rng(4)
    n, d, b, k, group = 2048, 16, 3, 4, 32
    v = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    v_i8, scales = quantize_rows(v)
    q_i8, q_scale = _quantize_device(jnp.asarray(q))
    base = _int8_grouped_topk(
        q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(scales), k, group,
        None, None,
    )
    got = _int8_grouped_topk_chunked(
        q_i8, q_scale, jnp.asarray(v_i8), jnp.asarray(scales), k, group,
        None, None, 4,
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(base[1]))


def test_pick_chunks_budget_and_divisibility():
    from hyperdb_tpu.ops.quantized import _EPILOGUE_BUDGET_BYTES, _pick_chunks

    # 10M x 768 at batch 256, group 128: the measured-OOM config must chunk
    g = 10_485_760 // 128
    c = _pick_chunks(256, 10_485_760, 128)
    assert c > 1 and g % c == 0
    assert 256 * (g // c) * 128 * 4 <= _EPILOGUE_BUDGET_BYTES
    # small configs stay unchunked
    assert _pick_chunks(8, 65536, 128) == 1


def test_chunked_scan_sparse_mask_no_duplicate_rows():
    """The chunked frontier's NEG_INF carry seeds keep group id 0; when a
    filter confines every surviving row to group 0, the invalid selection
    slots must be masked (group_valid) or stage-3 rescores group 0 twice
    and the final top-k returns the SAME row multiple times."""
    from hyperdb_tpu.ops.quantized import (
        _int8_grouped_topk_chunked,
        quantize_rows,
    )

    rng = np.random.default_rng(9)
    n, d, b, k, group = 1024, 16, 2, 4, 128
    v = rng.standard_normal((n, d)).astype(np.float32)
    v_i8, v_scales = quantize_rows(v)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q_i8, q_scale = quantize_rows(q)
    mask = np.zeros(n, dtype=bool)
    mask[:8] = True  # survivors all in global group 0

    vals, idx = _int8_grouped_topk_chunked(
        jnp.asarray(q_i8), jnp.asarray(q_scale),
        jnp.asarray(v_i8), jnp.asarray(v_scales),
        k, group, jnp.asarray(mask), None, n_chunks=4,
    )
    idx = np.asarray(idx)
    vals = np.asarray(vals)
    for row_idx, row_vals in zip(idx, vals):
        finite = row_idx[np.isfinite(row_vals)]
        assert len(set(finite.tolist())) == len(finite), row_idx
        assert all(mask[i] for i in finite)
