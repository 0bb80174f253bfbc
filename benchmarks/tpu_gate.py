"""On-TPU exactness + throughput regression gate (VERDICT r3 #4).

The hermetic suite pins kernel exactness on CPU (interpret-mode Pallas,
XLA CPU lowering); real-TPU equality evidence previously lived only in
manually run benchmark scripts. This gate is the scripted version: one
chip-lock-aware run that

1. builds a 1M x 384 bf16 corpus on device,
2. runs the production grouped exact top-k (ops/ranking.rank_top_k_grouped)
   AND the Pallas gmax pipeline (ops/pallas_gmax.rank_top_k_grouped_pallas)
   against XLA's native lax.top_k over the full (B, N) scores — asserting
   INDEX EQUALITY row for row (the exactness contract, SURVEY §4.4),
3. does the same for the int8-pure grouped scan vs a flat int8 reference
   (same quantized scores, so equality is exact, not recall),
4. records q/s for the production paths alongside the pass/fail verdict in
   benchmarks/results.jsonl — giving on-device regressions a place to show
   up between rounds.

Exit code 0 = all gates passed. Run: python benchmarks/tpu_gate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._chiplock import claim_chip  # noqa: E402

claim_chip()

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def emit(record: dict):
    record["bench"] = "tpu_gate"
    record["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    line = json.dumps(record)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def timed(fn, *args, iters=15, trials=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    best = float("inf")
    # the chained accumulator must keep the query operand's dtype: an f32
    # acc would promote bf16 queries and time (and mid-loop compile) a
    # kernel the engine never runs (review r3)
    q_dtype = args[0].dtype
    for _ in range(trials):
        acc = jnp.zeros((), q_dtype)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args[0] + acc * 0, *args[1:])
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            acc = leaf.reshape(-1)[0].astype(q_dtype)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_pallas
    from hyperdb_tpu.ops.quantized import (
        _quantize_device,
        int8_scores,
        quantize_rows,
        rank_top_k_int8,
    )
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped

    print("devices:", jax.devices(), flush=True)
    n, d, b, k = 1 << 20, 384, 256, 10
    rng = np.random.default_rng(42)
    host = rng.standard_normal((n, d), dtype=np.float32)
    rows = jnp.asarray(host, dtype=jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)
    failures = []

    # ---- native TopK reference (the oracle on this exact device math) ----
    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    print("compiling native reference...", flush=True)
    _, (ref_vals, ref_idx) = timed(native, q, rows, iters=5, trials=1)
    ref_idx = np.asarray(ref_idx)

    # ---- production grouped exact top-k ----
    @jax.jit
    def grouped(qq, rr):
        return rank_top_k_grouped(qq, rr, k=k, group=128)

    print("compiling grouped...", flush=True)
    sec, (g_vals, g_idx) = timed(grouped, q, rows)
    eq = bool((np.asarray(g_idx) == ref_idx).all())
    if not eq:
        failures.append("grouped_vs_native")
    emit({"gate": "grouped_bf16_1m_b256", "index_equal": eq,
          "qps": round(b / sec), "ms": round(sec * 1e3, 2)})

    # ---- Pallas gmax pipeline (forced past the routing heuristic) ----
    @jax.jit
    def pallas_path(qq, rr):
        return rank_top_k_grouped_pallas(qq, rr, k=k)

    print("compiling pallas gmax...", flush=True)
    try:
        sec, (p_vals, p_idx) = timed(pallas_path, q, rows)
        eq = bool((np.asarray(p_idx) == ref_idx).all())
        if not eq:
            failures.append("pallas_vs_native")
        emit({"gate": "pallas_gmax_bf16_1m_b256", "index_equal": eq,
              "qps": round(b / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001 — the gate must report, not die
        failures.append("pallas_compile")
        emit({"gate": "pallas_gmax_bf16_1m_b256", "error": str(e)[:200]})

    # ---- int8-pure grouped scan vs flat int8 reference ----
    v_i8_host, v_sc_host = quantize_rows(host)
    v_i8 = jnp.asarray(v_i8_host)
    v_sc = jnp.asarray(v_sc_host)
    qf = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

    @jax.jit
    def int8_flat(qq, vv, ss):
        qi, qs = _quantize_device(qq.astype(jnp.float32))
        s = int8_scores(qi, qs, vv, ss)
        return jax.lax.top_k(s, k)

    @jax.jit
    def int8_grouped(qq, vv, ss):
        return rank_top_k_int8(qq, vv, ss, k=k)

    print("compiling int8 flat reference...", flush=True)
    _, (fi_vals, fi_idx) = timed(int8_flat, qf, v_i8, v_sc, iters=5, trials=1)
    print("compiling int8 grouped...", flush=True)
    sec, (gi_vals, gi_idx) = timed(int8_grouped, qf, v_i8, v_sc)
    eq = bool((np.asarray(gi_idx) == np.asarray(fi_idx)).all())
    if not eq:
        failures.append("int8_grouped_vs_flat")
    emit({"gate": "int8_grouped_1m_b256", "index_equal": eq,
          "qps": round(b / sec), "ms": round(sec * 1e3, 2)})

    # ---- big-batch bf16: engine routing (Pallas above the crossover) ----
    # b=512 routes stage 1 through the Pallas kernel in production
    # (config.pallas_gmax_f_min_batch); the gate proves the ROUTED path on
    # the real chip, single-chip and inside shard_map (1-device mesh — the
    # sharded serving plane's per-shard program).
    from hyperdb_tpu.ops.ranking import rank_top_k
    from hyperdb_tpu.parallel import make_mesh
    from hyperdb_tpu.parallel.distributed import sharded_rank_top_k

    b_big = 512
    q_big = jnp.asarray(
        rng.standard_normal((b_big, d), dtype=np.float32), jnp.bfloat16
    )
    print("compiling native reference (b=512)...", flush=True)
    _, (_, ref_big_idx) = timed(native, q_big, rows, iters=5, trials=1)
    ref_big_idx = np.asarray(ref_big_idx)

    @jax.jit
    def routed(qq, rr):
        return rank_top_k(qq, rr, k=k, metric="dot_product")

    print("compiling routed rank_top_k (b=512)...", flush=True)
    try:
        sec, (_, r_idx) = timed(routed, q_big, rows)
        eq = bool((np.asarray(r_idx) == ref_big_idx).all())
        if not eq:
            failures.append("routed_b512_vs_native")
        emit({"gate": "routed_bf16_1m_b512", "index_equal": eq,
              "qps": round(b_big / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("routed_b512_compile")
        emit({"gate": "routed_bf16_1m_b512", "error": str(e)[:200]})

    print("compiling sharded (1-device mesh, b=512)...", flush=True)
    try:
        mesh = make_mesh(1)
        valid = jnp.ones((n,), dtype=bool)
        sec, (_, s_idx) = timed(
            lambda qq: sharded_rank_top_k(
                mesh, qq, rows, valid, k=k, metric="dot_product"
            ),
            q_big,
        )
        eq = bool((np.asarray(s_idx) == ref_big_idx).all())
        if not eq:
            failures.append("sharded_b512_vs_native")
        emit({"gate": "sharded_bf16_1m_b512", "index_equal": eq,
              "qps": round(b_big / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("sharded_b512_compile")
        emit({"gate": "sharded_bf16_1m_b512", "error": str(e)[:200]})

    # ---- big-batch euclid: Pallas surrogate stage 1 vs the XLA epilogue
    # form (the production route above pallas_gmax_f_min_batch; recency
    # stays on the XLA form). Same epilogue math, different stage 1 — the
    # exactness contract is index identity between the two forms.
    from hyperdb_tpu.config import CONFIG
    from hyperdb_tpu.ops.pallas_gmax import rank_top_k_grouped_metric_pallas
    from hyperdb_tpu.ops.ranking import rank_top_k_grouped_metric

    b_m = 1024
    q_m = jnp.asarray(
        rng.standard_normal((b_m, d), dtype=np.float32), jnp.bfloat16
    )
    aux = jnp.sum(rows.astype(jnp.float32) ** 2, axis=1)

    print("compiling euclid XLA form (b=1024)...", flush=True)
    saved = CONFIG.pallas_gmax_f_min_batch
    CONFIG.pallas_gmax_f_min_batch = 0  # pure XLA epilogue form
    rank_top_k_grouped_metric.clear_cache()
    try:
        _, (_, x_idx) = timed(
            lambda qq: rank_top_k_grouped_metric(
                qq, rows, aux, k, "euclidean_metric", group=128
            ),
            q_m, iters=5, trials=1,
        )
        x_idx = np.asarray(x_idx)
    finally:
        CONFIG.pallas_gmax_f_min_batch = saved
        rank_top_k_grouped_metric.clear_cache()

    print("compiling euclid Pallas surrogate (b=1024)...", flush=True)
    try:
        sec, (_, m_idx) = timed(
            lambda qq: rank_top_k_grouped_metric_pallas(
                qq, rows, aux, k, "euclidean_metric"
            ),
            q_m,
        )
        eq = bool((np.asarray(m_idx) == x_idx).all())
        if not eq:
            failures.append("euclid_surrogate_vs_xla")
        emit({"gate": "euclid_surrogate_bf16_1m_b1024", "index_equal": eq,
              "qps": round(b_m / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("euclid_surrogate_compile")
        emit({"gate": "euclid_surrogate_bf16_1m_b1024",
              "error": str(e)[:200]})

    # ---- pearson plane route: NaN rows through the REAL Mosaic kernel ----
    # Big-batch pearson rides the dot routes over a centered unit-norm
    # plane whose constant rows are NaN on purpose (store.pearson_view);
    # interpret mode pins the NaN->-inf scrub hermetically, this case
    # proves it on actual Mosaic lowering at production scale.
    print("building pearson plane...", flush=True)
    vc = host - host.mean(axis=1, keepdims=True)
    vc[123] = 0.0
    vc[777777] = 0.0  # two "constant" rows -> 0/0 -> NaN plane rows
    norms = np.linalg.norm(vc, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        vc /= norms
    plane = jnp.asarray(vc, dtype=jnp.bfloat16)
    qc_host = np.asarray(
        rng.standard_normal((b_m, d), dtype=np.float32)
    )
    qc_host -= qc_host.mean(axis=1, keepdims=True)
    qc_host /= np.linalg.norm(qc_host, axis=1, keepdims=True)
    q_p = jnp.asarray(qc_host, dtype=jnp.bfloat16)

    @jax.jit
    def native_scrubbed(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        return jax.lax.top_k(s, k)

    print("compiling pearson native reference (b=1024)...", flush=True)
    try:
        _, (_, ref_p_idx) = timed(native_scrubbed, q_p, plane,
                                  iters=5, trials=1)
        ref_p_idx = np.asarray(ref_p_idx)
        print("compiling pearson routed rank_top_k (b=1024)...", flush=True)
        sec, (_, p_idx) = timed(routed, q_p, plane)
        p_idx = np.asarray(p_idx)
        eq = bool((p_idx == ref_p_idx).all())
        nan_clean = bool(
            (p_idx != 123).all() and (p_idx != 777777).all()
        )
        if not eq:
            failures.append("pearson_plane_vs_native")
        if not nan_clean:
            failures.append("pearson_nan_rows_ranked")
        emit({"gate": "pearson_plane_bf16_1m_b1024", "index_equal": eq,
              "nan_rows_excluded": nan_clean,
              "qps": round(b_m / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("pearson_plane_compile")
        emit({"gate": "pearson_plane_bf16_1m_b1024", "error": str(e)[:200]})

    emit({"gate": "verdict", "failures": failures, "ok": not failures})
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
