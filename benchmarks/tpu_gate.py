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


# The remote compile helper 500s transiently on 50-75% of FRESH program
# shapes (CLAUDE.md; the round-4 gate ended red on exactly this — VERDICT
# r4 weak #1). A bounded backoff retry makes the gate's false-red rate
# negligible without masking real Mosaic compile errors (those repeat
# deterministically and exhaust the schedule).
_TRANSIENT_MARKERS = ("remote_compile", "tpu_compile_helper", "HTTP 500")
_RETRY_DELAYS_S = (20, 45, 90, 180, 300)


def _warm(fn, *args):
    """First call (compile) with retry on transient compile-helper faults."""
    for delay in _RETRY_DELAYS_S + (None,):
        try:
            return fn(*args)
        except Exception as e:  # noqa: BLE001 — classify, then re-raise
            msg = str(e)
            if delay is None or not any(m in msg for m in _TRANSIENT_MARKERS):
                raise
            print(f"  transient compile-helper fault, retrying in {delay}s: "
                  f"{msg[:120]}", flush=True)
            time.sleep(delay)


def timed(fn, *args, iters=15, trials=3):
    import jax
    import jax.numpy as jnp

    out = _warm(fn, *args)
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
    failures = []
    warnings = []

    # ---- native TopK reference (the oracle on this exact device math) ----
    @jax.jit
    def native(qq, rr):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(s, k)

    # ---- capacity helpers (shared by the planar fatal case, the 10M int8
    # case, and the monolithic canary). Corpora are generated and quantized
    # ON DEVICE (nothing rides the tunnel) with donated in-place writes
    # (one corpus allocation).
    import functools

    def build_device_corpus(n_rows, dd, dtype, chunk=1 << 19, seed=0):
        @jax.jit
        def gen_chunk(key):
            x = jax.random.normal(key, (chunk, dd), dtype=jnp.float32)
            norm = jnp.linalg.norm(x, axis=1, keepdims=True)
            x = x / jnp.where(norm == 0, 1.0, norm)
            return x.astype(dtype)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def write_chunk(buf, c, row0):
            return jax.lax.dynamic_update_slice(buf, c, (row0, 0))

        buf = jnp.zeros((n_rows, dd), dtype=dtype)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_rows // chunk)
        for i, kk in enumerate(keys):
            buf = write_chunk(buf, gen_chunk(kk), jnp.int32(i * chunk))
        jax.block_until_ready(buf)
        return buf

    # A capacity working set released seconds earlier — this process's
    # previous case or a neighboring process — can hold its HBM for
    # minutes after the Python references drop (CLAUDE.md reclaim lag).
    def _run_capacity(case, oom_delays=(120, 240)):
        """Run a capacity case; returns None on success, the exception on
        a non-OOM/final failure. ResourceExhausted retries the whole case
        after the documented reclaim-lag spacing."""
        import gc

        for delay in oom_delays + (None,):
            try:
                case()
                return None
            except Exception as e:  # noqa: BLE001 — gate reports, not dies
                err, is_oom = e, "RESOURCE_EXHAUSTED" in str(e)
                # Drop the traceback NOW: its frames pin the failed
                # attempt's device buffers (the 12.9 GB planes), which
                # otherwise only free at except-block exit — AFTER the
                # sleep, i.e. zero reclaim spacing before the rebuild.
                err.__traceback__ = None
                e = None
            if delay is None or not is_oom:
                return err
            gc.collect()
            print(f"  capacity OOM, freeing and retrying in {delay}s",
                  flush=True)
            time.sleep(delay)

    # ---- planar capacity route FIRST, on genuinely clean HBM (round 5).
    # THE fatal capacity gate — the production engine stores capacity
    # corpora as split device planes (CONFIG.plane_rows; query/engine.py
    # planar branch) precisely so no program ever compiles against a
    # monolithic capacity operand. History (results.jsonl 2026-08-19/20):
    # every planar red was an OOM with a 7.7-12.9 GB working set dropped
    # minutes earlier in the SAME gate process or a just-exited neighbor —
    # the monolithic 12.9 GB form ran green at 20:39 on fresh HBM. The
    # 12.9 GB case therefore runs before the gate allocates anything else.
    def planar_case():
        from hyperdb_tpu.ops.ranking import rank_top_k_planar

        n24, d24, b24 = 1 << 24, 384, 512
        half = n24 // 2
        print(f"building 2 x {half} x {d24} bf16 planes...", flush=True)
        t0 = time.time()
        planes24 = [
            build_device_corpus(half, d24, jnp.bfloat16, seed=14 + i)
            for i in (0, 1)
        ]
        print(f"built in {time.time() - t0:.1f}s", flush=True)
        q24 = jnp.asarray(
            rng.standard_normal((b24, d24), dtype=np.float32), jnp.bfloat16
        )
        print("compiling per-plane native reference (b=8)...", flush=True)
        ref_v, ref_i = [], []
        for pi, plane in enumerate(planes24):
            _, (v8, i8) = timed(native, q24[:8], plane, iters=3, trials=1)
            ref_v.append(np.asarray(v8))
            ref_i.append(np.asarray(i8) + pi * half)
        cat_v = np.concatenate(ref_v, axis=1)
        cat_i = np.concatenate(ref_i, axis=1)
        order = np.argsort(-cat_v, axis=1, kind="stable")[:, :k]
        ref_idx = np.take_along_axis(cat_i, order, axis=1)
        print("running planar routed top-k (2^24, b=512)...", flush=True)
        sec, (_, idxp) = timed(
            lambda qq: rank_top_k_planar(
                qq, planes24, k=k, metric="dot_product"
            ),
            q24, iters=5, trials=2,
        )
        eq = bool((np.asarray(idxp)[:8] == ref_idx).all())
        if not eq:
            failures.append("capacity_2p24_planar_vs_native")
        emit({"gate": "planar_bf16_2p24_b512", "index_equal": eq,
              "qps": round(b24 / sec), "ms": round(sec * 1e3, 2)})

    err = _run_capacity(planar_case)
    if err is not None:
        failures.append("capacity_2p24_planar_error")
        emit({"gate": "planar_bf16_2p24_b512", "error": str(err)[:200]})

    # ---- 1M working set (allocated only after the capacity-fatal case) ----
    host = rng.standard_normal((n, d), dtype=np.float32)
    rows = jnp.asarray(host, dtype=jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)

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

    # ---- recency routes (VERDICT r4 #4): recency rides stage 1's additive
    # INSIDE the Pallas kernel on the routed dot path (pallas_gmax.
    # make_extra) and the two-level selection must keep containment with it
    # folded — previously no gate case exercised recency on the dot/pearson
    # routes, so a subgroup-refactor regression there was invisible. The
    # oracle folds recency on the native scores in the reference order
    # (NaN scrub -> add), reference ranking_algorithm.py:180-186.
    rec = jnp.asarray((0.5 * rng.random(n)).astype(np.float32))

    @jax.jit
    def native_rec(qq, rr, rv):
        s = jax.lax.dot_general(
            qq, rr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        s = s + rv[None, :]
        return jax.lax.top_k(s, k)

    @jax.jit
    def routed_rec(qq, rr, rv):
        return rank_top_k(qq, rr, k=k, metric="dot_product", recency=rv)

    print("compiling dot+recency native reference (b=512)...", flush=True)
    try:
        _, (_, ref_rec_idx) = timed(native_rec, q_big, rows, rec,
                                    iters=5, trials=1)
        ref_rec_idx = np.asarray(ref_rec_idx)
        print("compiling dot+recency routed (b=512)...", flush=True)
        sec, (_, rr_idx) = timed(routed_rec, q_big, rows, rec)
        eq = bool((np.asarray(rr_idx) == ref_rec_idx).all())
        if not eq:
            failures.append("routed_recency_vs_native")
        emit({"gate": "routed_rec_bf16_1m_b512", "index_equal": eq,
              "qps": round(b_big / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("routed_recency_error")
        emit({"gate": "routed_rec_bf16_1m_b512", "error": str(e)[:200]})

    # pearson plane + recency: the additive composes with the NaN-row scrub
    # (a -inf plane row must stay excluded after +recency)
    print("compiling pearson+recency native reference (b=1024)...",
          flush=True)
    try:
        _, (_, ref_pr_idx) = timed(native_rec, q_p, plane, rec,
                                   iters=5, trials=1)
        ref_pr_idx = np.asarray(ref_pr_idx)
        print("compiling pearson+recency routed (b=1024)...", flush=True)
        sec, (_, pr_idx) = timed(routed_rec, q_p, plane, rec)
        pr_idx = np.asarray(pr_idx)
        eq = bool((pr_idx == ref_pr_idx).all())
        nan_clean = bool((pr_idx != 123).all() and (pr_idx != 777777).all())
        if not eq:
            failures.append("pearson_recency_vs_native")
        if not nan_clean:
            failures.append("pearson_recency_nan_rows_ranked")
        emit({"gate": "pearson_rec_bf16_1m_b1024", "index_equal": eq,
              "nan_rows_excluded": nan_clean,
              "qps": round(b_m / sec), "ms": round(sec * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("pearson_recency_error")
        emit({"gate": "pearson_rec_bf16_1m_b1024", "error": str(e)[:200]})

    # ---- ADVICE r4 #3: the swapped-orientation subgroup kernel had only
    # been chip-compiled at d=384, b>=2048; smoke the other supported dims
    # (d=768, and a sub-tile b=128 block) through the forced Pallas route
    # so an unprobed-shape Mosaic failure surfaces here, not in production.
    try:
        n7, d7 = 1 << 18, 768
        print(f"building {n7} x {d7} bf16 corpus on device...", flush=True)

        @jax.jit
        def gen7(key):
            return jax.random.normal(
                key, (n7, d7), dtype=jnp.float32
            ).astype(jnp.bfloat16)

        rows7 = gen7(jax.random.PRNGKey(9))
        jax.block_until_ready(rows7)
        q7 = jnp.asarray(
            rng.standard_normal((128, d7), dtype=np.float32), jnp.bfloat16
        )
        print("compiling native reference (256k x 768, b=128)...", flush=True)
        _, (_, ref7_idx) = timed(native, q7, rows7, iters=3, trials=1)
        print("compiling forced pallas (256k x 768, b=128)...", flush=True)
        sec, (_, p7_idx) = timed(pallas_path, q7, rows7, iters=5, trials=2)
        eq = bool((np.asarray(p7_idx) == np.asarray(ref7_idx)).all())
        if not eq:
            failures.append("pallas_d768_b128_vs_native")
        emit({"gate": "pallas_sub_bf16_256k_d768_b128", "index_equal": eq,
              "qps": round(128 / sec), "ms": round(sec * 1e3, 2)})
        del rows7, q7
    except Exception as e:  # noqa: BLE001
        failures.append("pallas_d768_b128_error")
        emit({"gate": "pallas_sub_bf16_256k_d768_b128",
              "error": str(e)[:200]})

    # ---- manhattan streamed route (VERDICT r4: the last metric that
    # materialized (B, N) — the stream must SERVE at b=2048, where the old
    # route's 8 GB f32 matrix could not compile, and stay index-identical
    # to the materializing small-batch oracle).
    from hyperdb_tpu.ops.ranking import rank_top_k_manhattan_stream

    b_small = 32
    q_mh = jnp.asarray(
        rng.standard_normal((b_small, d), dtype=np.float32), jnp.bfloat16
    )

    @jax.jit
    def manhattan_native(qq, rr):
        # materializing oracle, same per-tile math (metrics.manhattan_scores
        # semantics) at a batch where (B, N) f32 is small
        from hyperdb_tpu.ops.metrics import scores as _scores

        s = _scores(qq, rr, "manhattan_distance")
        s = jnp.where(jnp.isnan(s), -jnp.inf, s)
        return jax.lax.top_k(s, k)

    @jax.jit
    def manhattan_routed(qq, rr):
        return rank_top_k(qq, rr, k=k, metric="manhattan_distance")

    print("compiling manhattan oracle (b=32)...", flush=True)
    try:
        _, (_, mh_ref_idx) = timed(manhattan_native, q_mh, rows,
                                   iters=3, trials=1)
        mh_ref_idx = np.asarray(mh_ref_idx)
        print("compiling manhattan routed (b=32)...", flush=True)
        _, (_, mh_idx) = timed(manhattan_routed, q_mh, rows,
                               iters=3, trials=1)
        eq = bool((np.asarray(mh_idx) == mh_ref_idx).all())
        if not eq:
            failures.append("manhattan_stream_vs_oracle")
        emit({"gate": "manhattan_stream_bf16_1m_b32", "index_equal": eq})

        # serving batch: first 32 rows repeat the oracle queries, so the
        # b=2048 program is exactness-checked too, not just compiled
        b_mh = 2048
        q_big_mh = jnp.concatenate([
            q_mh,
            jnp.asarray(
                rng.standard_normal((b_mh - b_small, d), dtype=np.float32),
                jnp.bfloat16,
            ),
        ])
        print("compiling manhattan streamed (b=2048)...", flush=True)
        sec, (_, mh_big_idx) = timed(
            lambda qq: rank_top_k_manhattan_stream(qq, rows, k=k, tile=2048),
            q_big_mh, iters=3, trials=2,
        )
        eq_big = bool((np.asarray(mh_big_idx)[:b_small] == mh_ref_idx).all())
        if not eq_big:
            failures.append("manhattan_stream_b2048_vs_oracle")
        emit({"gate": "manhattan_stream_bf16_1m_b2048", "index_equal": eq_big,
              "qps": round(b_mh / sec), "ms": round(sec * 1e3, 2)})

        # Pallas L1 stage-1 route (round 4): batched manhattan's routed
        # path. Checked against the FULL streamed batch (2048 queries)
        # and, via the shared first 32, the materializing oracle — the
        # k+margin group overfetch must absorb kernel-vs-XLA f32
        # summation-order noise (ops/pallas_l1.py containment argument).
        from hyperdb_tpu.ops.pallas_l1 import rank_top_k_manhattan_pallas

        print("compiling manhattan pallas (b=2048)...", flush=True)
        sec_p, (_, mh_p_idx) = timed(
            lambda qq: rank_top_k_manhattan_pallas(qq, rows, k=k),
            q_big_mh, iters=3, trials=2,
        )
        mh_p_idx = np.asarray(mh_p_idx)
        eq_p = bool((mh_p_idx == np.asarray(mh_big_idx)).all())
        if not eq_p:
            failures.append("manhattan_pallas_vs_stream")
        emit({"gate": "manhattan_pallas_bf16_1m_b2048", "index_equal": eq_p,
              "qps": round(b_mh / sec_p), "ms": round(sec_p * 1e3, 2)})
    except Exception as e:  # noqa: BLE001
        failures.append("manhattan_stream_error")
        emit({"gate": "manhattan_stream_bf16_1m", "error": str(e)[:200]})

    # free the 1M working set before the capacity-scale cases
    del rows, q, q_big, q_m, aux, plane, q_p, v_i8, v_sc, qf, host, vc, rec

    # ---- capacity-scale gates (VERDICT r3 #7): the 10M int8 config —
    # exactness at big-corpus scale in the scripted gate (the 2^24 planar
    # fatal case already ran first, on clean HBM).
    # ---- 10M x 768 int8-pure: grouped scan vs flat int8 reference ----
    try:
        n10, d10 = 10 * (1 << 20), 768  # bucket-aligned 10.5M rows
        chunk10 = 1 << 19
        print(f"building {n10} x {d10} int8 corpus on device...", flush=True)
        t0 = time.time()

        @jax.jit
        def gen_quant_chunk(key):
            # unit rows -> per-row symmetric int8, all on device: the bf16/
            # f32 intermediate exists only at chunk granularity (a full-
            # corpus bf16 intermediate would be 16 GB — more than HBM)
            x = jax.random.normal(key, (chunk10, d10), dtype=jnp.float32)
            norm = jnp.linalg.norm(x, axis=1, keepdims=True)
            x = x / jnp.where(norm == 0, 1.0, norm)
            max_abs = jnp.max(jnp.abs(x), axis=1)
            sc = max_abs / 127.0
            safe = jnp.where(sc == 0, 1.0, sc)
            qi = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(
                jnp.int8
            )
            return qi, sc.astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def write_chunk10(bq, bs, qc, sc, row0):
            bq = jax.lax.dynamic_update_slice(bq, qc, (row0, 0))
            bs = jax.lax.dynamic_update_slice(bs, sc, (row0,))
            return bq, bs

        rows10 = jnp.zeros((n10, d10), dtype=jnp.int8)
        sc10 = jnp.zeros((n10,), dtype=jnp.float32)
        for i, kk in enumerate(
            jax.random.split(jax.random.PRNGKey(3), n10 // chunk10)
        ):
            qc, sc = gen_quant_chunk(kk)
            rows10, sc10 = write_chunk10(
                rows10, sc10, qc, sc, jnp.int32(i * chunk10)
            )
        jax.block_until_ready(sc10)
        print(f"built in {time.time() - t0:.1f}s", flush=True)

        qf10 = jnp.asarray(
            rng.standard_normal((16, d10), dtype=np.float32)
        )

        @jax.jit
        def int8_flat10(qq, vv, ss):
            qi, qs = _quantize_device(qq.astype(jnp.float32))
            s = int8_scores(qi, qs, vv, ss)
            return jax.lax.top_k(s, k)

        print("compiling 10M int8 flat reference (b=16)...", flush=True)
        _, (_, f10_idx) = timed(int8_flat10, qf10, rows10, sc10,
                                iters=3, trials=1)
        print("compiling 10M int8 grouped (b=16)...", flush=True)
        _, (_, g10_idx) = timed(
            lambda qq: rank_top_k_int8(qq, rows10, sc10, k=k),
            qf10, iters=3, trials=1,
        )
        eq = bool((np.asarray(g10_idx) == np.asarray(f10_idx)).all())
        if not eq:
            failures.append("int8_10m_grouped_vs_flat")
        emit({"gate": "int8_grouped_10m_b16", "index_equal": eq})

        qf10b = jnp.asarray(
            rng.standard_normal((256, d10), dtype=np.float32)
        )
        print("timing 10M int8 grouped (b=256)...", flush=True)
        sec, _ = timed(
            lambda qq: rank_top_k_int8(qq, rows10, sc10, k=k),
            qf10b, iters=5, trials=2,
        )
        emit({"gate": "int8_grouped_10m_b256",
              "qps": round(256 / sec), "ms": round(sec * 1e3, 2)})
        del rows10, sc10, qf10, qf10b
    except Exception as e:  # noqa: BLE001
        failures.append("int8_10m_error")
        emit({"gate": "int8_grouped_10m", "error": str(e)[:200]})

    # ---- 2^24-row bf16 MONOLITHIC single-program form: weather canary,
    # LAST. Since the planar promotion production never compiles a
    # monolithic >2^23-row program. This case still runs because a green
    # row proves the single-program ceiling and a red one records helper
    # weather (the 2026-08-19 forensics: monolithic capacity compiles
    # oscillate between green and 6x-consecutive-500 on minute timescales
    # with zero code change). A compile/helper failure is therefore a
    # WARNING; a wrong answer is still fatal. (Runs last so its 12.9 GB
    # build lands on whatever HBM the earlier cases left — the fatal
    # planar case already proved the byte size on clean HBM, first.)
    def monolithic_case():
        n24, d24 = 1 << 24, 384
        print(f"building {n24} x {d24} bf16 corpus on device...", flush=True)
        t0 = time.time()
        rows24 = build_device_corpus(n24, d24, jnp.bfloat16, seed=4)
        print(f"built in {time.time() - t0:.1f}s "
              f"({n24 * d24 * 2 / (1 << 30):.1f} GB)", flush=True)
        b24 = 512  # >= pallas_gmax_f_min_batch: the capacity-proving route
        q24 = jnp.asarray(
            rng.standard_normal((b24, d24), dtype=np.float32), jnp.bfloat16
        )
        print("compiling native reference (2^24, b=8)...", flush=True)
        _, (_, ref24_idx) = timed(native, q24[:8], rows24, iters=3, trials=1)
        ref24_idx = np.asarray(ref24_idx)
        print("compiling routed rank_top_k (2^24, b=512)...", flush=True)
        sec, (_, idx24) = timed(routed, q24, rows24, iters=5, trials=2)
        eq = bool((np.asarray(idx24)[:8] == ref24_idx).all())
        if not eq:
            failures.append("capacity_2p24_vs_native")
        emit({"gate": "routed_bf16_2p24_b512", "index_equal": eq,
              "qps": round(b24 / sec), "ms": round(sec * 1e3, 2)})

    err = _run_capacity(monolithic_case)
    if err is not None:
        warnings.append("capacity_2p24_monolithic_weather")
        emit({"gate": "routed_bf16_2p24_b512", "error": str(err)[:200],
              "nonfatal": True,
              "note": "monolithic form is a canary since the planar "
                      "promotion; production routes planar at this scale"})

    emit({"gate": "verdict", "failures": failures, "warnings": warnings,
          "ok": not failures})
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
