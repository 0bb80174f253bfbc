"""Two-stage reduced-rank scan: the TPU-native sub-linear-bytes index.

VERDICT r3 #6 asked for a ScaNN-style design that beats the exact scan at
some measured scale, now that classic IVF gather is measured out on this
hardware (BASELINE.md: a 5%-of-N scattered gather never beats the
contiguous MXU scan, and benchmarks/bw_ladder.py proves the platform caps
HBM streaming at ~230-310 GB/s regardless of access mechanism). At the
bandwidth cap, the only lever left is BYTES PER QUERY BATCH — and the
TPU-shaped way to cut bytes is not LUT gathers (PQ's per-code table lookups
are scatter-shaped, the exact thing this chip hates) but a LOWER-RANK
contiguous scan:

  stage A  scan the corpus projected to d' << d dims (int8): a plain
           (B, d') x (d', N) MXU matmul over an 8-12x smaller matrix,
           grouped exact top-overfetch selection (ops/quantized) — all
           contiguous, all at the bandwidth cap.
  stage B  gather the overfetch winners' FULL int8 rows ((B, c, d) — a few
           hundred MB, the gather regime that measured near-bandwidth in
           decompose_int8_rescore) and rescore exactly; final top-k.

The projection is data-adaptive: top-d' PCA directions estimated from a
row sample (covariance on device, eigendecomposition host-side — d x d is
tiny). For real embedding corpora (effective rank << d) stage A preserves
ranking well; for isotropic Gaussian data it degrades like sqrt(d'/d) —
the honest benchmark (benchmarks/bench_projscan.py) measures both regimes
and records the crossover.

Replaces the Annoy role (/root/reference/hyperdb/hyperdb.py:198-220) at
scales where the exact scan's corpus read dominates; like every index
here, results degrade to the exact scan out of contract.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from hyperdb_tpu.ops.quantized import (
    _quantize_device,
    quantize_rows,
    rank_top_k_int8,
)

NEG_INF = float("-inf")

# Below this captured-variance fraction the reduced-rank stage A is
# measurably lossy at serving overfetch budgets (flat-spectrum 10M runs:
# 1/6 captured -> 0.19-0.41 recall@10) — warn at build so the opt-in is
# informed, not silent.
FLAT_SPECTRUM_WARN = 0.5


def _warn_if_flat(captured: float, d_prime: int, d: int) -> None:
    if d_prime < d and captured < FLAT_SPECTRUM_WARN:
        from hyperdb_tpu.utils.log import warn

        warn(
            "INFO: projscan stage-A keeps "
            f"{100.0 * captured:.0f}% of corpus variance at d'={d_prime} "
            "(flat spectrum) — recall will be poor; prefer the exact scan "
            "(unset HYPERDB_PROJSCAN_THRESHOLD) or raise "
            "HYPERDB_PROJSCAN_DPRIME/OVERFETCH"
        )


def fit_projection(
    sample_rows: np.ndarray, d_prime: int, seed: int = 0
) -> tuple[np.ndarray, float]:
    """(d, d') PCA projection from a host row sample (d x d covariance on
    the sample; eigh host-side — d is hundreds, the decomposition is free).

    Returns ``(p, captured)`` where ``captured`` is the fraction of the
    sample's total variance the top-d' directions carry — the build-time
    predictor of stage-A recall (measured: a flat spectrum at d'=128/768
    keeps 1/6 of the variance and recall@10 lands at 0.19-0.41 even with
    4096-row overfetch; see BASELINE.md projscan_crossover).

    Ties/degenerate spectra fall back to orthonormalized Gaussian columns
    so the projection is always full rank (captured reported as the
    isotropic d'/d in that case)."""
    x = np.asarray(sample_rows, dtype=np.float32)
    d = x.shape[1]
    d_prime = min(d_prime, d)
    cov = (x.T @ x) / max(1, x.shape[0])
    try:
        w, v = np.linalg.eigh(cov)  # ascending
        p = v[:, ::-1][:, :d_prime]
        total = float(np.sum(w))
        captured = (
            float(np.sum(w[::-1][:d_prime])) / total if total > 0 else 1.0
        )
    except np.linalg.LinAlgError:
        rng = np.random.default_rng(seed)
        p, _ = np.linalg.qr(rng.standard_normal((d, d_prime)))
        captured = d_prime / d
    return np.ascontiguousarray(p, dtype=np.float32), float(captured)


class ProjScanIndex:
    """Reduced-rank int8 stage-A corpus + exact int8 stage-B rescore.

    Device state:
      p_dev     (d, d') f32 projection
      a_i8      (n_pad, d') int8 projected corpus (row-quantized)
      a_scales  (n_pad,) f32
    Stage-B full rows are NOT duplicated here — the caller passes its
    existing int8 (or float) corpus plane to :meth:`search`.
    """

    is_ann = True
    kind = "projscan"

    def __init__(self, proj: np.ndarray, a_i8, a_scales, num_rows: int,
                 num_valid: int | None = None,
                 captured_variance: float | None = None):
        self.proj = np.asarray(proj, dtype=np.float32)
        # fraction of corpus variance the projection keeps (None when the
        # index predates the diagnostic); the build-time recall predictor
        self.captured_variance = (
            None if captured_variance is None else float(captured_variance)
        )
        self.p_dev = jnp.asarray(self.proj)
        self.a_i8 = a_i8
        self.a_scales = a_scales
        self.num_rows = int(num_rows)  # the padded row space
        # real (non-pad) rows: pad rows quantize to zero scores and would
        # otherwise surface from probe() whenever budget >= real rows or
        # real similarities go negative — and the engine then indexes
        # source_indices out of bounds (review r3 finding)
        self.num_valid = int(num_valid if num_valid is not None else num_rows)
        self.d = int(self.proj.shape[0])
        self.d_prime = int(self.proj.shape[1])
        self._valid_mask = (
            None
            if self.num_valid >= self.num_rows
            else jnp.asarray(np.arange(self.num_rows) < self.num_valid)
        )

    # ------------------------------------------------------------ build

    @classmethod
    def build_from_device_rows(
        cls,
        rows_dev,
        num_rows: int,
        d_prime: int = 96,
        sample: int = 1 << 17,
        chunk: int = 1 << 20,
        seed: int = 0,
        num_valid: int | None = None,
        min_variance: float | None = None,
    ) -> "ProjScanIndex | None":
        """Build from an (n_pad, d) device corpus (any float dtype or a
        (v_i8, v_scales) tuple) without materializing it on host: a strided
        row sample fits the projection, then the corpus projects and
        quantizes on device chunk by chunk.

        ``min_variance``: decline the build (return None) when the top-d'
        directions capture less than this fraction of the sample variance —
        the spectrum check costs only the sample + a d x d eigh, so a
        flat-spectrum corpus never pays for (or serves from) a projected
        plane whose recall is known-poor (BASELINE.md projscan_crossover)."""
        dequant = isinstance(rows_dev, tuple)
        n_pad = int(rows_dev[0].shape[0] if dequant else rows_dev.shape[0])
        d = int(rows_dev[0].shape[1] if dequant else rows_dev.shape[1])
        # Lane alignment: a d' that is not a multiple of the 128-lane tile
        # makes every stage-A operand sub-tile (measured: the remote
        # Mosaic/XLA compiler crashes or hangs on d'=96 int8 at 10M rows).
        # Serving dims are 128-padded, so round d' UP; tiny corpora (tests,
        # d < 128) keep the raw rank.
        if d >= 128:
            d_prime = min(d, -(-d_prime // 128) * 128)

        def chunk_f32(lo: int, hi: int, step: int = 1) -> jax.Array:
            if dequant:
                v_i8, v_sc = rows_dev
                return (
                    v_i8[lo:hi:step].astype(jnp.float32)
                    * v_sc[lo:hi:step, None]
                )
            return rows_dev[lo:hi:step].astype(jnp.float32)

        # Row sample for the projection fit: ~64 windows of 4096 rows,
        # strided down to ~``sample`` rows total. The stride is derived
        # from the VISITED row count and applied on the device slice, so
        # the fit actually sees ~sample rows and only those rows cross
        # the tunnel (review r3: the old num_rows-derived stride inside
        # each window undercounted ~38x AND shipped every full
        # dequantized 4096-row chunk host-side first — ~800 MB per build
        # at 10M x 768, repaid on every mutation's rebuild).
        windows = [
            (lo, min(lo + 4096, num_rows))
            for lo in range(0, num_rows, max(4096, num_rows // 64))
        ]
        visited = sum(hi - lo for lo, hi in windows)
        stride = max(1, visited // sample)
        host_sample = np.concatenate(
            [np.asarray(chunk_f32(lo, hi, stride)) for lo, hi in windows]
        )
        proj, captured = fit_projection(host_sample, d_prime, seed=seed)
        _warn_if_flat(captured, proj.shape[1], d)
        if min_variance is not None and captured < min_variance:
            from hyperdb_tpu.utils.log import info

            info(
                "INFO: projscan declined — captured variance "
                f"{100.0 * captured:.0f}% < min {100.0 * min_variance:.0f}%; "
                "using the exact scan"
            )
            return None
        p_dev = jnp.asarray(proj)

        @jax.jit
        def project_quant(x):
            a = jnp.dot(x, p_dev, preferred_element_type=jnp.float32)
            return _quantize_device(a)

        parts_q, parts_s = [], []
        for lo in range(0, n_pad, chunk):
            hi = min(lo + chunk, n_pad)
            qi, sc = project_quant(chunk_f32(lo, hi))
            parts_q.append(qi)
            parts_s.append(sc)
        a_i8 = jnp.concatenate(parts_q, axis=0) if len(parts_q) > 1 else parts_q[0]
        a_sc = jnp.concatenate(parts_s, axis=0) if len(parts_s) > 1 else parts_s[0]
        return cls(proj, a_i8, a_sc, num_rows, num_valid=num_valid,
                   captured_variance=captured)

    @classmethod
    def build(cls, rows: np.ndarray, d_prime: int = 96, seed: int = 0):
        """Host build (small/medium corpora, tests)."""
        rows = np.asarray(rows, dtype=np.float32)
        n = rows.shape[0]
        proj, captured = fit_projection(
            rows[:: max(1, n // (1 << 16))], d_prime, seed
        )
        _warn_if_flat(captured, proj.shape[1], rows.shape[1])
        a = rows @ proj
        a_i8, a_sc = quantize_rows(a)
        return cls(proj, jnp.asarray(a_i8), jnp.asarray(a_sc), n,
                   captured_variance=captured)

    # ------------------------------------------------------------ search

    def search(
        self,
        queries,
        rescore_i8,
        rescore_scales,
        k: int,
        overfetch: int = 256,
        row_mask=None,
        recency=None,
    ):
        """Two-stage top-k.

        ``queries``: (B, d) float (pre-normalized by the caller for cosine —
        same contract as the int8-pure scan). ``rescore_i8``/``rescore_scales``:
        the FULL-dimension int8 corpus plane (the int8-pure store's own).
        Exactly reproduces int8-pure ranking whenever the true top-k of the
        full int8 scores survives stage A's top-``overfetch``; recall is a
        property of the data's spectrum (measured, not assumed).
        """
        if not isinstance(queries, jax.Array):
            queries = jnp.asarray(np.asarray(queries, dtype=np.float32))
        return projscan_search(
            self.p_dev, self.a_i8, self.a_scales,
            queries.astype(jnp.float32),
            rescore_i8, rescore_scales,
            k, overfetch,
            row_mask, recency,
        )

    def probe(self, query_vector, budget: int) -> np.ndarray:
        """Q12 candidate-budget surface (engine single-query pre-filter):
        the stage-A projected scan IS the coarse quantizer here — return
        the ``budget`` best rows by projected score."""
        q = np.asarray(query_vector, dtype=np.float32).reshape(1, -1)
        qa = jnp.dot(
            jnp.asarray(q), self.p_dev, preferred_element_type=jnp.float32
        )
        k = max(1, min(int(budget), self.num_valid))
        _, idx = rank_top_k_int8(
            qa, self.a_i8, self.a_scales, k=k, row_mask=self._valid_mask
        )
        out = np.asarray(idx[0])
        return out[out < self.num_valid]

    # ----------------------------------------------------------- persist

    def state(self) -> dict:
        return {
            "kind": "projscan",
            "proj": self.proj,
            "a_i8": np.asarray(self.a_i8),
            "a_scales": np.asarray(self.a_scales),
            "num_rows": np.asarray(self.num_rows),
            "num_valid": np.asarray(self.num_valid),
            "captured_variance": np.asarray(
                -1.0 if self.captured_variance is None
                else self.captured_variance
            ),
        }

    @classmethod
    def from_state(cls, state: dict) -> "ProjScanIndex":
        cv = float(state.get("captured_variance", -1.0))
        return cls(
            state["proj"],
            jnp.asarray(state["a_i8"]),
            jnp.asarray(state["a_scales"]),
            int(state["num_rows"]),
            num_valid=int(state.get("num_valid", state["num_rows"])),
            captured_variance=None if cv < 0 else cv,
        )


import functools  # noqa: E402

# Stage-A selection granularity: groups of 16 rows. Finer than the scan
# kernels' 128 (a 128-group's max hides its other 127 rows — measured
# recall loss), coarse enough that stage B's (B, G, 16, d) gather stays
# contiguous and bounded.
STAGE_GROUP = 16


def _gmax_int8_xla(qa_i8, qa_scale, a_i8, a_scales, extra, n_chunks):
    """(B, g) per-group maxes of the rescaled projected int8 scores.

    Compiler-friendly formulation learned the hard way (the first cut used
    a 3-D (g, 16, d') int8 rhs and a d'=96 corpus — 16 sublanes is under
    int8's 32-sublane min tile and 96 lanes under the 128-lane tile, and
    the remote Mosaic/XLA compiler either crashed (HTTP 500) or hung on
    it): the matmul stays the proven 2-D ``int8_scores`` shape
    (B, d') x (rows, d'), d' is 128-aligned by the index builder, and the
    16-wide group max is a lane-dim ``reduce_window`` — no reshape of the
    score tensor, no sub-tile operands. The per-chunk (B, rows_c) f32
    epilogue is bounded by the lax.scan chunking (ops/quantized
    discipline)."""
    n, dp = a_i8.shape
    b = qa_i8.shape[0]
    rows_c = n // n_chunks
    rc = a_i8.reshape(n_chunks, rows_c, dp)
    sc = a_scales.reshape(n_chunks, rows_c)
    ec = extra.reshape(n_chunks, rows_c)

    def body(_, inp):
        chunk, chunk_sc, chunk_ex = inp
        s = jax.lax.dot_general(
            qa_i8, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, rows_c) int32
        s = s.astype(jnp.float32) * (
            qa_scale[:, None] * chunk_sc[None, :]
        ) + chunk_ex[None, :]
        s = jnp.where(jnp.isnan(s), NEG_INF, s)
        gm = jax.lax.reduce_window(
            s, NEG_INF, jax.lax.max,
            window_dimensions=(1, STAGE_GROUP),
            window_strides=(1, STAGE_GROUP),
            padding="VALID",
        )  # (B, rows_c / STAGE_GROUP)
        return None, gm

    _, parts = jax.lax.scan(body, None, (rc, sc, ec))  # (n_chunks, B, gc)
    return jnp.moveaxis(parts, 0, 1).reshape(b, n // STAGE_GROUP)


@functools.partial(jax.jit, static_argnames=("G", "n_chunks"))
def _stage_a(p_dev, a_i8, a_scales, q, G, n_chunks, row_mask=None,
             recency=None):
    """Project + quantize queries, scan the projected corpus to per-group
    maxes, return the (B, G) winning group ids."""
    qa = jnp.dot(q, p_dev, preferred_element_type=jnp.float32)
    qa_i8, qa_scale = _quantize_device(qa)
    n = a_i8.shape[0]
    extra = jnp.zeros((n,), dtype=jnp.float32)
    if recency is not None:
        extra = extra + recency.astype(jnp.float32)
    if row_mask is not None:
        extra = jnp.where(row_mask, extra, NEG_INF)
    gm = _gmax_int8_xla(qa_i8, qa_scale, a_i8, a_scales, extra, n_chunks)
    _, gidx = jax.lax.top_k(gm, G)
    return gidx


@functools.partial(jax.jit, static_argnames=("k", "sg"))
def _stage_b_tile(q_tile, rescore_i8, rescore_scales, gidx_tile, k,
                  sg=STAGE_GROUP, row_mask=None, recency=None):
    """Exact full-d rescore of one query tile's winning groups.

    Mirrors the PROVEN rank_top_k_int8 rescore formulation exactly
    (flat row gather + f32 einsum — decompose_int8_rescore measured this
    shape on chip); one tile per dispatch keeps the gathered block a few
    hundred MB and the program small (the fused scan-over-tiles variant
    hung the remote compiler)."""
    d = rescore_i8.shape[1]
    t, G = gidx_tile.shape
    c = G * sg
    rows_t = (
        gidx_tile[:, :, None] * sg
        + jnp.arange(sg, dtype=gidx_tile.dtype)[None, None, :]
    ).reshape(t, c)  # (t, c) global row ids, sg-row-contiguous
    q_i8, q_scale = _quantize_device(q_tile)
    sub = rescore_i8[rows_t]  # (t, c, d) int8 gather
    cs = jnp.einsum(
        "td,tcd->tc",
        q_i8.astype(jnp.float32),
        sub.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    cs = cs * (q_scale[:, None] * rescore_scales[rows_t])
    if recency is not None:
        cs = cs + recency[rows_t]
    if row_mask is not None:
        cs = jnp.where(row_mask[rows_t], cs, NEG_INF)
    cs = jnp.where(jnp.isnan(cs), NEG_INF, cs)
    vals_t, pos_t = jax.lax.top_k(cs, k)
    return vals_t, jnp.take_along_axis(rows_t, pos_t, axis=-1).astype(jnp.int32)


def projscan_search(
    p_dev, a_i8, a_scales, q, rescore_i8, rescore_scales, k, overfetch,
    row_mask=None, recency=None,
):
    """Group-granular two-stage search (host-orchestrated).

    Stage A reduces the projected corpus to per-16-row-group maxes (a
    chunked contiguous scan — the cheap part) and selects the top
    ``G = max(k, overfetch/16)`` GROUPS. Stage B rescores those groups'
    FULL-dimension int8 rows exactly, one query tile per dispatch. The
    two stages are SEPARATE device programs on purpose: the fused form
    (stage A scan + gather + einsum in one jit) hung or crashed the
    remote Mosaic/XLA compiler at 10M rows, while each half alone uses
    only shapes proven on this platform. With a full-rank projection the
    result is EXACT (top-k rows' groups are always among the top-k groups
    by max — the ops/ranking containment argument); at low rank, recall
    rises with ``overfetch`` (counted in rows, granted in whole groups).
    """
    from hyperdb_tpu.ops.quantized import _pick_chunks

    n, d = rescore_i8.shape
    b = q.shape[0]

    # On the real chip, stage A rides the Pallas gmax kernel (128-row
    # groups, score tile never leaves VMEM): the XLA group-16 form
    # measured 950 ms/batch at 10M x 768 b2048 — its (B, rows_chunk)
    # epilogue re-materializes in HBM, the exact disease ops/pallas_gmax
    # exists to cure. Granularity costs recall per candidate row, so the
    # Pallas path is paired with whole-128-row grants; the group-16 XLA
    # path remains for CPU/tests and out-of-contract shapes.
    from hyperdb_tpu.ops.quantized import _use_pallas_gmax

    if _use_pallas_gmax(b, n, int(a_i8.shape[1])):
        from hyperdb_tpu.ops import pallas_gmax as _pg

        sg = _pg.GROUP  # 128
        g = n // sg
        G = min(g, max(k, -(-overfetch // sg)))
        qa = jnp.dot(q, p_dev, preferred_element_type=jnp.float32)
        qa_i8, qa_scale = _quantize_device(qa)
        extra = _pg.make_extra(n, row_mask, recency)
        gm = _pg.gmax_int8(qa_i8, qa_scale, a_i8, a_scales, extra)
        _, gidx = jax.lax.top_k(gm, G)
        return _stage_b(
            q, rescore_i8, rescore_scales, gidx, k, sg, row_mask, recency
        )

    sg = STAGE_GROUP
    g = n // sg
    G = min(g, max(k, -(-overfetch // sg)))

    # Stage A is query-tiled as well: its (tile_a, g) group-max output is
    # the largest intermediate (g = n/16 — 5 GB at b=2048 x 10M rows,
    # a measured OOM), while re-reading the d' projected corpus per tile
    # costs single-digit ms against the stage's matmul compute.
    tile_a = b
    while tile_a > 8 and tile_a * g * 4 > (1 << 30):
        tile_a //= 2
    # ragged last tile (one extra compile) beats reverting to the full
    # batch, which would silently bypass the OOM bound (review r3)
    n_chunks = _pick_chunks(tile_a, n, STAGE_GROUP)
    if tile_a == b:
        gidx = _stage_a(
            p_dev, a_i8, a_scales, q, G, n_chunks, row_mask, recency
        )
    else:
        gidx = jnp.concatenate(
            [
                _stage_a(
                    p_dev, a_i8, a_scales, q[lo : lo + tile_a], G,
                    n_chunks, row_mask, recency,
                )
                for lo in range(0, b, tile_a)
            ],
            axis=0,
        )
    return _stage_b(
        q, rescore_i8, rescore_scales, gidx, k, sg, row_mask, recency
    )


def _stage_b(q, rescore_i8, rescore_scales, gidx, k, sg, row_mask, recency):
    """Query-tiled exact rescore of the winning groups (host loop)."""
    b = q.shape[0]
    d = rescore_i8.shape[1]
    G = gidx.shape[1]
    # tile height: gathered (tile, G*sg, d) f32 stays under ~1 GB;
    # the last tile may be ragged (one extra program shape)
    tile = b
    while tile > 8 and tile * G * sg * d * 4 > (1 << 30):
        tile //= 2
    vals_parts, idx_parts = [], []
    for lo in range(0, b, tile):
        vt, it = _stage_b_tile(
            q[lo : lo + tile], rescore_i8, rescore_scales,
            gidx[lo : lo + tile], k, sg, row_mask, recency,
        )
        vals_parts.append(vt)
        idx_parts.append(it)
    if len(vals_parts) == 1:
        return vals_parts[0], idx_parts[0]
    return jnp.concatenate(vals_parts, 0), jnp.concatenate(idx_parts, 0)
