"""Engine configuration.

The reference's configuration surface is constructor kwargs plus two module
constants (SURVEY.md §5). Those kwargs are preserved verbatim on
:class:`hyperdb_tpu.HyperDB`; this module adds the engine-level knobs the
reference hardcodes, overridable via environment variables for deployment.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int):
    def read() -> int:
        try:
            return int(os.environ.get(name, default))
        except ValueError:
            return default

    return field(default_factory=read)


def _env_float(name: str, default: float):
    def read() -> float:
        try:
            return float(os.environ.get(name, default))
        except ValueError:
            return default

    return field(default_factory=read)


@dataclass
class EngineConfig:
    # Corpora with at least this many rows build an IVF index at ingest and
    # route eligible queries through it. DISABLED by default: on TPU the
    # exact scan wins every measured regime — single-query at 1M rows the
    # engine serves 59 ms exact vs 164 ms IVF (probe + scattered candidate
    # gather; results.jsonl single_query_ivf_vs_exact), batched it wins
    # 30-480x (see batch_ivf_min_rows below), and skipping the k-means
    # build also removes a ~2 min ingest tax at 1M. Both IVF costs are
    # structural on this hardware: a 5%-of-N scattered gather cannot beat
    # a contiguous full scan riding HBM bandwidth on the MXU. The full IVF
    # path (build, probe, budget contract, recall 0.98 at the reference's
    # 5% budget — BASELINE config 3) remains available: set the env var to
    # a row count to re-enable.
    ivf_threshold: int = _env_int("HYPERDB_IVF_THRESHOLD", 1 << 62)
    # IVF cluster count; 0 = sqrt-scaled default (index/ivf.py).
    ivf_nlist: int = _env_int("HYPERDB_IVF_NLIST", 0)
    # Two-stage reduced-rank scan (index/projscan.py): int8-pure corpora
    # with at least this many rows build a PCA-d' stage-A index and serve
    # dot/cosine through stage-A scan + exact int8 rescore of the
    # overfetch winners. Opt-in like IVF (1<<62 disables): the recall cost
    # depends on the corpus spectrum — benchmarks/bench_projscan.py holds
    # the measured crossover; enable when its numbers fit your corpus.
    projscan_threshold: int = _env_int("HYPERDB_PROJSCAN_THRESHOLD", 1 << 62)
    # Stage-A rank (projected dimension) and candidate overfetch per query.
    projscan_dprime: int = _env_int("HYPERDB_PROJSCAN_DPRIME", 96)
    projscan_overfetch: int = _env_int("HYPERDB_PROJSCAN_OVERFETCH", 256)
    # Decline the projscan build (exact scan instead) when the top-d' PCA
    # directions capture less than this fraction of the sample variance:
    # the cheap build-time spectrum check predicts stage-A recall
    # (measured flat-spectrum floor: 1/6 captured -> 0.19-0.41 recall@10,
    # BASELINE.md projscan_crossover). 0 disables the gate.
    projscan_min_variance: float = _env_float(
        "HYPERDB_PROJSCAN_MIN_VARIANCE", 0.5
    )
    # Token window for document chunking (reference MAX_LENGTH=510).
    max_tokens: int = _env_int("HYPERDB_MAX_TOKENS", 510)
    # Default embedding dimension for the hermetic hash encoder.
    embed_dim: int = _env_int("HYPERDB_EMBED_DIM", 384)
    # Minimum corpus row count before query_batch routes through the batched
    # IVF path (shared probe frontier). Disabled by default: measured at 2M
    # and 4M rows x 384d f16 on v5e (benchmarks/bench_ivf_crossover.py,
    # results.jsonl ivf_crossover), the exact masked scan wins by 30-200x
    # (2M b64: 58 ms vs 1.8 s; 4M b64: 61 ms vs 4.6 s per batch). The loss
    # is structural, not a tuning miss: at the reference's Q12 budget (5% of
    # N per query) the probed-cluster union across a 64+-query block covers
    # most of the corpus, so the path pays a scattered gather of ~N rows
    # plus a (B, union) host-side validity upload, while the exact scan
    # streams N rows contiguously at full HBM bandwidth. Single-query IVF
    # (shared-nothing latency path) is unaffected. Set the env var to a row
    # count to re-enable, 0 to force.
    batch_ivf_min_rows: int = _env_int("HYPERDB_BATCH_IVF_MIN_ROWS", 1 << 62)
    # Minimum padded row count before dot/cosine scans use the grouped
    # (group-max + rescore) exact top-k instead of native TopK. Measured 3x
    # at (256 queries, 1M rows) on v5e (benchmarks/ab_grouped_topk3.py);
    # 0 disables.
    grouped_topk_min_rows: int = _env_int("HYPERDB_GROUPED_TOPK_MIN_ROWS", 262144)
    # Route the int8 scan's stage 1 through the Pallas gmax kernel
    # (ops/pallas_gmax.py) when the XLA grouped epilogue would have to chunk
    # (ops/quantized._pick_chunks > 1): measured 2.2x there (10M x 768 int8
    # batch 256: 23.1 vs 50.5 ms, index-identical — benchmarks/ab_gmax.py),
    # tie at batch 64, and a loss at 1M bf16 SMALL batch (big bf16 batches
    # route too — see pallas_gmax_f_min_batch below). 0 disables both.
    pallas_gmax: int = _env_int("HYPERDB_PALLAS_GMAX", 1)
    # Minimum query-batch height before FLOAT (bf16) dot-form grouped scans
    # also route stage 1 through the Pallas gmax kernel. Below it XLA fuses
    # the group-max into the matmul epilogue and wins (b<=256: 5.46 vs
    # 6.37 ms at 1M x 384 bf16); above it XLA materializes the (B, g, group)
    # f32 epilogue in HBM and Pallas wins — measured 1.16x at b=512, 1.20x
    # at b=1024, 1.56x at b=2048 (25.2 vs 39.2 ms), index-identical
    # (benchmarks/ab_gmax.py, results.jsonl ab_gmax_dot_1m_384_bf16).
    # 0 disables the float route (int8 routing is HYPERDB_PALLAS_GMAX).
    pallas_gmax_f_min_batch: int = _env_int(
        "HYPERDB_PALLAS_GMAX_F_MIN_BATCH", 512
    )
    # Minimum query-batch height before big-corpus manhattan scans route
    # stage 1 through the Pallas L1 kernel (ops/pallas_l1.py) instead of
    # the streamed XLA scan. Manhattan is VPU-bound either way, but the
    # kernel's throughput is FLAT in batch (~2.4k q/s at 1M x 384 bf16)
    # where the XLA stream collapses: measured on chip 2.08x at b=64,
    # 1.10x at b=256, 2.40x at b=1024, 2.85x at b=2048, index-identical
    # at every shape (benchmarks/probe_l1.py, results.jsonl probe_l1,
    # 2026-08-19). Below 64 queries the kernel shape is unmeasured and
    # the stream is adequate. 0 disables.
    pallas_l1_min_batch: int = _env_int("HYPERDB_PALLAS_L1_MIN_BATCH", 64)
    # Transposed-corpus L1 stage 1 (ops/pallas_l1.gmax_l1t, round 5): rows
    # on LANES turn the d-reduce into dense sublane folds instead of the
    # 7-level lane tree that dominates the in-place kernel (~2x by vreg
    # accounting; A/B in benchmarks/probe_l1t.py). Costs one corpus
    # transpose copy per call, so it engages only under the module's HBM
    # cap. 0 disables (in-place sublane kernel everywhere).
    pallas_l1t: int = _env_int("HYPERDB_PALLAS_L1T", 1)
    # Subgroup width for two-level grouped selection on the Pallas float
    # route: stage 1 emits per-SUB-row maxes alongside the 128-row group
    # maxes (one corpus read, swapped-orientation kernel), selection
    # refines top-k groups -> top-k subgroups, and stage 3 gathers only
    # (B, k, SUB, d) candidate rows — 4x less rescore gather traffic at
    # SUB=32. Measured on chip at 1M x 384 bf16 top-10 (probe_sub32,
    # 2026-08-19, index-identical): b=2048 23.8 -> 18.0 ms (86k -> 114k
    # q/s), b=4096 42.8 -> 32.3 ms (96k -> 127k q/s); SUB=64 is worse
    # (19.4/35.3 ms). Exactness: a subgroup holding a true top-j row has
    # submax >= s_j, so < k subgroups can outrank it (same containment
    # argument as groups, applied twice). Must divide 128; 0 disables.
    # HYPERDB_PALLAS_SUB_DUAL picks the stage-1 emission form: 1 = the
    # kernel writes group AND subgroup maxes (round-4 form), 0 = subgroup
    # maxes only with the group maxes derived by one XLA max outside
    # (bitwise identical). Default 0 (single) since round 5: measured
    # index-identical and slightly faster at 1M b=2048 (18.29 vs
    # 18.74 ms, probe_2p24_sub 2026-08-19), and it is one program shape
    # instead of two. The 2^24 compile story turned out environmental,
    # not form-specific: in the degraded helper window ALL forms (dual,
    # single, and the pre-round-4 single-level that compiled at 01:56)
    # crash the remote compile helper at capacity scale while 1M-class
    # programs compile fine — see ROADMAP round-5 notes.
    # (single-level selection, the pre-round-4 behavior). Beyond the
    # measured d=384 b>=2048 wins, the other engaged dims are chip-smoked
    # every round by tpu_gate (pallas_sub_bf16_256k_d768_b128 — ADVICE r4
    # #3: an unprobed-shape Mosaic failure must surface in the gate, not
    # in production).
    pallas_subgroup: int = _env_int("HYPERDB_PALLAS_SUBGROUP", 32)
    pallas_sub_dual: int = _env_int("HYPERDB_PALLAS_SUB_DUAL", 0)
    # Maximum corpus blocks per Mosaic grid on the gmax stage-1 kernels.
    # Grids past this cap split into windows of at most this many blocks —
    # separate pallas_calls over the SAME operands with block-offset index
    # maps (no slicing, no copies; ops/pallas_gmax._windows) whose small
    # stage-1 outputs concatenate. Motivation (round 5): the remote compile
    # helper's degraded windows are capacity-program-hostile and OSCILLATE
    # on minute timescales — on 2026-08-19, 683-block sub32 windows at
    # 2^24 compiled and ran index-identical at 20:39 (probe_2p24_ctl,
    # 9.8k q/s), 1024-block windows of the same kernel then 500'd six
    # consecutive times 20:45-20:56, and the 683-block form itself 500'd
    # again at 21:02. Smaller windows compiled strictly more often in
    # every observed state, so the default stays at the smallest cap that
    # was green on chip (683-real-block windows under cap 768); the 10M
    # int8 shape (1280 blocks) runs as 2 x 640 windows, re-proven by the
    # gate every round. The ROBUST capacity answer is one level up:
    # CONFIG.plane_rows keeps >2^23-row corpora as split planes so no
    # monolithic capacity program exists at all. Windowing is exact (each
    # window computes its own blocks' maxes; concat reassembles stage 1
    # bit-for-bit) — pinned in tests/test_pallas_gmax.py. 0 disables
    # (monolithic grids at any n).
    pallas_max_grid_blocks: int = _env_int(
        "HYPERDB_PALLAS_MAX_GRID_BLOCKS", 768
    )
    # Single-chip capacity corpora are stored as SEPARATE device planes of
    # at most this many rows: the engine ranks each plane with the routed
    # program (one cached compile per plane shape — the ~10M-row class the
    # gate proves every round) and merges the per-plane winners exactly
    # (ops/ranking.rank_top_k_planar). Motivation (round 5): grid
    # windowing above was NOT sufficient — in the same degraded-helper
    # window, every monolithic 2^24-row program (including plain
    # dot+top_k) crashed or wedged the remote compile helper, so capacity
    # scans must never compile against a monolithic capacity operand at
    # all. 2^23 rows (8.4M) keeps every proven gate shape monolithic and
    # splits only beyond-10M corpora. 0 disables (monolithic planes at
    # any n). Exactness pinned in tests/test_ranking.py (planar == the
    # monolithic router, all metrics, ties included).
    plane_rows: int = _env_int("HYPERDB_PLANE_ROWS", 1 << 23)
    # Serialize per-plane programs (host-retire each before dispatching the
    # next) once the planes' total bytes reach this threshold. Async plane
    # pipelining is only safe while HBM can hold TWO in-flight plane
    # programs' stage-1/top-k temps next to the planes themselves; at
    # capacity scale the planes pin most of HBM and co-resident temps are
    # exactly the clean-HBM OOM the 2026-08-20 gate run caught (see
    # ops/ranking.rank_top_k_planar). 8 GiB leaves sub-capacity multi-plane
    # corpora fully pipelined. 0 disables (always async).
    planar_serial_bytes: int = _env_int(
        "HYPERDB_PLANAR_SERIAL_BYTES", 8 << 30
    )
    # Rank on the host (NumPy) when corpus_rows * batch is at most this many
    # score cells: every device call pays the platform's 25-30 ms round trip
    # (BASELINE.md), which dwarfs compute for tiny corpora — the 151-doc demo
    # runs ~70x faster on host. 0 disables (tests pin the device paths this
    # way and check host/device equality separately in test_host_path.py).
    host_path_max_cells: int = _env_int("HYPERDB_HOST_PATH_MAX_CELLS", 65536)
    # Pad query_batch's batch dimension up to the next power of two before
    # it reaches a device program (pad rows duplicate row 0 and are sliced
    # off the results — bitwise-identical outputs). Every DISTINCT batch
    # size is a fresh XLA compile (30-90 s over this platform's remote
    # compiler), and serving workloads produce arbitrary group sizes (the
    # server's dynamic batcher flushes whatever coalesced in the window) —
    # bucketing caps the program count at log2(max_batch) while the padded
    # rows' compute is noise against the dispatch+corpus-read floor
    # (BASELINE.md platform model). 0 disables (exact-shape programs).
    batch_bucket: int = _env_int("HYPERDB_BATCH_BUCKET", 1)
    # NOTE: the hand-written Pallas fused scan was RETIRED in round 2 after
    # losing to the XLA grouped formulation at every batch size that matters
    # (1M x 384 bf16, ms/batch — benchmarks/results.jsonl
    # ab_fused_smallbatch: b=1 3.61 vs 3.19; b=32 4.91 vs 4.53; b=256
    # 15.2 vs 4.7 from round 1; its b=8/b=64 wins were within the tunnel's
    # run-to-run variance). The grouped matmul + group-max epilogue keeps
    # XLA's software pipelining and beats per-tile hand scheduling here.


CONFIG = EngineConfig()
