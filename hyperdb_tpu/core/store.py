"""Device-resident vector store with capacity bucketing.

The TPU inversion of the reference's ad-hoc NumPy state (SURVEY.md §7): the
host keeps the mutable master copy (exact shapes, exact dtype for
persistence parity), while queries run against a cached, padded device view:

- ``rows``      f(N_pad, d)  corpus rows, padded with zeros
- ``rows_norm`` f(N_pad, d)  unit-norm rows (cosine fast path)
- ``row_valid`` bool(N_pad)  False on padding
- ``row_docs``  i32(N_pad)   chunk-row -> document index (source_indices)

Padding snaps N to a small set of bucket sizes so XLA compiles one program
per bucket instead of one per corpus size; masks make padding inert. Host
float64 masters are cast to float32 on device (TPUs have no fast f64 path);
float16 masters serve bfloat16 device planes (_DEVICE_DTYPES note).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def bucket_size(n: int, minimum: int = 8) -> int:
    """Smallest padded size >= n from a ~12.5%-granularity bucket ladder."""
    if n <= minimum:
        return minimum
    # Buckets are multiples of 2^(floor(log2(n)) - 3): at most 8 shapes per
    # power of two, overhead bounded by 12.5%.
    step = max(minimum, 1 << max(0, (n - 1).bit_length() - 3))
    return -(-n // step) * step


_DEVICE_DTYPES = {
    # f16 masters serve BF16 device planes: Mosaic has no f16 (the Pallas
    # gmax routes — big-batch bf16 and chunked int8 — would be unreachable
    # from the engine), the MXU runs bf16 natively, and the host f16 master
    # remains the persistence/parity truth. Rounding an f16 significand
    # (10 bits) to bf16 (7 bits) moves scores at the 3rd decimal digit —
    # below every f16-corpus tolerance the suite pins (scoring accumulates
    # in f32 either way).
    np.dtype(np.float16): jnp.bfloat16,
    np.dtype(np.float32): jnp.float32,
    np.dtype(np.float64): jnp.float32,  # no f64 on TPU compute path
}


class _LazyDeviceView(dict):
    """Device view whose full-corpus float planes upload on first access.

    ``dv["rows"]`` / ``dv["rows_norm"]`` materialize via ``__missing__`` so
    every existing subscript site works unchanged; membership tests see only
    what has actually been uploaded. int8-pure views never hold float planes
    and keep raising KeyError for them.

    The view snapshots the host master ndarray it was built from (every
    store mutation REPLACES ``store.vectors`` rather than writing in place),
    so a view held across a mutation keeps materializing the rows it was
    created over — the same snapshot semantics the eager dict had.
    """

    _LAZY_KEYS = ("rows", "rows_norm")
    _LAZY_PLANE_KEYS = ("rows_planes", "rows_norm_planes")

    def __init__(self, store: "VectorStore", vectors):
        super().__init__()
        self._store = store
        self._vectors = vectors

    def __missing__(self, key):
        if key in self._LAZY_KEYS:
            arr = self._store._materialize_plane(
                key, self["n_pad"], self._vectors
            )
            self[key] = arr
            return arr
        if key in self._LAZY_PLANE_KEYS:
            planes = self._store._materialize_split_planes(
                key.removesuffix("_planes"), self["n_pad"], self._vectors
            )
            self[key] = planes
            return planes
        if key == "plane_row_valid":
            bounds = self._store.plane_bounds(self["n_pad"])
            n = self["n"]
            masks = tuple(
                jnp.asarray(
                    (np.arange(a, b) < n) if b > n else np.ones(b - a, bool)
                )
                for a, b in zip(bounds, bounds[1:])
            )
            self[key] = masks
            return masks
        raise KeyError(key)


class VectorStore:
    """Host master arrays + lazily rebuilt padded device views.

    ``precision`` selects the device representation:
      - 'auto'      — bf16 for f16 hosts, f32 otherwise (exact parity)
      - 'int8'      — int8 scan + full-precision rows kept for re-scoring
                      (exact results at int8 scan bandwidth)
      - 'int8-pure' — int8 only: half the HBM of bf16 (10M x 768 fits one
                      v5e chip); dot/cosine only, ~0.98 recall@10
    """

    def __init__(self, fp_dtype, precision: str = "auto"):
        self.fp_dtype = np.dtype(fp_dtype)
        self.precision = precision
        self.vectors: np.ndarray | None = None  # (N, d) host master
        self._device: dict | None = None
        self._host: dict | None = None

    # ---------------- host mutation ----------------

    @property
    def low_precision_device(self) -> bool:
        """True when the device plane is bf16/int8 — i.e. device math
        already rounds/quantizes queries below f32, so an f16 query wire
        (serving upload optimization) costs no additional precision."""
        if self.precision in ("int8", "int8-pure"):
            return True
        return self.fp_dtype == np.float16

    @property
    def num_rows(self) -> int:
        return 0 if self.vectors is None else int(self.vectors.shape[0])

    @property
    def dim(self) -> int | None:
        return None if self.vectors is None else int(self.vectors.shape[1])

    def set(self, vectors: np.ndarray | None) -> None:
        if vectors is None:
            self.vectors = None
        else:
            self.vectors = np.asarray(vectors, dtype=self.fp_dtype)
            if self.vectors.ndim == 1:
                self.vectors = self.vectors[None, :]
        self.invalidate()

    def append(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, dtype=self.fp_dtype)
        if rows.ndim == 1:
            rows = rows[None, :]
        if self.vectors is None or self.vectors.size == 0:
            self.vectors = rows
        else:
            self.vectors = np.concatenate([self.vectors, rows], axis=0)
        self.invalidate()

    def delete_rows(self, row_indices) -> None:
        if self.vectors is None:
            return
        mask = np.ones(self.vectors.shape[0], dtype=bool)
        mask[np.asarray(list(row_indices), dtype=np.int64)] = False
        self.vectors = self.vectors[mask]
        self.invalidate()

    def invalidate(self) -> None:
        self._device = None
        self._host = None

    def host_view(self) -> dict:
        """Cached f32 host arrays for the tiny-corpus host ranking path
        (ops/host_ranking): raw rows and unit-norm rows. Re-normalizing the
        corpus on every query was the dominant per-call cost at demo scale."""
        if getattr(self, "_host", None) is None:
            # f64 masters keep their dtype: the NumPy reference scores f64
            # corpora in f64, and a f32 downcast here would lose low-order
            # score bits relative to it. f16/f32 masters rank in f32 as
            # before (f32 is a superset of both).
            host_dtype = (
                np.float64 if self.fp_dtype == np.float64 else np.float32
            )
            rows = np.ascontiguousarray(self.vectors, dtype=host_dtype)
            norms = np.linalg.norm(rows, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            self._host = {"rows": rows, "rows_norm": rows / norms}
        return self._host

    # ---------------- device views ----------------

    @staticmethod
    def _padded_raw(vectors: np.ndarray, n_pad: int) -> np.ndarray:
        """(n_pad, d) f32 host plane of the raw rows."""
        n, d = vectors.shape
        host = np.zeros((n_pad, d), dtype=np.float32)
        host[:n] = vectors.astype(np.float32, copy=False)
        return host

    def _padded_planes(self, n_pad: int):
        """(n_pad, d) f32 host planes: raw rows and unit-norm rows (the int8
        quantize path needs both at once)."""
        n = self.vectors.shape[0]
        host = self._padded_raw(self.vectors, n_pad)
        norms = np.linalg.norm(host[:n], axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        host_norm = np.zeros_like(host)
        host_norm[:n] = host[:n] / norms
        return host, host_norm

    def _materialize_plane(self, key: str, n_pad: int, vectors=None):
        """Upload ONE lazily requested full-corpus plane ('rows'/'rows_norm').

        Builds only the requested plane — one (n_pad, d) f32 temp, with the
        normalization done in place — so the lazy path never doubles peak
        host memory at 10M-row scale. ``vectors`` is the snapshot the view
        was created over (defaults to the live master).
        """
        if self.precision == "int8-pure":
            raise KeyError(key)  # int8-pure never holds float planes
        if vectors is None:
            vectors = self.vectors
        dev_dtype = _DEVICE_DTYPES.get(self.fp_dtype, jnp.float32)
        n = vectors.shape[0]
        host = self._padded_raw(vectors, n_pad)
        if key == "rows_norm":
            norms = np.linalg.norm(host[:n], axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            host[:n] /= norms
        return jnp.asarray(host.astype(np.dtype(dev_dtype)))

    @staticmethod
    def plane_bounds(n_pad: int) -> list[int]:
        """Row boundaries of the capacity plane split: ``[0, ..., n_pad]``.

        Corpora past ``CONFIG.plane_rows`` split into equal-size device
        planes (plus a remainder plane) so no XLA program ever takes a
        monolithic capacity operand — the round-5 2^24 forensics showed
        the remote compile helper crashing on EVERY monolithic 16M-row
        program while ~10M-row programs compile fine. A single bound pair
        means "not planar"."""
        from hyperdb_tpu.config import CONFIG

        cap = CONFIG.plane_rows
        if cap <= 0 or n_pad <= cap:
            return [0, n_pad]
        bounds = list(range(0, n_pad, cap)) + [n_pad]
        if bounds[-1] - bounds[-2] < cap // 8:
            # fold a tiny remainder into the previous plane rather than
            # compiling a whole extra program shape for it
            del bounds[-2]
        return bounds

    def is_planar(self, n_pad: int) -> bool:
        """True when this corpus' float device planes are split (capacity
        scale; see :meth:`plane_bounds`)."""
        return len(self.plane_bounds(n_pad)) > 2

    def _materialize_split_planes(self, key: str, n_pad: int, vectors=None):
        """Upload one float plane ('rows'/'rows_norm') as SPLIT device
        planes (tuple of (rows_i, d) arrays per :meth:`plane_bounds`).

        Each plane slices and pads its own host window — peak host temp is
        one plane, not the monolith (at 2^24 x 384 the monolithic f32 host
        temp alone would be 25.8 GB)."""
        if self.precision == "int8-pure":
            raise KeyError(key)
        if vectors is None:
            vectors = self.vectors
        dev_dtype = np.dtype(_DEVICE_DTYPES.get(self.fp_dtype, jnp.float32))
        n, d = vectors.shape
        planes = []
        for a, b in zip(self.plane_bounds(n_pad), self.plane_bounds(n_pad)[1:]):
            host = np.zeros((b - a, d), dtype=np.float32)
            lo, hi = a, min(b, n)
            if hi > lo:
                host[: hi - lo] = vectors[lo:hi].astype(np.float32, copy=False)
                if key == "rows_norm":
                    norms = np.linalg.norm(
                        host[: hi - lo], axis=1, keepdims=True
                    )
                    norms[norms == 0] = 1.0
                    host[: hi - lo] /= norms
            planes.append(jnp.asarray(host.astype(dev_dtype)))
        return tuple(planes)

    def device_view(self, source_indices) -> dict:
        """Padded device arrays for the current corpus; cached until the next
        mutation. ``source_indices`` must have one entry per row.

        The two full-corpus float planes — ``rows`` (raw) and ``rows_norm``
        (unit-norm) — each cost a whole-corpus host->device transfer, and a
        cosine-serving DB only ever touches ``rows_norm``. They therefore
        materialize lazily on first subscript (``_LazyDeviceView``), which
        halves upload-dominated large-corpus builds; ``binary_view`` already
        does the same for the hamming/jaccard planes."""
        n = self.num_rows
        if n == 0:
            raise ValueError("Vector store is empty.")
        if self._device is not None and self._device["n"] == n:
            return self._device

        d = self.vectors.shape[1]
        n_pad = bucket_size(n)

        row_sq = np.zeros(n_pad, dtype=np.float32)
        # np.sum keeps NumPy's pairwise per-row summation (einsum's BLAS
        # order shifts the cancellation noise of the expanded euclidean
        # d^2 = |v|^2 - 2qv + |q|^2 near zero distance); cast AND square per
        # chunk so neither the f32 copy of an f16 master nor the squared
        # temp ever exceeds ~256 MB.
        step = max(1, (64 << 20) // max(1, d))
        for s in range(0, n, step):
            chunk = self.vectors[s : s + step].astype(np.float32, copy=False)
            row_sq[s : s + chunk.shape[0]] = np.sum(chunk * chunk, axis=1)

        row_valid = np.zeros(n_pad, dtype=bool)
        row_valid[:n] = True

        src = np.asarray(list(source_indices), dtype=np.int32)
        if src.shape[0] != n:
            raise ValueError(
                f"source_indices length {src.shape[0]} != row count {n}"
            )
        # Padding rows inherit the last doc id so the row->doc map stays
        # non-decreasing (segment reductions can then avoid a general
        # scatter); padded rows are masked to -inf and never win a max.
        pad_doc = src[-1] if n > 0 else 0
        row_docs = np.full(n_pad, pad_doc, dtype=np.int32)
        row_docs[:n] = src

        dv = _LazyDeviceView(self, self.vectors)
        dv.update(
            n=n,
            n_pad=n_pad,
            dim=d,
            row_valid=jnp.asarray(row_valid),
            row_docs=jnp.asarray(row_docs),
            # per-row |v|^2 — the euclidean grouped kernel's epilogue
            # constant (ops/ranking.rank_top_k_grouped_metric); (N_pad,) f32
            # is ~d x smaller than the corpus, so always materialized
            row_sq=jnp.asarray(row_sq),
        )
        if self.precision in ("int8", "int8-pure"):
            from hyperdb_tpu.ops.quantized import quantize_rows

            host, host_norm = self._padded_planes(n_pad)
            q_raw, s_raw = quantize_rows(host)
            q_norm, s_norm = quantize_rows(host_norm)
            dv.update(
                rows_q=jnp.asarray(q_raw),
                row_scales=jnp.asarray(s_raw),
                rowsn_q=jnp.asarray(q_norm),
                rown_scales=jnp.asarray(s_norm),
            )
        self._device = dv
        return self._device

    def binary_view(self, source_indices) -> dict:
        """Binarized (x > 0) 0/1 rows + per-row popcounts for the hamming/
        jaccard grouped kernels. Built lazily on the first binary-metric
        query (it costs another (N_pad, d) device array) and cached on the
        device view until the next mutation.

        Always bf16 regardless of the master dtype: 0/1 operands are exact
        in bf16 and the matmul accumulates in f32 (exact integer counts to
        2^24), so the plane costs half the HBM reads of f32 with identical
        scores — and stays inside the Pallas gmax routes' low-precision
        contract (Mosaic has no f16; f32 planes fail its DEFAULT-precision
        gate)."""
        dv = self.device_view(source_indices)
        if "rows_bin" not in dv:
            host_bin = (self.vectors.astype(np.float32) > 0).astype(np.float32)
            n, d = host_bin.shape
            padded = np.zeros((dv["n_pad"], d), dtype=np.float32)
            padded[:n] = host_bin
            dv["rows_bin"] = jnp.asarray(padded, dtype=jnp.bfloat16)
            dv["row_bin_sum"] = jnp.asarray(np.sum(padded, axis=1))
        return dv

    def pearson_view(self, source_indices) -> dict:
        """Mean-centered unit-norm rows for the pearson grouped fast path.

        pearson(q, v) == dot(center(q)/|center(q)|, center(v)/|center(v)|)
        (ranking_algorithm.py:77-113 algebraically rearranged), so with this
        plane the metric IS dot_product and inherits the grouped / Pallas
        gmax big-batch routes unchanged. Constant rows divide 0/0 -> NaN
        here ON PURPOSE: every ranking kernel scrubs NaN -> -inf right
        after its matmul, which is exactly the reference's "any constant
        vector involved -> NaN -> never ranked" contract (ops/metrics.py
        pearson_scores note). Built lazily on the first big-batch pearson
        query and cached on the device view until the next mutation; dtype
        follows the rows plane (bf16 for f16 masters — Mosaic has no f16)."""
        dv = self.device_view(source_indices)
        if "rows_pearson" not in dv:
            from hyperdb_tpu.ops.metrics import pearson_center_normalize

            # exactly ONE (n_pad, d) f32 host temp, like _materialize_plane:
            # cast-on-assign into the staging buffer, transform in place
            n, d = self.vectors.shape
            padded = np.zeros((dv["n_pad"], d), dtype=np.float32)
            padded[:n] = self.vectors
            pearson_center_normalize(padded[:n])
            dtype = _DEVICE_DTYPES.get(self.fp_dtype, jnp.float32)
            dv["rows_pearson"] = jnp.asarray(padded, dtype=dtype)
        return dv
