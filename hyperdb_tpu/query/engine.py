"""The query engine.

TPU-first reformulation of the reference's ``_execute_query``
(/root/reference/hyperdb/hyperdb.py:1429-1582): instead of filtering Python
object lists and branching between an approximate ANN-ordered path and a
NumPy brute-force path, every query becomes

    masks (host, vectorized)  ->  one fused device program
    (score matmul + NaN scrub + mask + recency + segment-max + top-k)

with the ANN (IVF) index acting purely as a *candidate mask generator*.
Candidates are always re-scored exactly — the reference's quirk of returning
raw ANN distances in ANN order (SURVEY.md Q3) is consciously fixed, since
exact scoring is effectively free on the MXU.

Preserved reference semantics (SURVEY.md §2.4):
- Q4  — the ANN+recency path returns (doc, combined_score) 2-tuples.
- Q10 — the triple-layered metric naming and ANN-metric mapping.
- Q11 — metric/index mismatch silently (print-only) degrades to brute force.
- Q12 — ANN candidate budget max(top_k*20, ceil(N*ann_percent/100)).
- Q13 — filters emptying the candidate set trigger a full-corpus refilter;
        still-empty results return [] with an INFO print.
- Q16/Q17 — recency reads timestamps from the documents via nested lookup,
        requires the key in metadata_keys, raises on missing values, and
        adds recency_bias * exp(t - max(t)) over the *surviving* documents.
- Q20 — soft failures print and return rather than raise.
"""

from __future__ import annotations

import functools as _functools
import time as _time

import numpy as np

import jax
import jax.numpy as jnp

from hyperdb_tpu.core.nested import get_nested_value
from hyperdb_tpu.core.store import bucket_size
from hyperdb_tpu.ops import ranking as _ranking
from hyperdb_tpu.ops.metrics import METRICS
from hyperdb_tpu.ops.ranking import rank_docs_top_k, rank_gathered, rank_top_k
from hyperdb_tpu.query import filters as _filters
from hyperdb_tpu.utils import log
from hyperdb_tpu.utils.devio import fetch

# Query metric -> constructor/ANN metric (reference hyperdb.py:1453-1459);
# jaccard/pearson have no ANN mapping and always run brute force (Q10).
METRIC_TO_ANN = {
    "dot_product": "dot",
    "cosine_similarity": "cosine",
    "euclidean_metric": "euclidean",
    "manhattan_distance": "manhattan",
    "hamming_distance": "hamming",
}


def _pad_pow2(k: int) -> int:
    return 1 << max(0, (k - 1)).bit_length() if k > 1 else 1


def _grouped_group(n_pad: int, batch: int) -> int:
    """Resolved group size for the grouped kernels, or 0 when the corpus is
    too small / not group-divisible (one halving rule for every caller)."""
    from hyperdb_tpu.config import CONFIG

    if CONFIG.grouped_topk_min_rows <= 0 or n_pad < CONFIG.grouped_topk_min_rows:
        return 0
    group = _ranking._auto_group(batch)
    while group >= 32 and n_pad % group:
        group //= 2
    return group if group >= 32 and n_pad % group == 0 else 0


def _grouped_ok(n_pad: int, batch: int) -> bool:
    """Corpus large enough (and group-divisible) for the grouped kernels."""
    return _grouped_group(n_pad, batch) > 0


def is_numeric_array(array: np.ndarray) -> bool:
    return np.issubdtype(array.dtype, np.number) and not np.issubdtype(
        array.dtype, np.complexfloating
    )


def generate_and_validate_query_vector(db, query_input) -> np.ndarray:
    """String -> embedding; array-like -> validated (reference
    hyperdb.py:1197-1216). Returns a 1-D float32 vector."""
    # Hot-path shortcut: an already-valid (d,) f32 vector needs no copy and
    # no dtype introspection (both measurable per-query costs at demo scale).
    if (
        isinstance(query_input, np.ndarray)
        and query_input.dtype == np.float32
        and query_input.ndim == 1
        and query_input.size
        and (db.dim is None or query_input.shape[0] == db.dim)
    ):
        return query_input
    try:
        if isinstance(query_input, str):
            emb = db.embedding_function([query_input])[0]
            query_vector = np.squeeze(np.asarray(emb, dtype=np.float32))
            if query_vector.ndim == 2:  # chunked long query: average chunks
                query_vector = query_vector.mean(axis=0)
        elif isinstance(query_input, (list, np.ndarray, tuple)):
            arr = np.array(query_input)
            if not is_numeric_array(arr):
                raise ValueError("Numeric array-like query_input expected.")
            if arr.ndim > 2:
                raise ValueError("query_input must be a 1D or 2D array.")
            if arr.ndim == 1:
                arr = arr[None, :]
            if db.dim is not None and arr.shape[1] != db.dim:
                raise ValueError(
                    f"The dimension of the query_vector ({arr.shape[1]}) must "
                    f"match the dimension of the vectors in the database ({db.dim})."
                )
            query_vector = np.squeeze(arr.astype(np.float32))
        else:
            raise ValueError(
                "query_input must be either a string or a numeric array-like object."
            )
        if query_vector.size == 0:
            raise ValueError("The generated query vector is empty.")
        return query_vector
    except Exception as e:
        print(f"An exception occurred due to invalid input: {e}")
        raise


def generate_query_vectors_batch(db, texts) -> np.ndarray:
    """Embed a BLOCK of query texts in one encoder pass -> (B, d) f32.

    The batched twin of the string branch of
    :func:`generate_and_validate_query_vector` (reference hyperdb.py:1112-1117
    embeds one query at a time): one tokenizer pass + one bucketed encoder
    forward for the whole block, with long queries (>510 tokens) averaged
    over their chunks exactly like the single-query path. Serving
    front-ends batch text queries through this (native/server.py tag 3).
    """
    if not isinstance(texts, (list, tuple)) or not all(
        isinstance(t, str) for t in texts
    ):
        raise ValueError("texts must be a list of strings")
    if not texts:
        return np.zeros((0, db.dim or 0), dtype=np.float32)
    emb, src, _ = db.embedding_function(list(texts))
    emb = np.asarray(emb, dtype=np.float32)
    src = np.asarray(src, dtype=np.int64)
    if emb.shape[0] == len(texts) and np.array_equal(
        src, np.arange(len(texts))
    ):
        return emb
    # chunked long queries: mean over each text's chunk vectors (parity
    # with generate_and_validate_query_vector's 2-D mean)
    out = np.zeros((len(texts), emb.shape[1]), dtype=np.float32)
    np.add.at(out, src, emb)
    counts = np.bincount(src, minlength=len(texts)).astype(np.float32)
    return out / np.maximum(counts, 1.0)[:, None]


def _default_embed_path(db):
    """``(embedder, prepare_fn)`` when ``db`` embeds through the default
    chunk-then-encode pipeline, ``(None, None)`` for custom embedding
    functions (whose internals we cannot keep on device)."""
    fn = db.embedding_function
    if fn == getattr(db, "get_embedding", None):
        return db._embedder(), db.prepare_texts_and_indices
    emb = getattr(fn, "embedder", None)
    tok = getattr(fn, "tokenizer", None)
    if emb is not None and tok is not None:
        from hyperdb_tpu.core import chunker as _chunker

        return emb, lambda docs: _chunker.prepare_texts_and_indices(docs, tok)
    return None, None


def generate_query_vectors_batch_device(db, texts):
    """Device-resident twin of :func:`generate_query_vectors_batch` for the
    serving text hot path.

    The host path pays two tunnel round trips per flush: the encoder's
    embedding readback, then the query block's re-upload (~25 ms each,
    benchmarks/probe_readback.py). Here the encoder output stays on device
    and the scan chains on it as a dispatch argument — one round trip total.

    Returns a committed ``(b_pad, d)`` float32 ``jax.Array`` with ``b_pad``
    = next power of two >= ``len(texts)`` (the encoder pads batch shapes to
    its bounded program set; pad rows are finite garbage — pass
    ``n_valid=len(texts)`` to the batch query so results slice them off).
    Returns None whenever the block cannot stay on device, and the caller
    must fall back to :func:`generate_query_vectors_batch`: custom
    embedding functions, embedders without ``encode_device`` (hash/hybrid
    compute on host), or long texts that chunk (>510 tokens — the chunk
    mean is host arithmetic, reference hyperdb.py:1112-1117 parity).
    """
    if not isinstance(texts, (list, tuple)) or not all(
        isinstance(t, str) for t in texts
    ):
        raise ValueError("texts must be a list of strings")
    if not texts:
        return None
    embedder, prepare = _default_embed_path(db)
    if embedder is None or not hasattr(embedder, "encode_device"):
        return None
    chunk_texts, src, _ = prepare(list(texts))
    if len(chunk_texts) != len(texts) or not np.array_equal(
        np.asarray(src), np.arange(len(texts))
    ):
        return None
    return embedder.encode_device(chunk_texts)


def handle_timestamps(db, recency_bias, timestamp_key, doc_indices) -> np.ndarray | None:
    """Recency term over surviving documents (reference hyperdb.py:1310-1346).

    Returns a dense (num_docs,) f32 array (zeros outside ``doc_indices``) or
    None when recency_bias == 0.
    """
    if recency_bias == 0:
        return None
    if timestamp_key is None:
        timestamp_key = "timestamp"
    if timestamp_key not in db.metadata_keys:
        raise ValueError(
            f"The timestamp_key '{timestamp_key}' must be present in "
            f"metadata_keys when recency_bias is not 0."
        )
    num_docs = len(db.documents)
    cache = getattr(db, "_timestamp_cache", None)
    if len(doc_indices) == num_docs and cache is not None:
        # Serving fast path (no filters => every doc): the per-doc nested
        # lookup loop is seconds of host Python at 1M docs per call; the
        # full-corpus timestamp vector is immutable between mutations
        # (_on_mutation clears this cache). Partial index sets keep the
        # loop — the reference's "missing timestamp raises" contract (Q16)
        # must only consider the SURVIVING documents there.
        t = cache.get(timestamp_key)
        if t is None:
            timestamps = [
                get_nested_value(doc, [timestamp_key])
                for doc in db.documents
            ]
            if any(ts is None for ts in timestamps):
                raise ValueError(
                    "All timestamps must be populated when recency_bias is "
                    "not 0 or timestamp_key is provided."
                )
            t = np.asarray(timestamps, dtype=np.float64)
            cache[timestamp_key] = t
        return (recency_bias * np.exp(t - t.max())).astype(np.float32)
    timestamps = [
        get_nested_value(db.documents[i], [timestamp_key]) for i in doc_indices
    ]
    if any(t is None for t in timestamps):
        raise ValueError(
            "All timestamps must be populated when recency_bias is not 0 "
            "or timestamp_key is provided."
        )
    t = np.asarray(timestamps, dtype=np.float64)
    dense = np.zeros(len(db.documents), dtype=np.float32)
    dense[np.asarray(doc_indices, dtype=np.int64)] = (
        recency_bias * np.exp(t - t.max())
    ).astype(np.float32)
    return dense


def execute_query(
    db,
    query_input,
    top_k: int = 5,
    return_similarities: bool = True,
    filters=None,
    recency_bias: float = 0,
    timestamp_key=None,
    metric: str = "cosine_similarity",
    ann_percent: int = 5,
):
    start_time = _time.perf_counter()
    num_docs = len(db.documents)
    if db.vectors is None or len(db.vectors) == 0 or not db.documents:
        raise Exception("The database is empty. Cannot proceed with the query.")
    if metric not in METRICS:
        raise ValueError(
            f"Invalid metric '{metric}'. Supported: "
            "'dot_product', 'cosine_similarity', 'euclidean_metric', "
            "'manhattan_distance', 'jaccard_similarity', "
            "'pearson_correlation', 'hamming_distance'"
        )

    query_vector = generate_and_validate_query_vector(db, query_input)
    if query_vector.ndim != 1:
        # Batched input to the single-query API: use the first row (the
        # batched surface is db.query_batch).
        query_vector = query_vector[0]

    ann_metric = METRIC_TO_ANN.get(metric)
    use_ann = ann_metric == db.ann_metric
    if not use_ann:
        log.info(
            f"INFO: Metric '{metric}' is not supported by the current ANN "
            f"index ('{db.ann_metric}'). Bruteforce method used instead."
        )

    # ---- skip_doc first (reference hyperdb.py:1474-1481) ----
    base_mask = np.ones(num_docs, dtype=bool)
    filters = list(filters) if filters is not None else None
    if filters:
        for name, params in filters:
            if name not in _filters.FILTER_NAMES:
                raise ValueError(f"Invalid filter name {name}")
            if name == "skip_doc":
                base_mask &= _filters.skip_doc_mask(num_docs, params)
                break

    # ---- ANN pre-filter: candidate rows + doc mask (Q12) ----
    mask = base_mask.copy()
    cand_rows = None
    if (
        use_ann
        and db.ann_index is not None
        and db.ann_index.is_ann
        # projscan accelerates inside _rank_block (its two-stage search
        # requires cand_rows is None); a probe here would run a stage-A
        # scan plus a budget-sized (5% of N) device top_k whose output the
        # int8-pure ranker then CANNOT use — every query strictly slower
        # than no index (review r3). Skip it; the mask path stays exact.
        and getattr(db.ann_index, "kind", None) != "projscan"
    ):
        budget = max(top_k * 20, -(-int(base_mask.sum()) * ann_percent // 100))
        cand_rows = db.ann_index.probe(query_vector, budget)
        cand_docs = np.zeros(num_docs, dtype=bool)
        if cand_rows.size:
            src = np.asarray(db.source_indices, dtype=np.int64)
            cand_docs[src[cand_rows]] = True
        mask &= cand_docs

    # ---- remaining filters as masks ----
    override = None
    if filters:
        mask, override = _filters.apply_filters(db, filters, mask)

    # ---- empty-candidate fallback (Q13) ----
    if not mask.any():
        if filters:
            log.info(
                "INFO: Falling back to brute-force search after no results "
                "from ANN pre-filtering."
            )
            cand_rows = None
            mask, override = _filters.apply_filters(db, filters, base_mask.copy())
        else:
            log.info("INFO: No document matches your query.")
            return []
    if not mask.any():
        log.info(
            "INFO: No document matches your query with the brute-force "
            "method and the current filters."
        )
        return []

    surviving = int(mask.sum())
    if top_k > surviving:
        log.info(
            f"Warning: top_k ({top_k}) is greater than the number of filtered "
            f"documents ({surviving}). Setting top_k to {surviving}."
        )
        top_k = surviving
    if surviving == 1:
        # Reference stdout parity: its ranking function prints this when
        # exactly ONE score row remains (ranking_algorithm.py:188-190,
        # len(scores) == 1). Score rows are chunk rows on the plain path
        # (a surviving multi-chunk doc stays silent) but ONE AVERAGED
        # vector per doc on the key-filter path (hyperdb.py filter_by_key
        # dedups by doc), so an override always fires at surviving == 1.
        if override is not None:
            log.info("Info: Only one document left.")
        else:
            src = np.asarray(db.source_indices, dtype=np.int64)
            if int((src == int(np.flatnonzero(mask)[0])).sum()) == 1:
                log.info("Info: Only one document left.")

    recency = (
        None
        if recency_bias == 0
        else handle_timestamps(db, recency_bias, timestamp_key, np.flatnonzero(mask))
    )

    with db.stats.phase("query.rank"):
        doc_ids, scores_out = _rank(
            db, query_vector, mask, override, recency, metric, top_k,
            cand_rows=cand_rows,
        )

    db.stats.record("query.execute", _time.perf_counter() - start_time)
    results = []
    ann_recency_path = use_ann and recency_bias != 0
    for doc_id, score in zip(doc_ids, scores_out):
        document = db.documents[doc_id]
        if not return_similarities:
            results.append(document)
        elif ann_recency_path:
            # Q4 shape parity: (doc, combined_score) 2-tuples — but with the
            # combined score computed from *exact* similarities, not raw ANN
            # distances (conscious fix of the reference bug).
            results.append((document, float(score)))
        else:
            # source index == originating document index; equals the
            # reference's source_indices[documents.index(doc)] in every
            # tested configuration (SURVEY.md Q1).
            results.append((document, float(score), int(doc_id)))
    return results


def execute_query_batch(
    db,
    query_inputs,
    top_k: int = 5,
    return_similarities: bool = True,
    filters=None,
    recency_bias: float = 0,
    timestamp_key=None,
    metric: str = "cosine_similarity",
    ann_percent: int = 5,
    n_valid: int | None = None,
):
    """Batched multi-query search: the filter masks are computed once and the
    whole (B, d) query block rides a single fused device program. Per-query
    results have the same shape as :func:`execute_query`'s."""
    doc_ids, scores_out = execute_query_batch_arrays(
        db,
        query_inputs,
        top_k=top_k,
        filters=filters,
        recency_bias=recency_bias,
        timestamp_key=timestamp_key,
        metric=metric,
        ann_percent=ann_percent,
        n_valid=n_valid,
    )
    results = []
    for b in range(doc_ids.shape[0]):
        row = []
        for doc_id, score in zip(doc_ids[b], scores_out[b]):
            document = db.documents[int(doc_id)]
            if return_similarities:
                row.append((document, float(score), int(doc_id)))
            else:
                row.append(document)
        results.append(row)
    return results


def execute_query_batch_arrays(
    db,
    query_inputs,
    top_k: int = 5,
    filters=None,
    recency_bias: float = 0,
    timestamp_key=None,
    metric: str = "cosine_similarity",
    ann_percent: int = 5,
    n_valid: int | None = None,
):
    """Array-level core of :func:`execute_query_batch`.

    Returns ``(doc_ids, scores)`` as ``(B, k)`` int64 / float32 NumPy
    arrays with ``k = min(top_k, surviving docs)`` (``k == 0`` when
    filters eliminate everything). Serving front-ends use this directly:
    assembling B*k ``(document, score, id)`` Python tuples costs more than
    the whole device dispatch at serving batch sizes, and a wire protocol
    only needs the ids and scores (documents hydrate separately by id).

    ``query_inputs`` may be a committed 2-D ``jax.Array`` (the device-
    resident text hot path, :func:`generate_query_vectors_batch_device`):
    the block rides the scan dispatch as a device argument — never fetched,
    reshaped, or padded here, so its batch dim should already be a power of
    two (arbitrary batch dims compile fresh per-shape programs, 30-90 s
    each over this platform's remote compiler). ``n_valid`` limits how many
    leading rows are real queries; results are sliced to it (pad rows'
    compute is noise against the dispatch floor)."""
    num_docs = len(db.documents)
    start_time = _time.perf_counter()
    if db.vectors is None or len(db.vectors) == 0 or not db.documents:
        raise Exception("The database is empty. Cannot proceed with the query.")
    if metric not in METRICS:
        raise ValueError(f"Invalid metric '{metric}'.")

    device_block = isinstance(query_inputs, jax.Array) and query_inputs.ndim == 2
    if device_block:
        # Device-resident query block: already committed f32 on device
        # (encode_device contract); fetching or re-staging it here would
        # spend the round trip the path exists to save.
        q_block = query_inputs
    elif isinstance(query_inputs, np.ndarray) and query_inputs.ndim == 2:
        # float16 blocks are preserved end-to-end (low-precision wire
        # opt-in, serving front-ends): host->device upload measures
        # ~30-60 MB/s on this platform, so halving the query bytes saves
        # ~36 ms per 1024-query flush (benchmarks/probe_readback.py
        # upload_f16_1024). Device math is unchanged — norms accumulate in
        # f32 and matmuls keep f32 accumulation; an f16 corpus already
        # rounds the query to f16 before the matmul (_match_low_precision).
        q_block = (
            query_inputs
            if query_inputs.dtype == np.float16
            else query_inputs.astype(np.float32)
        )
    else:
        q_block = np.stack(
            [generate_and_validate_query_vector(db, q) for q in query_inputs]
        ).astype(np.float32)
    if db.dim is not None and q_block.shape[1] != db.dim:
        raise ValueError(
            f"The dimension of the query vectors ({q_block.shape[1]}) must "
            f"match the dimension of the vectors in the database ({db.dim})."
        )

    # Batch-dim bucketing (HYPERDB_BATCH_BUCKET): pad B up to the next
    # power of two with copies of row 0, slice the pad rows off the
    # results. Every distinct B is a fresh XLA compile — 30-90 s over this
    # platform's remote compiler — and serving flushes arbitrary group
    # sizes (server._DynamicBatcher); the pad rows' compute is noise
    # against the dispatch+read floor. Host-path-sized corpora skip it
    # (no compile to amortize, and padding could push them onto the
    # device path).
    from hyperdb_tpu.config import CONFIG as _CFG

    b_real = q_block.shape[0]
    if (
        not device_block  # device blocks arrive pre-padded (encode_device)
        and _CFG.batch_bucket
        and db._store.num_rows * b_real > _CFG.host_path_max_cells
    ):
        b_pad = _pad_pow2(b_real)
        if b_pad != b_real:
            q_block = np.concatenate(
                [q_block, np.repeat(q_block[:1], b_pad - b_real, axis=0)]
            )

    base_mask = np.ones(num_docs, dtype=bool)
    filters = list(filters) if filters is not None else None
    if filters:
        for name, params in filters:
            if name not in _filters.FILTER_NAMES:
                raise ValueError(f"Invalid filter name {name}")
            if name == "skip_doc":
                base_mask &= _filters.skip_doc_mask(num_docs, params)
                break
    mask = base_mask.copy()
    override = None
    if filters:
        mask, override = _filters.apply_filters(db, filters, mask)
    n_out = b_real if n_valid is None else min(int(n_valid), b_real)
    if not mask.any():
        return (
            np.zeros((n_out, 0), dtype=np.int64),
            np.zeros((n_out, 0), dtype=np.float32),
        )

    surviving = int(mask.sum())
    k = min(top_k, surviving)
    recency = (
        None
        if recency_bias == 0
        else handle_timestamps(db, recency_bias, timestamp_key, np.flatnonzero(mask))
    )

    doc_ids = scores_out = None
    from hyperdb_tpu.config import CONFIG

    if (
        METRIC_TO_ANN.get(metric) == db.ann_metric
        and db.ann_index is not None
        and getattr(db.ann_index, "is_ann", False)
        and hasattr(db.ann_index, "probe_batch")
        and override is None
        and not device_block  # IVF probing is host arithmetic; a device
        # block would pay the fetch this path exists to avoid — the exact
        # masked scan below stays fully device-resident (and exact)
        and num_docs == db._store.num_rows
        and num_docs >= CONFIG.batch_ivf_min_rows
        and db._store.precision != "int8-pure"
    ):
        budget = max(top_k * 20, -(-int(base_mask.sum()) * ann_percent // 100))
        doc_ids, scores_out = _rank_block_ivf(
            db, q_block, mask, recency, metric, k, budget
        )
    if doc_ids is None:
        doc_ids, scores_out = _rank_block(
            db, q_block, mask, override, recency, metric, k
        )

    db.stats.record("query.batch_arrays", _time.perf_counter() - start_time)
    db.stats.bump("query.batch_queries", n_out)
    # pad rows (batch bucketing / pre-padded device blocks) are dropped here
    return (
        np.asarray(doc_ids[:n_out], dtype=np.int64),
        np.asarray(scores_out[:n_out], dtype=np.float32),
    )


def _rank_block_ivf(db, q_block, mask, recency, metric, top_k, budget):
    """Batched IVF: shared probe frontier over the query block.

    One centroid matmul ranks clusters for every query; the union of probed
    clusters is gathered ONCE and the whole (B, d) block scores it in one
    matmul, with a per-query (B, U) validity matrix restricting each query to
    the clusters it probed. Queries whose masked candidate count falls below
    ``top_k`` fall back to the exact masked scan (the batched analogue of the
    reference's empty-ANN-set fallback, SURVEY.md Q13). Returns None when
    probing yields nothing, signalling the caller to brute-force the block.
    """
    cand_ids, valid = db.ann_index.probe_batch(q_block, budget)
    if cand_ids.size == 0:
        return None, None
    valid = valid & mask[cand_ids][None, :]

    counts = valid.sum(axis=1)
    need_fallback = np.flatnonzero(counts < top_k)
    ivf_rows = np.flatnonzero(counts >= top_k)

    nq = q_block.shape[0]
    doc_ids = np.zeros((nq, top_k), dtype=np.int64)
    scores_out = np.full((nq, top_k), -np.inf, dtype=np.float32)

    if ivf_rows.size:
        dv = db._store.device_view(db.source_indices)
        c_pad = bucket_size(int(cand_ids.size))
        ids = np.zeros(c_pad, dtype=np.int32)
        ids[: cand_ids.size] = cand_ids
        valid_pad = np.zeros((ivf_rows.size, c_pad), dtype=bool)
        valid_pad[:, : cand_ids.size] = valid[ivf_rows]
        rec_c = None
        if recency is not None:
            rc = np.zeros(c_pad, dtype=np.float32)
            rc[: cand_ids.size] = recency[cand_ids]
            rec_c = jnp.asarray(rc)
        prenorm = metric == "cosine_similarity"
        k_eff = min(min(_pad_pow2(top_k), bucket_size(len(db.documents))), c_pad)
        vals, idx = rank_gathered(
            jnp.asarray(q_block[ivf_rows]),
            dv["rows_norm"] if prenorm else dv["rows"],
            jnp.asarray(ids),
            jnp.asarray(valid_pad),
            k=k_eff,
            metric=metric,
            recency=rec_c,
            prenormalized=prenorm,
        )
        idx_h, vals_h = fetch(idx, vals)  # one round trip, not two
        doc_ids[ivf_rows] = idx_h[:, :top_k]
        scores_out[ivf_rows] = vals_h[:, :top_k]

    if need_fallback.size:
        fb_ids, fb_vals = _rank_block(
            db, q_block[need_fallback], mask, None, recency, metric, top_k
        )
        doc_ids[need_fallback] = fb_ids
        scores_out[need_fallback] = fb_vals

    return doc_ids, scores_out


def _rank(db, query_vector, mask, override, recency, metric, top_k, cand_rows=None):
    doc_ids, vals = _rank_block(
        db, query_vector[None, :], mask, override, recency, metric, top_k,
        cand_rows=cand_rows,
    )
    return doc_ids[0], vals[0]


@jax.jit
def _normalize_rows_dev(q):
    """Row-normalize a device-resident query block (f32 accumulation);
    the device twin of the int8 path's host-side pre-normalization."""
    q32 = q.astype(jnp.float32)
    n = jnp.linalg.norm(q32, axis=1, keepdims=True)
    return q32 / jnp.where(n == 0, 1.0, n)


@_functools.partial(jax.jit, static_argnames=("dtype",))
def _pearson_rows_dev(q, dtype):
    """Center + unit-normalize a device-resident query block for the
    pearson-as-dot plane (store.pearson_view). No zero guard ON PURPOSE:
    a constant query row divides 0/0 -> NaN, and the ranking kernels'
    NaN -> -inf scrub reproduces the reference's constant-vector contract."""
    q32 = q.astype(jnp.float32)
    qc = q32 - jnp.mean(q32, axis=1, keepdims=True)
    n = jnp.linalg.norm(qc, axis=1, keepdims=True)
    return (qc / n).astype(dtype)


def _rank_block(db, q_block, mask, override, recency, metric, top_k, cand_rows=None):
    """Run the fused device program; returns ((B, k) doc_ids, (B, k) scores)."""
    from hyperdb_tpu.config import CONFIG

    num_docs = len(db.documents)

    # Tiny-corpus host fast path: the device round trip (25-30 ms on this
    # platform) dwarfs the compute below this cell count, so rank straight
    # on the host master arrays (ops/host_ranking — result-identical, pinned
    # by tests/test_host_path.py). cand_rows is ignored: the mask already
    # carries the ANN candidate restriction and the full tiny scan is exact.
    n_q = (
        int(q_block.shape[0])
        if hasattr(q_block, "shape")
        else int(np.asarray(q_block).shape[0])
    )
    cells = db._store.num_rows * max(1, n_q)
    if 0 < cells <= CONFIG.host_path_max_cells:
        from hyperdb_tpu.ops.host_ranking import rank_block_host

        if isinstance(q_block, jax.Array):
            # tiny-corpus host ranking needs host rows; the fetch costs the
            # round trip the device path saves, but below this cell count
            # the device dispatch would cost the same round trip anyway
            q_block = np.asarray(q_block)

        if override is not None:
            vals, idx = rank_block_host(
                q_block, override, top_k, metric,
                doc_mask=mask, recency=recency,
            )
        else:
            hv = db._store.host_view()
            if num_docs == db._store.num_rows:
                vals, idx = rank_block_host(
                    q_block, hv["rows"], top_k, metric,
                    doc_mask=mask, recency=recency,
                    rows_norm=hv["rows_norm"],
                )
            else:
                vals, idx = rank_block_host(
                    q_block, hv["rows"], top_k, metric,
                    doc_mask=mask, recency=recency,
                    row_docs=np.asarray(db.source_indices, dtype=np.int64),
                    num_docs=num_docs,
                    rows_norm=hv["rows_norm"],
                )
        return idx, vals

    if isinstance(q_block, jax.Array):
        # device-resident block (text hot path): committed f32 already on
        # device — it rides the dispatch as a device argument, and the scan
        # program is the same one an uploaded f32 block compiles.
        q = q_block
    else:
        # host array on purpose: a jit argument's upload rides the dispatch
        # (measured ~3-12 ms cheaper per call than an explicit jnp.asarray
        # round — benchmarks/probe_readback.py arg_np vs arg_explicit).
        # f16 blocks stay f16 (halved upload bytes; see
        # execute_query_batch_arrays), everything else is canonical f32.
        q = np.asarray(q_block)
        if q.dtype != np.float16:
            q = np.asarray(q, dtype=np.float32)
        q = np.ascontiguousarray(q)
    k_pad = min(_pad_pow2(top_k), bucket_size(num_docs))

    # IVF fast path: gather + score only the candidate rows. Applies to the
    # canonical unchunked corpus (rows == docs) without key-filter overrides;
    # all other shapes fall back to the masked full scan (still exact —
    # the doc mask already carries the ANN candidate restriction, Q12).
    # int8-pure stores keep no float rows to gather from: they fall through
    # to the masked int8 scan below.
    if (
        cand_rows is not None
        and override is None
        and num_docs == db._store.num_rows
        and cand_rows.size
        and db._store.precision != "int8-pure"
    ):
        cand = cand_rows[mask[cand_rows]]
        if cand.size:
            dv = db._store.device_view(db.source_indices)
            c_pad = bucket_size(int(cand.size))
            ids = np.zeros(c_pad, dtype=np.int32)
            ids[: cand.size] = cand
            valid = np.zeros(c_pad, dtype=bool)
            valid[: cand.size] = True
            rec_c = None
            if recency is not None:
                rc = np.zeros(c_pad, dtype=np.float32)
                rc[: cand.size] = recency[cand]
                rec_c = jnp.asarray(rc)
            prenorm = metric == "cosine_similarity"
            k_eff = min(k_pad, c_pad)
            vals, idx = rank_gathered(
                q,
                dv["rows_norm"] if prenorm else dv["rows"],
                jnp.asarray(ids),
                jnp.asarray(valid),
                k=k_eff,
                metric=metric,
                recency=rec_c,
                prenormalized=prenorm,
            )
            idx_h, vals_h = fetch(idx, vals)
            return idx_h[:, :top_k], vals_h[:, :top_k]

    if override is not None:
        # Key-filter path: per-document override vectors (rows == docs).
        d_pad = bucket_size(num_docs)
        padded = np.zeros((d_pad, override.shape[1]), dtype=np.float32)
        padded[:num_docs] = override
        mask_pad = np.zeros(d_pad, dtype=bool)
        mask_pad[:num_docs] = mask
        rec_pad = None
        if recency is not None:
            rec_pad = np.zeros(d_pad, dtype=np.float32)
            rec_pad[:num_docs] = recency
            rec_pad = jnp.asarray(rec_pad)
        vals, idx = rank_top_k(
            q,
            jnp.asarray(padded),
            k=k_pad,
            metric=metric,
            row_mask=jnp.asarray(mask_pad),
            recency=rec_pad,
        )
    elif num_docs == db._store.num_rows:
        # Unchunked corpus: rows ARE docs — rank rows directly. This avoids
        # the segment-max reduction entirely (its scatter lowering is very
        # slow on TPU at large N) and is the common big-corpus shape.
        dv = db._store.device_view(db.source_indices)
        n_pad = dv["n_pad"]
        if mask.all():
            # no filters: reuse the device-resident validity mask instead of
            # uploading a fresh (N,) bool array per query
            row_mask_dev = dv["row_valid"]
        else:
            row_mask = np.zeros(n_pad, dtype=bool)
            row_mask[:num_docs] = mask
            row_mask_dev = jnp.asarray(row_mask)
        rec_pad = rec_host = None
        if recency is not None:
            rec_host = np.zeros(n_pad, dtype=np.float32)
            rec_host[:num_docs] = recency
            rec_pad = jnp.asarray(rec_host)
        prenorm = metric == "cosine_similarity"
        precision = db._store.precision
        if precision in ("int8", "int8-pure") and metric in (
            "dot_product",
            "cosine_similarity",
        ):
            from hyperdb_tpu.ops.quantized import rank_top_k_int8

            qq = q
            if prenorm:
                if isinstance(q, jax.Array):
                    # device blocks normalize in ONE jitted program (shapes
                    # bounded by the pow2 batch buckets); fetching for the
                    # host math below would spend the saved round trip
                    qq = _normalize_rows_dev(q)
                else:
                    # host-side on purpose: jnp here would be two extra
                    # device dispatches per call (norm + divide) outside the
                    # jit; f32 accumulation, result back at the wire dtype
                    q32 = np.asarray(q, dtype=np.float32)
                    qn = np.linalg.norm(q32, axis=1, keepdims=True)
                    qn[qn == 0] = 1.0
                    qq = np.ascontiguousarray((q32 / qn).astype(q.dtype))
            psidx = db.ann_index
            if (
                getattr(psidx, "kind", None) == "projscan"
                and precision == "int8-pure"
                and METRIC_TO_ANN.get(metric) == db.ann_metric  # Q11
                and psidx.num_rows == n_pad
                and cand_rows is None
            ):
                # Opt-in two-stage reduced-rank scan (index/projscan,
                # HYPERDB_PROJSCAN_THRESHOLD): stage A scans the PCA-d'
                # int8 corpus, stage B rescores the overfetch winners on
                # the store's full int8 plane — same plane the exact scan
                # reads, so scores are true (quantized) similarities.
                vals, idx = psidx.search(
                    qq,
                    dv["rowsn_q"] if prenorm else dv["rows_q"],
                    dv["rown_scales"] if prenorm else dv["row_scales"],
                    k=min(k_pad, n_pad),
                    overfetch=CONFIG.projscan_overfetch,
                    row_mask=row_mask_dev,
                    recency=rec_pad,
                )
            else:
                rescore = None
                if precision == "int8":
                    rescore = dv["rows_norm"] if prenorm else dv["rows"]
                vals, idx = rank_top_k_int8(
                    qq,
                    dv["rowsn_q"] if prenorm else dv["rows_q"],
                    dv["rown_scales"] if prenorm else dv["row_scales"],
                    k=min(k_pad, n_pad),
                    row_mask=row_mask_dev,
                    recency=rec_pad,
                    rescore_rows=rescore,
                )
        elif precision == "int8-pure":
            raise ValueError(
                f"device_precision='int8-pure' supports only dot_product and "
                f"cosine_similarity on the device scan (got '{metric}'); use "
                "device_precision='int8' or 'auto' for other metrics."
            )
        elif db._store.is_planar(n_pad):
            # Capacity corpus (> CONFIG.plane_rows): the float plane lives
            # as SEPARATE device planes and each is ranked by the routed
            # program — no XLA program ever compiles against the monolithic
            # capacity operand (the round-5 2^24 forensics: the remote
            # compile helper crashes on every monolithic 16M-row program
            # while the ~10M-row class passes the gate). The per-plane
            # winners merge exactly (ops/ranking.rank_top_k_planar).
            bounds = db._store.plane_bounds(n_pad)
            planes = dv["rows_norm_planes" if prenorm else "rows_planes"]
            if mask.all():
                masks = dv["plane_row_valid"]  # cached, no per-query upload
            else:
                mh = np.zeros(n_pad, dtype=bool)
                mh[:num_docs] = mask
                masks = [
                    jnp.asarray(mh[a:b])
                    for a, b in zip(bounds, bounds[1:])
                ]
            recs = None
            if rec_host is not None:
                recs = [
                    jnp.asarray(rec_host[a:b])
                    for a, b in zip(bounds, bounds[1:])
                ]
            vals, idx = _ranking.rank_top_k_planar(
                q,
                planes,
                k=min(k_pad, n_pad),
                metric=metric,
                row_masks=masks,
                recencies=recs,
                prenormalized=prenorm,
            )
        elif metric in _ranking.GROUPED_METRICS and _grouped_ok(
            dv["n_pad"], q_block.shape[0]
        ):
            # euclidean/hamming/jaccard ride the grouped epilogue kernel:
            # exact scores fused into the grouped matmul + group-max, no
            # (B, N) score materialization (ops/ranking notes).
            if metric == "euclidean_metric":
                g_rows, g_aux = dv["rows"], dv["row_sq"]
            else:
                bv = db._store.binary_view(db.source_indices)
                g_rows, g_aux = bv["rows_bin"], bv["row_bin_sum"]
            group = _grouped_group(dv["n_pad"], int(q_block.shape[0]))
            vals, idx = _ranking.rank_top_k_grouped_metric(
                q,
                g_rows,
                g_aux,
                k=min(k_pad, n_pad),
                metric=metric,
                row_mask=row_mask_dev,
                recency=rec_pad,
                group=group,
            )
        elif metric == "pearson_correlation" and _grouped_ok(
            dv["n_pad"], q_block.shape[0]
        ):
            # pearson == dot over centered unit-norm rows (store.pearson_view
            # docstring has the algebra), so the big-batch scan rides the
            # dot routing — grouped kernel or Pallas gmax — instead of
            # materializing (B, N) pearson scores. Constant rows/queries
            # become NaN operands whose scores every kernel scrubs to -inf,
            # the same contract the pearson_scores fallback hits.
            pv = db._store.pearson_view(db.source_indices)
            plane = pv["rows_pearson"]
            if isinstance(q, jax.Array):
                qq = _pearson_rows_dev(q, np.dtype(plane.dtype))
            else:
                from hyperdb_tpu.ops.metrics import pearson_center_normalize

                qq = pearson_center_normalize(np.array(q, dtype=np.float32))
                qq = np.ascontiguousarray(qq.astype(plane.dtype))
            vals, idx = rank_top_k(
                qq,
                plane,
                k=min(k_pad, n_pad),
                metric="dot_product",
                row_mask=row_mask_dev,
                recency=rec_pad,
            )
        else:
            vals, idx = rank_top_k(
                q,
                dv["rows_norm"] if prenorm else dv["rows"],
                k=min(k_pad, n_pad),
                metric=metric,
                row_mask=row_mask_dev,
                recency=rec_pad,
                prenormalized=prenorm,
            )
    else:
        dv = db._store.device_view(db.source_indices)
        d_pad = bucket_size(num_docs)
        doc_mask = np.zeros(d_pad, dtype=bool)
        doc_mask[:num_docs] = mask
        rec_pad = None
        if recency is not None:
            rec_pad = np.zeros(d_pad, dtype=np.float32)
            rec_pad[:num_docs] = recency
            rec_pad = jnp.asarray(rec_pad)
        prenorm = metric == "cosine_similarity"
        vals, idx = rank_docs_top_k(
            q,
            dv["rows_norm"] if prenorm else dv["rows"],
            dv["row_docs"],
            dv["row_valid"],
            k=min(k_pad, d_pad),
            num_docs=d_pad,
            metric=metric,
            doc_mask=jnp.asarray(doc_mask),
            recency=rec_pad,
            prenormalized=prenorm,
        )

    idx_h, vals_h = fetch(idx, vals)
    return idx_h[:, :top_k], vals_h[:, :top_k]
