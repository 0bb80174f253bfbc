"""Engine-vs-NumPy oracle sweep across every metric and routing regime.

test_chunked_oracle.py pins the cosine chunk-reduction semantics; this
module widens the property net: all 7 metrics (reference
ranking_algorithm.py:24-147 formulas re-derived in NumPy), chunked corpora,
metadata-filter masks, recency bias (Q16/Q17), and both the host fast path
and the device path (forced by zeroing HYPERDB_HOST_PATH_MAX_CELLS), single
and batched queries. Selection must agree with the oracle's top-k scores
even under discrete-score ties (jaccard/hamming binarize, so exact index
equality is not well-defined there); for continuous metrics the returned
document ids must match exactly.
"""

import numpy as np
import pytest

from hyperdb_tpu import HyperDB
from hyperdb_tpu.config import CONFIG
from hyperdb_tpu.ops.metrics import METRICS


# ---------------------------------------------------------------------------
# NumPy oracle (reference ranking_algorithm.py semantics)
# ---------------------------------------------------------------------------

def _np_normalize(x, axis=-1):
    n = np.sqrt(np.sum(np.square(x.astype(np.float64)), axis=axis, keepdims=True))
    n[n == 0] = 1.0
    return x / n


def _np_scores(q, v, metric):
    q = q.astype(np.float64)
    v = v.astype(np.float64)
    if metric == "dot_product":
        return v @ q
    if metric == "cosine_similarity":
        return _np_normalize(v) @ (q / max(np.linalg.norm(q), 1e-300))
    if metric == "euclidean_metric":
        return 1.0 / (1.0 + np.linalg.norm(v - q[None, :], axis=1))
    if metric == "manhattan_distance":
        return 1.0 / (1.0 + np.sum(np.abs(v - q[None, :]), axis=1))
    if metric == "jaccard_similarity":
        qb, vb = (q > 0), (v > 0)
        inter = (vb & qb[None, :]).sum(axis=1)
        union = vb.sum(axis=1) + qb.sum() - inter
        with np.errstate(invalid="ignore"):
            return inter / union
    if metric == "hamming_distance":
        qb, vb = (q > 0), (v > 0)
        return float(v.shape[1]) - (vb != qb[None, :]).sum(axis=1)
    if metric == "pearson_correlation":
        qc = q - q.mean()
        vc = v - v.mean(axis=1, keepdims=True)
        den = np.linalg.norm(qc) * np.linalg.norm(vc, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = (vc @ qc) / den
        r[den == 0] = np.nan
        return r
    raise AssertionError(metric)


def _oracle_topk(vectors, source_indices, q, num_docs, k, metric,
                 mask=None, recency_bias=0.0, timestamps=None):
    row_scores = _np_scores(q, vectors, metric)
    row_scores = np.where(np.isnan(row_scores), -np.inf, row_scores)
    doc_scores = np.full(num_docs, -np.inf)
    for row, doc in enumerate(source_indices):
        doc_scores[doc] = max(doc_scores[doc], row_scores[row])
    if mask is None:
        mask = np.ones(num_docs, dtype=bool)
    doc_scores[~mask] = -np.inf
    if recency_bias != 0.0:
        t = np.asarray(timestamps, dtype=np.float64)
        surv = np.flatnonzero(mask)
        doc_scores[surv] += recency_bias * np.exp(t[surv] - t[surv].max())
    order = np.argsort(-doc_scores, kind="stable")[: min(k, int(mask.sum()))]
    return order, doc_scores


# ---------------------------------------------------------------------------
# fixture corpus: chunked docs + metadata group + pseudo-timestamp key
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    num_docs, d = 60, 32
    chunk_counts = rng.integers(1, 4, size=num_docs)
    db = HyperDB(metadata_keys=["grp", "ts"])
    vectors, source_indices, timestamps = [], [], []
    for i, c in enumerate(chunk_counts):
        rows = rng.standard_normal((c, d)).astype(np.float32)
        if i == 5:
            rows[0] = 1.0  # constant row: pearson NaN case (Q9)
        ts = float(rng.uniform(0, 3))
        vectors.append(rows)
        source_indices.extend([i] * c)
        timestamps.append(ts)
        db.add_document(
            {"i": int(i), "grp": ["a", "b", "c"][i % 3], "ts": ts}, vectors=rows
        )
    db.commit_pending()
    db._build_ann_index()
    return {
        "db": db,
        "vectors": np.concatenate(vectors),
        "source_indices": source_indices,
        "timestamps": np.array(timestamps),
        "num_docs": num_docs,
        "d": d,
        "rng": rng,
        "queries": rng.standard_normal((6, d)).astype(np.float32),
    }


def _routing(monkeypatch, route):
    if route == "device":
        monkeypatch.setattr(CONFIG, "host_path_max_cells", 0)
        monkeypatch.setattr(CONFIG, "grouped_topk_min_rows", 32)
    else:
        monkeypatch.setattr(CONFIG, "host_path_max_cells", 1 << 40)


EXACT_INDEX_METRICS = {
    "dot_product",
    "cosine_similarity",
    "euclidean_metric",
    "manhattan_distance",
    "pearson_correlation",
}


def _check(results, want_order, doc_scores, metric, k):
    # Q4 shape parity: the ANN+recency path yields (doc, score) 2-tuples;
    # recover the doc id from the document payload there.
    got_ids = [r[2] if len(r) == 3 else r[0]["i"] for r in results]
    got_scores = np.array([r[1] for r in results])
    want_scores = doc_scores[want_order]
    assert len(got_ids) == len(want_order)
    # selection: identical score multiset (ties allowed for discrete metrics)
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-4, atol=2e-5)
    # every returned doc's score must be its own oracle score
    np.testing.assert_allclose(
        got_scores, doc_scores[got_ids], rtol=2e-4, atol=2e-5
    )
    if metric in EXACT_INDEX_METRICS:
        assert got_ids == want_order.tolist()


@pytest.mark.parametrize("route", ["host", "device"])
@pytest.mark.parametrize("metric", METRICS)
def test_query_matches_oracle(corpus, monkeypatch, route, metric):
    _routing(monkeypatch, route)
    db = corpus["db"]
    k = 7
    for q in corpus["queries"][:3]:
        res = db.query(q, top_k=k, metric=metric)
        want, scores = _oracle_topk(
            corpus["vectors"], corpus["source_indices"], q,
            corpus["num_docs"], k, metric,
        )
        _check(res, want, scores, metric, k)
        db.clear_cache()


@pytest.mark.parametrize("route", ["host", "device"])
@pytest.mark.parametrize(
    "metric", ["dot_product", "cosine_similarity", "euclidean_metric",
               "hamming_distance"]
)
def test_filtered_query_matches_oracle(corpus, monkeypatch, route, metric):
    _routing(monkeypatch, route)
    db = corpus["db"]
    k = 5
    mask = np.array([i % 3 == 1 for i in range(corpus["num_docs"])])
    for q in corpus["queries"][:2]:
        res = db.query(q, top_k=k, metric=metric,
                       filters=[("metadata", {"grp": "b"})])
        want, scores = _oracle_topk(
            corpus["vectors"], corpus["source_indices"], q,
            corpus["num_docs"], k, metric, mask=mask,
        )
        _check(res, want, scores, metric, k)
        db.clear_cache()


@pytest.mark.parametrize("route", ["host", "device"])
@pytest.mark.parametrize("bias", [0.75, -0.75])
@pytest.mark.parametrize("metric", ["cosine_similarity", "euclidean_metric"])
def test_recency_query_matches_oracle(corpus, monkeypatch, route, metric, bias):
    _routing(monkeypatch, route)
    db = corpus["db"]
    k = 6
    q = corpus["queries"][3]
    res = db.query(q, top_k=k, metric=metric, recency_bias=bias,
                   timestamp_key="ts")
    want, scores = _oracle_topk(
        corpus["vectors"], corpus["source_indices"], q,
        corpus["num_docs"], k, metric,
        recency_bias=bias, timestamps=corpus["timestamps"],
    )
    _check(res, want, scores, metric, k)
    db.clear_cache()


@pytest.mark.parametrize("route", ["host", "device"])
@pytest.mark.parametrize("metric", ["dot_product", "cosine_similarity"])
def test_query_batch_matches_oracle(corpus, monkeypatch, route, metric):
    _routing(monkeypatch, route)
    db = corpus["db"]
    k = 6
    qs = corpus["queries"]
    rows = db.query_batch(qs, top_k=k, metric=metric)
    assert len(rows) == qs.shape[0]
    for q, res in zip(qs, rows):
        want, scores = _oracle_topk(
            corpus["vectors"], corpus["source_indices"], q,
            corpus["num_docs"], k, metric,
        )
        _check(res, want, scores, metric, k)


@pytest.mark.parametrize("route", ["host", "device"])
def test_query_batch_arrays_matches_tuple_api(corpus, monkeypatch, route):
    """query_batch_arrays is the array-level twin of query_batch: identical
    ids and scores, as (B, k) arrays (the native serving front-end's engine
    entry point)."""
    _routing(monkeypatch, route)
    db = corpus["db"]
    qs = corpus["queries"]
    k = 6
    rows = db.query_batch(qs, top_k=k, metric="cosine_similarity")
    ids, scores = db.query_batch_arrays(qs, top_k=k,
                                        metric="cosine_similarity")
    assert ids.dtype == np.int64 and scores.dtype == np.float32
    assert ids.shape == (qs.shape[0], k) and scores.shape == ids.shape
    for b, res in enumerate(rows):
        assert [r[2] for r in res] == ids[b].tolist()
        assert np.allclose([r[1] for r in res], scores[b], atol=1e-6)
    db.clear_cache()


def test_query_batch_arrays_empty_filter_result(corpus):
    """Filters that eliminate every document yield (B, 0) arrays, matching
    query_batch's empty per-query lists."""
    db = corpus["db"]
    qs = corpus["queries"][:3]
    filters = [("metadata", {"grp": "no-such-group"})]
    ids, scores = db.query_batch_arrays(qs, top_k=4, filters=filters)
    assert ids.shape == (3, 0) and scores.shape == (3, 0)
    assert db.query_batch(qs, top_k=4, filters=filters) == [[], [], []]
    db.clear_cache()
