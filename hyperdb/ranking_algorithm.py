"""Reference-shaped ranking API (compatibility layer).

Function-for-function surface of the reference's
``hyperdb/ranking_algorithm.py`` — same names, same numpy-in/numpy-out
single-query contracts — backed by the TPU kernels in
:mod:`hyperdb_tpu.ops`. Unlike the reference, nothing here ever mutates its
inputs (SURVEY.md Q6).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from hyperdb_tpu.ops import metrics as _m
from hyperdb_tpu.ops.ranking import ranking_algorithm_sort


def get_norm_vector(vector):
    """L2-normalize rows; zero norms treated as 1 (reference
    ranking_algorithm.py:8-21), including the reference's NaN warning."""
    vector = np.asarray(vector, dtype=np.float64)
    norms = np.linalg.norm(vector, axis=-1, keepdims=True)
    norms[norms == 0] = 1
    nan_indices = np.where(np.isnan(vector))
    if nan_indices[0].size > 0:
        print(f"Warning: Vectors at indices {nan_indices} contain NaN values.")
    return vector / norms


def _single(fn, vectors, query_vector):
    v = np.asarray(vectors, dtype=np.float32)
    q = np.asarray(query_vector, dtype=np.float32).reshape(1, -1)
    return np.asarray(fn(jnp.asarray(q), jnp.asarray(v))[0])


def dot_product(vectors, query_vector):
    return _single(_m.dot_scores, vectors, query_vector)


def cosine_similarity(vectors, query_vector):
    return _single(_m.cosine_scores, vectors, query_vector).flatten()


def euclidean_metric(vectors, query_vector, get_similarity_score=True):
    v = np.asarray(vectors, dtype=np.float32)
    if v.ndim != 2:
        raise ValueError("vectors must be 2D")
    sims = _single(_m.euclidean_scores, v, query_vector)
    if get_similarity_score:
        return sims
    return 1.0 / sims - 1.0  # invert the 1/(1+d) transform back to distance


def manhattan_distance(vectors, query_vector):
    return _single(_m.manhattan_scores, vectors, query_vector)


def jaccard_similarity(vectors, query_vector):
    return _single(_m.jaccard_scores, vectors, query_vector)


def pearson_correlation(vectors, query_vector):
    return _single(_m.pearson_scores, vectors, query_vector)


def hamming_distance(vectors, query_vector):
    return _single(_m.hamming_scores, vectors, query_vector)


def check_and_binarize_vectors(vectors):
    """Pure binarization (the reference mutates in place — Q6 fixed)."""
    vectors = np.asarray(vectors)
    out = np.zeros_like(vectors)
    out[vectors > 0] = 1
    return out


def hyperDB_ranking_algorithm_sort(
    vectors, query_vector, top_k=5, metric="cosine_similarity",
    timestamps=None, recency_bias=0,
):
    return ranking_algorithm_sort(
        vectors, query_vector, top_k=top_k, metric=metric,
        timestamps=timestamps, recency_bias=recency_bias,
    )
