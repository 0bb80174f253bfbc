"""The `hyperdb` drop-in alias: reference import paths and call shapes."""

import numpy as np
import pytest


def test_reference_import_path():
    from hyperdb import HyperDB

    db = HyperDB(documents=[{"a": "x"}, {"a": "y"}],
                 vectors=np.eye(2, dtype=np.float32))
    assert len(db.query(np.array([1.0, 0.0]), top_k=1)) == 1


def test_ranking_module_surface():
    from hyperdb.ranking_algorithm import (
        cosine_similarity,
        dot_product,
        euclidean_metric,
        get_norm_vector,
        hamming_distance,
        hyperDB_ranking_algorithm_sort,
        jaccard_similarity,
        manhattan_distance,
        pearson_correlation,
    )

    v = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
    q = np.array([1.0, 0.0])

    np.testing.assert_allclose(cosine_similarity(v, q)[:2], [1.0, 0.0], atol=1e-6)
    assert dot_product(v, q).shape == (3,)
    assert euclidean_metric(v, q).shape == (3,)
    dist = euclidean_metric(v, q, get_similarity_score=False)
    np.testing.assert_allclose(dist, np.linalg.norm(v - q, axis=1), atol=1e-5)
    assert manhattan_distance(v, q).shape == (3,)
    np.testing.assert_array_equal(jaccard_similarity(v, q), [1.0, 0.0, 0.5])
    assert pearson_correlation(v, q).shape == (3,)
    assert hamming_distance(v, q).shape == (3,)
    assert get_norm_vector(np.array([[0.0, 0.0], [3.0, 4.0]]))[1, 1] == pytest.approx(0.8)

    idx, scores = hyperDB_ranking_algorithm_sort(v, q, top_k=2)
    assert list(idx) == [0, 2]


def test_binarize_is_pure():
    from hyperdb.ranking_algorithm import check_and_binarize_vectors

    v = np.array([[2.0, -1.0]])
    out = check_and_binarize_vectors(v)
    np.testing.assert_array_equal(out, [[1.0, 0.0]])
    np.testing.assert_array_equal(v, [[2.0, -1.0]])  # input untouched
