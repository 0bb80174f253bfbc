"""TPU compute kernels: similarity metrics and fused grouped ranking."""

from hyperdb_tpu.ops.metrics import (
    METRICS,
    cosine_scores,
    dot_scores,
    euclidean_scores,
    hamming_scores,
    jaccard_scores,
    manhattan_scores,
    normalize,
    pearson_scores,
    scores,
)
from hyperdb_tpu.ops.ranking import (
    GROUPED_METRICS,
    exact_top_k,
    exact_top_k_grouped,
    rank_docs_top_k,
    rank_gathered,
    rank_top_k,
    rank_top_k_grouped,
    rank_top_k_grouped_metric,
    ranking_algorithm_sort,
    recency_scores,
)

__all__ = [
    "METRICS",
    "cosine_scores",
    "dot_scores",
    "euclidean_scores",
    "hamming_scores",
    "jaccard_scores",
    "manhattan_scores",
    "normalize",
    "pearson_scores",
    "scores",
    "GROUPED_METRICS",
    "exact_top_k",
    "exact_top_k_grouped",
    "rank_top_k_grouped_metric",
    "rank_docs_top_k",
    "rank_gathered",
    "rank_top_k",
    "rank_top_k_grouped",
    "ranking_algorithm_sort",
    "recency_scores",
]
