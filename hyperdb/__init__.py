"""Drop-in compatibility package.

Reference users import ``from hyperdb import HyperDB``
(/root/reference/hyperdb/__init__.py); this alias package re-exports the
TPU-native implementation under the same names so existing code switches
engines without an import change.
"""

from hyperdb_tpu import HyperDB  # noqa: F401
from hyperdb.ranking_algorithm import (  # noqa: F401
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
