"""Drop-in compatibility package.

Reference users import ``from hyperdb import HyperDB``
(/root/reference/hyperdb/__init__.py does ``from .hyperdb import *``);
this alias package re-exports the TPU-native implementation under the
same names — including the ``hyperdb.hyperdb`` submodule path and its
module-level constants — so existing code switches engines without an
import change. The compat ``HyperDB`` keeps the reference's constructor
metadata quirk (see hyperdb/hyperdb.py); use ``hyperdb_tpu.HyperDB``
for the fixed engine.
"""

from hyperdb.hyperdb import *  # noqa: F401,F403 — mirrors reference __init__.py:1
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
