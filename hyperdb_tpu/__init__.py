"""hyperdb_tpu — a TPU-native vector database and retrieval engine.

A from-scratch JAX/XLA/Pallas rebuild with the full capability surface of the
reference ``AdamCodd/local-hyperDB`` (see SURVEY.md): document ingestion with
token chunking and pluggable embeddings, seven similarity metrics, recency
ranking, composable filters, an ANN (IVF) pre-filter, an LRU query cache, and
pickle/JSON/SQLite persistence — but with every score-touching code path
expressed as dense batched array math compiled by XLA for the MXU, filters as
boolean masks fused into the ranking kernel, and multi-chip scale-out via
``shard_map`` over a device mesh.
"""

__version__ = "0.1.0"

from hyperdb_tpu.ops import (  # noqa: F401
    METRICS,
    rank_top_k,
    ranking_algorithm_sort,
    recency_scores,
    scores,
)

# The DB facade is imported lazily-but-eagerly here for drop-in parity with
# `from hyperdb import HyperDB`.
from hyperdb_tpu.core.db import HyperDB  # noqa: F401

__all__ = ["HyperDB", "METRICS", "rank_top_k", "ranking_algorithm_sort", "scores"]
