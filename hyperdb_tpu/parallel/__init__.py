"""Multi-chip scale-out: meshes, sharded query, sharded training."""

from hyperdb_tpu.parallel.mesh import make_mesh
from hyperdb_tpu.parallel.distributed import (
    DistributedCorpus,
    sharded_rank_top_k,
)

__all__ = ["make_mesh", "DistributedCorpus", "sharded_rank_top_k"]
