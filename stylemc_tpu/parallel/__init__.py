from .mesh import (data_mesh, batch_sharding, replicated, shard_batch,
                   initialize_distributed)
from . import stats

__all__ = ["data_mesh", "batch_sharding", "replicated", "shard_batch",
           "initialize_distributed", "stats"]
