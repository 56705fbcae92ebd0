from .mesh import make_mesh
from .sharding import batch_shardings, shard_train_step, state_shardings

__all__ = ["make_mesh", "state_shardings", "batch_shardings",
           "shard_train_step"]
