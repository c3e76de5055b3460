from .mesh import make_mesh, shard_batch, batch_shardings, DATA_AXIS
from .train import make_sharded_train_step

__all__ = ["make_mesh", "shard_batch", "batch_shardings", "DATA_AXIS",
           "make_sharded_train_step"]
