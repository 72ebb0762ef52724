from .mesh import data_mesh, shard_batch
from .train import distributed_lda_fit, distributed_train_step

__all__ = [
    "data_mesh",
    "shard_batch",
    "distributed_lda_fit",
    "distributed_train_step",
]
