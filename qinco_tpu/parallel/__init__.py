from .mesh import make_mesh, shard_batch, replicate
from .distributed import maybe_init_distributed

__all__ = ["make_mesh", "shard_batch", "replicate", "maybe_init_distributed"]
