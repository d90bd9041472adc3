from .vecs_io import bvecs_mmap, fvecs_mmap, ivecs_mmap, open_vectors
from .datasets import (
    BlockShuffledLoader,
    load_queries_data,
    load_vec_db,
    load_vec_trainset,
)

__all__ = [
    "bvecs_mmap",
    "fvecs_mmap",
    "ivecs_mmap",
    "open_vectors",
    "BlockShuffledLoader",
    "load_vec_trainset",
    "load_vec_db",
    "load_queries_data",
]
