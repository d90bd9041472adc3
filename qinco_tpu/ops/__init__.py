from .distances import (
    batch_sqdist,
    chunked_argmin,
    pairwise_sqdist,
    sqdist_topk,
    topk_smallest,
)
from .kmeans import kmeans
from .rq import rq_decode, rq_encode, train_rq
from .aq import compute_fixed_aq_codebooks, reconstruct_from_codebooks
from .opq import train_opq

__all__ = [
    "pairwise_sqdist",
    "batch_sqdist",
    "topk_smallest",
    "sqdist_topk",
    "chunked_argmin",
    "kmeans",
    "train_rq",
    "rq_encode",
    "rq_decode",
    "compute_fixed_aq_codebooks",
    "reconstruct_from_codebooks",
    "train_opq",
]
