from .distances import (
    batch_sqdist,
    chunked_argmin,
    pairwise_sqdist,
    sqdist_topk,
    topk_smallest,
)

__all__ = [
    "pairwise_sqdist",
    "batch_sqdist",
    "topk_smallest",
    "sqdist_topk",
    "chunked_argmin",
]
