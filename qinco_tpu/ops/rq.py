"""Plain residual-quantizer training, used to initialize QINCo codebooks.

Replaces the reference's TorchRQ / TorchSingleVQ / faiss ResidualQuantizer
stack (reference: qinco/vrq.py:22-255): stage-wise Lloyd k-means on the
running residual, with an optional frozen IVF first stage.  Runs on TPU
via :func:`qinco_tpu.ops.kmeans.kmeans`.

Caps mirror the reference: at most 1M training rows (vrq.py:262), k-means
gets 10 Lloyd iterations (vrq.py:246).
"""

from __future__ import annotations

import numpy as np

from .distances import chunked_argmin
from .kmeans import kmeans

import jax.numpy as jnp

RQ_MAX_ELEMS = 1_000_000


def _quantize_stage(x: np.ndarray, centroids: np.ndarray, batch=200_000):
    """Assign + reconstruct one stage; returns (quantized, codes)."""
    out_codes = np.empty((len(x),), np.int32)
    cent = jnp.asarray(centroids)
    for i in range(0, len(x), batch):
        codes, _ = chunked_argmin(jnp.asarray(x[i : i + batch]), cent)
        out_codes[i : i + batch] = np.asarray(codes)
    return centroids[out_codes], out_codes


def train_rq(
    x: np.ndarray,
    M: int,
    K: int,
    *,
    iters: int = 10,
    seed: int = 0,
    ivf_centroids: np.ndarray | None = None,
    verbose: bool = False,
):
    """Train an M-stage RQ (stage 0 may be a frozen IVF book).

    Returns (centroids list — excluding the IVF stage, residual xq) where
    ``xq`` is the quantized reconstruction of ``x``.
    """
    x = np.asarray(x[:RQ_MAX_ELEMS], np.float32)
    resid = x.copy()
    centroids_out: list[np.ndarray] = []

    stages = list(range(M))
    for s in stages:
        if s == 0 and ivf_centroids is not None:
            cent = np.asarray(ivf_centroids, np.float32)
        else:
            cent = kmeans(resid, K, iters=iters, seed=seed + s, verbose=verbose)
            centroids_out.append(cent)
        q, _ = _quantize_stage(resid, cent)
        resid -= q
    xq = x - resid
    return centroids_out, xq


def rq_encode(x: np.ndarray, centroids: list[np.ndarray]) -> np.ndarray:
    """Greedy RQ encode with fixed codebooks -> codes (M, N)."""
    resid = np.asarray(x, np.float32).copy()
    codes = []
    for cent in centroids:
        q, c = _quantize_stage(resid, np.asarray(cent, np.float32))
        codes.append(c)
        resid -= q
    return np.stack(codes)


def rq_decode(codes: np.ndarray, centroids: list[np.ndarray]) -> np.ndarray:
    out = None
    for c, cent in zip(codes, centroids):
        xi = np.asarray(cent, np.float32)[c]
        out = xi if out is None else out + xi
    return out
