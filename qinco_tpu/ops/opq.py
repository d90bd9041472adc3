"""OPQ rotation training.

Replaces the reference's use of ``faiss.OPQMatrix``
(reference: qinco_v1/pq_qinco.py:104-114): alternating optimization of an
orthogonal rotation R and a product quantizer — quantize the rotated
data per sub-block with k-means, then update R by the Procrustes
solution ``R = U Vᵀ`` of ``Xᵀ X̂ = U S Vᵀ``.  All linear algebra on TPU
except the small (D, D) SVD.
"""

from __future__ import annotations

import numpy as np

from .kmeans import kmeans
from .distances import chunked_argmin

import jax.numpy as jnp


def train_opq(
    x: np.ndarray,
    n_parts: int,
    K: int = 256,
    *,
    iters: int = 10,
    kmeans_iters: int = 4,
    seed: int = 0,
    verbose: bool = False,
) -> np.ndarray:
    """Train an orthogonal (D, D) rotation for product quantization.

    Returns R such that ``x @ R.T`` is the rotated space (reference
    applies ``x @ opq_matrix.T`` on encode, pq_qinco.py / model:207).
    """
    x = np.asarray(x, np.float32)
    n, D = x.shape
    assert D % n_parts == 0, f"{D=} not divisible by {n_parts=}"
    d_sub = D // n_parts
    R = np.eye(D, dtype=np.float32)

    for it in range(iters):
        xr = x @ R.T
        xhat = np.empty_like(xr)
        for p in range(n_parts):
            sl = slice(p * d_sub, (p + 1) * d_sub)
            cent = kmeans(xr[:, sl], K, iters=kmeans_iters, seed=seed + p)
            codes, _ = chunked_argmin(jnp.asarray(xr[:, sl]), jnp.asarray(cent))
            xhat[:, sl] = cent[np.asarray(codes)]
        # Procrustes: min_R ||x R^T - xhat||_F s.t. R orthogonal
        u, _, vt = np.linalg.svd(x.T @ xhat, full_matrices=False)
        R = (u @ vt).T.astype(np.float32)
        if verbose:
            err = float(((xr - xhat) ** 2).mean())
            print(f"OPQ iter {it + 1}/{iters}: rotated PQ err {err:g}")
    return R
