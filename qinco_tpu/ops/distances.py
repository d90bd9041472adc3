"""Squared-L2 distance kernels, TPU-first.

The reference keeps two families of distance ops (exact broadcast-subtract
vs ``‖a‖²+‖b‖²−2ab`` matmul, with an auto switch at K>32 and ad-hoc column
tiling — reference: qinco/utils.py:294-388).  On TPU the matmul form is the
only one that rides the MXU, so it is the default everywhere; cancellation
is controlled by accumulating in float32 (``preferred_element_type``)
regardless of the activation dtype.  Since distances are only ever used
for arg-ranking (argmin / top-k), dropping the constant ``‖a‖²`` term is
free and saves a reduction; functions that return *values* keep it.

Large-K codebooks (the 2^20-entry IVF book) never materialize an
(N, 2^20) distance matrix: :func:`chunked_argmin` scans codebook chunks
with a running (min, argmin) carry, keeping peak memory at
``N × chunk`` (reference equivalent: IVF_BS_MAX batching in
qinco/model/qinco_base.py:131-160, transposed — we chunk K, not N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sq_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Row-wise squared norms with f32 accumulation."""
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32 * x32, axis=-1)


def pairwise_sqdist(
    a: jnp.ndarray, b: jnp.ndarray, *, precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """Full pairwise squared distances, shape ``a[... ,d] × b[k, d] -> [..., k]``.

    MXU path: ``‖a‖² + ‖b‖² − 2 a·bᵀ`` with float32 accumulation.
    """
    dots = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return sq_norm(a)[..., None] + sq_norm(b) - 2.0 * dots


def pairwise_sqdist_partial(
    a: jnp.ndarray, b: jnp.ndarray, *, precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """‖b‖² − 2 a·bᵀ: pairwise distances up to the constant ‖a‖² per row.

    Rank-equivalent to :func:`pairwise_sqdist` along the ``b`` axis; use for
    argmin / top-k selection.  ``precision`` may be lowered to DEFAULT
    (bf16-rounded inputs on TPU) where selection tolerates boundary flips.
    """
    dots = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return sq_norm(b) - 2.0 * dots


def batch_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched pairwise distances: ``a[n, p, d] × b[n, q, d] -> [n, p, q]``."""
    dots = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return sq_norm(a)[..., :, None] + sq_norm(b)[..., None, :] - 2.0 * dots


def batch_sqdist_partial(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched ‖b‖² − 2 a·bᵀ (rank-equivalent along the q axis)."""
    dots = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return sq_norm(b)[..., None, :] - 2.0 * dots


def topk_smallest(dists: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Indices & values of the k smallest entries along the last axis,
    sorted ascending (index 0 = argmin)."""
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return idx, -neg_vals


def sqdist_topk(
    a: jnp.ndarray, b: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest codewords of ``b[k_b, d]`` for each row of ``a[..., d]``.

    Returns (indices, partial distances). Distances omit the ‖a‖² constant.
    """
    return topk_smallest(pairwise_sqdist_partial(a, b), k)


@functools.partial(jax.jit, static_argnames=("chunk", "fast", "max_elems"))
def chunked_argmin(
    x: jnp.ndarray, codebook: jnp.ndarray, chunk: int = 65536,
    fast: bool = True, max_elems: int = 2 ** 28,
):
    """Nearest-codeword assignment against a huge codebook.

    ``x``: (N, D); ``codebook``: (K, D) with K typically 2^20.  Scans the
    codebook in ``chunk``-row slices keeping a running (best_dist, best_idx)
    carry, and additionally scans ``x`` in row blocks so the live
    distance tile never exceeds ``max_elems`` elements (the reference
    bounds the same product with IVF_BS_MAX = 2^30 elements,
    qinco_base.py:131) — 2^28 f32 = 1 GB, safe under the 16 GB HBM.

    Returns (codes (N,) int32, best partial distances (N,) f32).
    K must be a multiple of ``chunk``; callers with K = 2^20 and
    chunk = 2^16 satisfy this.  If you must pad the codebook, use rows
    of a huge *finite* value (e.g. 1e19) — never +inf, which turns the
    matmul distance form into 0·inf = NaN.
    """
    K = codebook.shape[0]
    chunk = min(chunk, K)
    assert K % chunk == 0, f"{K=} must be a multiple of {chunk=}"
    n_chunks = K // chunk
    books = codebook.reshape(n_chunks, chunk, -1)

    # Coarse assignment tolerates bf16-rounded inputs (flips happen only
    # at Voronoi boundaries; the reference assigns in fp16): DEFAULT
    # precision runs ~6x fewer MXU passes than HIGHEST.
    prec = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST

    def argmin_rows(xr):
        def body(carry, args):
            best_d, best_i = carry
            i_chunk, book = args
            d = pairwise_sqdist_partial(xr, book, precision=prec)
            local_i = jnp.argmin(d, axis=-1)
            local_d = jnp.take_along_axis(d, local_i[:, None], axis=-1)[:, 0]
            take = local_d < best_d
            best_i = jnp.where(take, local_i + i_chunk * chunk, best_i)
            best_d = jnp.where(take, local_d, best_d)
            return (best_d, best_i), None

        init = (
            jnp.full((xr.shape[0],), jnp.inf, dtype=jnp.float32),
            jnp.zeros((xr.shape[0],), dtype=jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            body, init, (jnp.arange(n_chunks, dtype=jnp.int32), books)
        )
        return best_i.astype(jnp.int32), best_d

    n = x.shape[0]
    row_block = max(1, max_elems // chunk)
    if n <= row_block:
        return argmin_rows(x)
    pad = -n % row_block
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, row_block, x.shape[1])
    _, (idx, dist) = jax.lax.scan(
        lambda _, xr: (None, argmin_rows(xr)), None, xb
    )
    return idx.reshape(-1)[:n], dist.reshape(-1)[:n]
