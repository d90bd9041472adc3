"""Model-axis sharded codebook operations.

The only tensors in QINCo that can outgrow one chip's HBM are the
2^20-entry IVF codebook (0.5 GB at D=128, 3 GB at D=768) and the
encoded-code store.  These ops shard the codebook across the ``model``
mesh axis with ``shard_map``: every chip scans only its codebook shard
and the (nq, nprobe)-sized partials are combined with one all-gather —
the collective rides ICI, the big tensor never moves.

This is a new capability, not a reference port — the reference keeps
the IVF book replicated per GPU (qinco/model/qinco_base.py:128-163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distances import pairwise_sqdist, pairwise_sqdist_partial


def shard_codebook(mesh: Mesh, codebook) -> jax.Array:
    """Place a (K, D) codebook row-sharded over the model axis."""
    return jax.device_put(codebook, NamedSharding(mesh, P("model", None)))


def sharded_coarse_topk(
    mesh: Mesh,
    xq: jax.Array,  # (nq, D), replicated (or data-sharded)
    codebook: jax.Array,  # (K, D), sharded over 'model'
    k: int,
    *,
    exact: bool = True,
):
    """Top-k nearest codebook rows with the codebook sharded over chips.

    Per shard: local distances + local top-k (indices offset into the
    global codebook); then one all-gather of (nq, k) partials per shard
    and a final top-k over ``shards × k`` candidates.

    Returns (indices (nq, k) int32, distances (nq, k)) — exact squared
    distances when ``exact`` (needed for coarse-probe bias terms), else
    partial (rank-only) distances.
    """
    K = codebook.shape[0]
    n_shards = mesh.shape["model"]
    assert K % n_shards == 0
    shard_rows = K // n_shards
    dist_fn = pairwise_sqdist if exact else pairwise_sqdist_partial

    def local(xq, book_shard):
        # book_shard: (K / n_shards, D) — this chip's rows
        i_shard = jax.lax.axis_index("model")
        d = dist_fn(xq, book_shard)  # (nq, shard_rows)
        neg, idx = jax.lax.top_k(-d, min(k, shard_rows))
        idx = idx + i_shard * shard_rows
        # gather all shards' candidates: (n_shards * k_local,) per query
        all_d = jax.lax.all_gather(-neg, "model", axis=1, tiled=True)
        all_i = jax.lax.all_gather(idx, "model", axis=1, tiled=True)
        neg2, sel = jax.lax.top_k(-all_d, k)
        return jnp.take_along_axis(all_i, sel, axis=1), -neg2

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("model", None)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (post-all_gather top-k);
        # the static varying-axes check can't infer that
        check_vma=False,
    )
    return fn(xq, codebook)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "exact"))
def _sharded_coarse_topk_jit(mesh, xq, codebook, k, exact):
    return sharded_coarse_topk(mesh, xq, codebook, k, exact=exact)


def sharded_ivf_assign(mesh: Mesh, x, codebook_sharded, *, chunk_q: int = 65536):
    """Nearest-centroid assignment with a chip-sharded IVF book.

    Drop-in for ``chunked_argmin`` when the codebook is distributed:
    codes (N,) int32.
    """
    idx, _ = sharded_coarse_topk(mesh, x, codebook_sharded, 1, exact=False)
    return idx[:, 0]


def encode_ivf_sharded(mesh: Mesh, params, spec, x):
    """Beam-search encode with the IVF codebook sharded over the model
    axis — the billion-scale configuration (0.5-3 GB coarse books need
    not fit one chip's working set).

    Step 0 assigns via :func:`sharded_coarse_topk` (each chip scans its
    shard; one ICI all-gather merges candidates); the step-0
    reconstruction gathers rows from the sharded book (XLA inserts the
    collective); the MLP phases run with the small step weights
    replicated.  Returns the same (codes, xhat, stats) as
    :func:`qinco_tpu.models.qinco.encode`.
    """
    from ..models.qinco import encode_from_coarse

    assert spec.ivf_in_use, "sharded coarse encode requires an IVF model"
    codes0 = sharded_ivf_assign(mesh, x, params.codebook0)[:, None]  # (N, 1)
    xhat0 = params.codebook0[codes0].astype(jnp.float32)  # cross-shard gather
    return encode_from_coarse(params, spec, x, codes0, xhat0)
