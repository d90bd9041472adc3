"""PQ-QINCo: product-split QINCo with optional OPQ rotation.

Reference: qinco_v1/model_qinco.py:185-234 + qinco_v1/pq_qinco.py —
the vector is (optionally rotated then) split into ``n_parts`` blocks,
each encoded by an independent QINCo model; codes concatenate.

TPU-first redesign: the reference loops sub-quantizers sequentially; all
parts here share one spec, their parameters stack on a leading part
axis, and encode/decode are a single ``jax.vmap`` over parts — one
compiled program, parts run as one batched computation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .params import QincoParams, init_params
from .qinco import decode, encode
from .spec import QincoSpec


class PQQincoParams(NamedTuple):
    parts: QincoParams  # leaves stacked on a leading (n_parts,) axis
    opq: Optional[jnp.ndarray]  # (D, D) rotation or None
    part_scales: jnp.ndarray  # (n_parts,) per-part db_scale


def init_pq_params(
    key: jax.Array, sub_spec: QincoSpec, n_parts: int, *, opq: np.ndarray | None
) -> PQQincoParams:
    keys = jax.random.split(key, n_parts)
    parts = jax.vmap(lambda k: init_params(k, sub_spec))(keys)
    return PQQincoParams(
        parts=parts,
        opq=jnp.asarray(opq, jnp.float32) if opq is not None else None,
        part_scales=jnp.ones((n_parts,), jnp.float32),
    )


def stack_part_params(
    part_params: list[QincoParams], *, opq: np.ndarray | None = None,
    part_scales=None,
) -> PQQincoParams:
    parts = jax.tree.map(lambda *xs: jnp.stack(xs), *part_params)
    n = len(part_params)
    return PQQincoParams(
        parts=parts,
        opq=jnp.asarray(opq, jnp.float32) if opq is not None else None,
        part_scales=(
            jnp.asarray(part_scales, jnp.float32)
            if part_scales is not None
            else jnp.ones((n,), jnp.float32)
        ),
    )


@functools.partial(jax.jit, static_argnames=("sub_spec", "n_parts"))
def pq_encode(
    params: PQQincoParams, sub_spec: QincoSpec, n_parts: int, x: jnp.ndarray
):
    """x (N, D) raw -> codes (n_parts, M_ivf, N), xhat (N, D) raw.

    Matches reference semantics (model_qinco.py:202-221): rotate, split,
    per-part scale, encode; decode side un-rotates.
    """
    N, D = x.shape
    if params.opq is not None:
        x = x @ params.opq.T
    d_sub = D // n_parts
    x_parts = x.reshape(N, n_parts, d_sub).transpose(1, 0, 2)  # (P, N, d)
    x_parts = x_parts / params.part_scales[:, None, None]

    def enc_one(p, xp):
        x_n = (xp - p.data_mean) / p.data_std
        codes, xhat, _ = encode(p, sub_spec, x_n)
        return codes, xhat * p.data_std + p.data_mean

    codes, xhat = jax.vmap(enc_one)(params.parts, x_parts)  # (P, M, N), (P, N, d)
    xhat = xhat * params.part_scales[:, None, None]
    xhat_full = xhat.transpose(1, 0, 2).reshape(N, D)
    if params.opq is not None:
        xhat_full = xhat_full @ params.opq
    return codes, xhat_full


@functools.partial(jax.jit, static_argnames=("sub_spec", "n_parts"))
def pq_decode(
    params: PQQincoParams, sub_spec: QincoSpec, n_parts: int, codes: jnp.ndarray
):
    """codes (n_parts, M_ivf, N) -> x (N, D) raw."""

    def dec_one(p, c):
        x_n = decode(p, sub_spec, c)
        return x_n * p.data_std + p.data_mean

    xhat = jax.vmap(dec_one)(params.parts, codes)  # (P, N, d)
    xhat = xhat * params.part_scales[:, None, None]
    N = xhat.shape[1]
    out = xhat.transpose(1, 0, 2).reshape(N, -1)
    if params.opq is not None:
        out = out @ params.opq
    return out
