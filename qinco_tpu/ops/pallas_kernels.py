"""Pallas TPU kernels for the QINCo encode hot path.

Kernel K2 (SURVEY.md §7): the fused candidate-scoring kernel.  The XLA
path materializes, per step, the (N·F, A, D) candidate tensor and every
MLP intermediate in HBM — multi-GB of traffic per step at production
shapes.  This kernel keeps the step's weights and codebook resident in
VMEM, streams row tiles of (x, xhat, candidate indices), runs the whole
MLP chain (codebook lookup via one-hot MXU matmul -> in_proj -> residual
concat block -> L FFN blocks -> out_proj -> +codeword -> +xhat) on-chip,
and writes back only the (rows, A) candidate distances — the only thing
beam search actually ranks on.

The beam step then recomputes reconstructions for just the B selected
candidates (B << F·A) with the plain XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spec import QincoSpec


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cand_scores_kernel(
    spec: QincoSpec,
    x_ref,  # (R, D) target rows
    xh_ref,  # (R, D) current reconstruction rows
    idx_ref,  # (R, A) int32 candidate codebook ids
    codebook_ref,  # (K, D)
    in_proj_ref,  # (D, De) or None
    concat_w_ref,  # (De + D, De) or (De + D, rank)
    concat_w2_ref,  # (rank, De) or None
    concat_b_ref,  # (1, De)
    ffn_up_ref,  # (L, De, Dh)
    ffn_down_ref,  # (L, Dh, De)
    out_proj_ref,  # (De, D) or None
    dist_ref,  # (R, A) output: ||x - (MLP(cand|xh) + xh)||^2
):
    R, A = idx_ref.shape
    K = codebook_ref.shape[0]
    D, De = spec.D, spec.De
    dt = jnp.dtype(spec.compute_dtype)

    # One-hot candidate materialization on the MXU (RA, K) @ (K, D).
    # (Built as (R, A, K) then collapsed over leading dims — Mosaic only
    # supports reshapes that keep the lane dimension.)
    idx = idx_ref[:]  # (R, A)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, A, K), dimension=2)
    onehot = (col == idx[:, :, None]).astype(dt).reshape(R * A, K)
    cand = jnp.dot(
        onehot, codebook_ref[:].astype(dt), preferred_element_type=jnp.float32
    )  # (RA, D) f32

    # Condition rows repeated A times: (R, D) -> (R, A, D) -> (RA, D).
    xh = xh_ref[:].astype(jnp.float32)
    cond = jnp.broadcast_to(xh[:, None, :], (R, A, D)).reshape(R * A, D)

    h = cand.astype(dt)
    if in_proj_ref is not None:
        h = jnp.dot(
            h, in_proj_ref[:].astype(dt), preferred_element_type=jnp.float32
        ).astype(dt)

    cc = jnp.concatenate([h, cond.astype(dt)], axis=-1)
    cc = jnp.dot(
        cc, concat_w_ref[:].astype(dt), preferred_element_type=jnp.float32
    )
    if concat_w2_ref is not None:  # QINCo-LR low-rank factor
        cc = jnp.dot(
            cc.astype(dt), concat_w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )
    cc = cc + concat_b_ref[0, :]
    h = h + cc.astype(dt)

    for l in range(spec.L):
        up = jnp.dot(
            h, ffn_up_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        up = jnp.maximum(up, 0.0).astype(dt)
        down = jnp.dot(
            up, ffn_down_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        h = h + down.astype(dt)

    if out_proj_ref is not None:
        out = jnp.dot(
            h, out_proj_ref[:].astype(dt), preferred_element_type=jnp.float32
        )
    else:
        out = h.astype(jnp.float32)

    if spec.res_codeword_coeff:
        out = out + cand

    cand_abs = out + cond  # (RA, D) f32
    diff = jnp.broadcast_to(
        x_ref[:].astype(jnp.float32)[:, None, :], (R, A, D)
    ).reshape(R * A, D) - cand_abs
    dist_ref[:] = jnp.sum(diff * diff, axis=-1).reshape(R, A)


@functools.partial(
    jax.jit, static_argnames=("spec", "row_tile", "interpret")
)
def candidate_scores_pallas(
    spec: QincoSpec,
    x: jnp.ndarray,  # (NF, D)
    xh: jnp.ndarray,  # (NF, D)
    idx: jnp.ndarray,  # (NF, A) int32
    codebook: jnp.ndarray,  # (K, D)
    in_proj,  # (D, De) | None
    concat_w,
    concat_w2,  # (rank, De) | None (QINCo-LR)
    concat_b,  # (De,)
    ffn_up,  # (L, De, Dh)
    ffn_down,
    out_proj,  # (De, D) | None
    row_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused candidate scoring -> squared distances (NF, A)."""
    NF, D = x.shape
    A = idx.shape[1]
    pad = _round_up(NF, row_tile) - NF
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        xh = jnp.pad(xh, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    n_tiles = (NF + pad) // row_tile

    def row_spec(width):
        return pl.BlockSpec(
            (row_tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    operands = [x, xh, idx, codebook, in_proj, concat_w, concat_w2,
                concat_b.reshape(1, -1), ffn_up, ffn_down, out_proj]
    in_specs = [
        row_spec(D),
        row_spec(D),
        row_spec(A),
        full(codebook),
        None if in_proj is None else full(in_proj),
        full(concat_w),
        None if concat_w2 is None else full(concat_w2),
        full(concat_b.reshape(1, -1)),
        full(ffn_up),
        full(ffn_down),
        None if out_proj is None else full(out_proj),
    ]
    # Pallas does not accept None operands; filter and re-inject.
    live = [(o, s) for o, s in zip(operands, in_specs) if o is not None]
    live_ops = [o for o, _ in live]
    live_specs = [s for _, s in live]
    has_in = in_proj is not None
    has_w2 = concat_w2 is not None
    has_out = out_proj is not None

    def kernel_dispatch(*refs):
        it = iter(refs[:-1])
        x_r = next(it)
        xh_r = next(it)
        idx_r = next(it)
        cb_r = next(it)
        ip_r = next(it) if has_in else None
        cw_r = next(it)
        cw2_r = next(it) if has_w2 else None
        cb2_r = next(it)
        fu_r = next(it)
        fd_r = next(it)
        op_r = next(it) if has_out else None
        _cand_scores_kernel(
            spec, x_r, xh_r, idx_r, cb_r, ip_r, cw_r, cw2_r, cb2_r, fu_r,
            fd_r, op_r, refs[-1],
        )

    dists = pl.pallas_call(
        kernel_dispatch,
        out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
        grid=(n_tiles,),
        in_specs=live_specs,
        out_specs=pl.BlockSpec(
            (row_tile, A), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*live_ops)
    return dists[:NF]
