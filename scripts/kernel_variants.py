#!/usr/bin/env python
"""Timing experiments for the fused-substep encode kernel.

Each variant is a stripped or restructured copy of
qinco_tpu/ops/pallas_kernels.py:_fused_substep_kernel at QINCo2-S
steady-state shapes (NF = 4096*32 rows, K=256, A=16, D=de=128, dh=256,
L=2).  Timing forces host readback (axon transport: block_until_ready
does not guarantee completion) and rotates inputs (identical dispatches
may be served from a transport cache).

Variants:
  full       : the production kernel (baseline)
  sel        : substep distances + bin-min selection only
  sel+fetch  : + per-bin fused-table fetch (skip MLP)
  mlponly    : MLP chain on precomputed rows (skip selection+fetch)
  <others appended as experiments evolve>
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qinco_tpu.models.spec import QincoSpec
from qinco_tpu.ops.pallas_kernels import (
    _pack_ids_f32,
    _round_up,
    fused_substep_scores_pallas,
)

SPEC = QincoSpec(
    D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
    fast=True, pallas=True, fused_substep=True, compute_dtype="bfloat16",
)


def make_inputs(seed, N=4096):
    rng = np.random.default_rng(seed)
    spec = SPEC
    B = spec.B
    NF = N * B
    D, K, De, Dh, L = spec.D, spec.K, spec.de, spec.dh, spec.L
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    return dict(
        x=f(N, D), xh=f(NF, D), sub_codebook=f(K, D), codebook=f(K, D),
        in_proj=f(D, De), concat_w=f(De + D, De), concat_b=f(De),
        ffn_up=f(L, De, Dh), ffn_down=f(L, Dh, De), out_proj=f(De, D),
    )


def timeit(fn, inputs_list, iters):
    """Scan-readback protocol: `iters` calls ride ONE jitted lax.scan (the
    per-dispatch transport round-trip on axon is ~2.7 ms — larger than
    some kernels being measured).  Inputs vary per scan step by mixing in
    the iteration index so no transport/XLA caching can skip work."""
    kw0 = inputs_list[0]

    @jax.jit
    def run(kw):
        def body(acc, i):
            kw_i = dict(kw)
            # cheap per-step variation: scale x by (1 + i*1e-6)
            kw_i["x"] = kw["x"] * (1.0 + i.astype(jnp.float32) * 1e-6)
            return acc + fn(**kw_i), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters)
        )
        return acc

    float(np.asarray(run(kw0)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(kw0)))
    return (time.perf_counter() - t0) / iters


# --------------------------------------------------------------------------
# variant kernels
# --------------------------------------------------------------------------


def _selection(spec, A, beams, x_ref, xh_ref, sub_codebook_ref):
    R = xh_ref.shape[0]
    K = sub_codebook_ref.shape[0]
    D = spec.D
    G = K // A
    dt = jnp.dtype(spec.compute_dtype)
    xv = x_ref[:].astype(jnp.float32)
    xv = jnp.broadcast_to(xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
    xh = xh_ref[:].astype(jnp.float32)
    r = xv - xh
    C = sub_codebook_ref[:]
    cn2 = jnp.sum(C * C, axis=1)[:, None]
    d_sub = cn2 - 2.0 * jax.lax.dot_general(
        C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
    ds_p = _pack_ids_f32(d_sub, rowk)
    ds3 = ds_p.reshape(A, G, R)
    m = ds3[:, 0]
    for g in range(1, G):
        m = jnp.minimum(m, ds3[:, g])
    return xv, xh, ds3, m


def sel_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, dist_ref):
    xv, xh, ds3, m = _selection(spec, A, beams, x_ref, xh_ref, sc_ref)
    dist_ref[:] = m.T


def sel_fetch_kernel(spec, A, beams, off_h, off_w1,
                     x_ref, xh_ref, sc_ref, tab_ref, dist_ref):
    R = xh_ref.shape[0]
    K = sc_ref.shape[0]
    G = K // A
    dt = jnp.dtype(spec.compute_dtype)
    xv, xh, ds3, m = _selection(spec, A, beams, x_ref, xh_ref, sc_ref)
    mask3 = ds3 == m[:, None, :]
    tab = tab_ref[:].astype(dt).reshape(A, G, -1)
    ext = jnp.concatenate(
        [
            jax.lax.dot_general(
                mask3[a].astype(dt), tab[a], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for a in range(A)
        ],
        axis=0,
    )
    # reduce to (A, R) so output shape matches
    dist_ref[:] = jnp.sum(ext * ext, axis=-1).reshape(A, R).T


def run_variant(name, kernel_body, extra_tables, iters, n_bufs=3,
                row_tile=256, out_lanes=None):
    spec = SPEC
    A, B = spec.A, spec.B
    N = 4096
    NF = N * B
    inputs = [make_inputs(s) for s in range(n_bufs)]

    def call(**kw):
        x, xh = kw["x"], kw["xh"]
        beams = B
        pad = _round_up(NF, row_tile) - NF
        n_tiles = (NF + pad) // row_tile
        dt = jnp.dtype(spec.compute_dtype)
        D, De = spec.D, spec.de
        cp = jnp.dot(kw["codebook"].astype(dt), kw["in_proj"].astype(dt),
                     preferred_element_type=jnp.float32)
        w1 = kw["concat_w"][:De]
        table = jnp.concatenate(
            [kw["codebook"], cp,
             jnp.dot(cp.astype(dt), w1.astype(dt),
                     preferred_element_type=jnp.float32)], axis=1)
        ops = [x, xh, kw["sub_codebook"]]
        in_specs = [
            pl.BlockSpec((row_tile // beams, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kw["sub_codebook"].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if "table" in extra_tables:
            ops.append(table)
            in_specs.append(pl.BlockSpec(table.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        lanes = out_lanes or A
        out = pl.pallas_call(
            lambda *refs: kernel_body(spec, A, beams, *refs),
            out_shape=jax.ShapeDtypeStruct((NF + pad, lanes), jnp.float32),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((row_tile, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(*ops)
        return out.sum()

    jitted = jax.jit(call)
    dt = timeit(lambda **kw: jitted(**kw), inputs, iters)
    print(f"{name:12s}: {dt*1e3:8.3f} ms/step")
    return dt


def fullopt_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, tab_ref, dist_ref):
    """Optimized full kernel: bf16 ext, residual-form distance, bias in
    cond half, fewer broadcasts."""
    R = xh_ref.shape[0]
    K = sc_ref.shape[0]
    D, De = spec.D, spec.de
    G = K // A
    dt = jnp.dtype(spec.compute_dtype)

    xv = x_ref[:].astype(jnp.float32)
    xv = jnp.broadcast_to(xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
    xh = xh_ref[:].astype(jnp.float32)
    r = xv - xh
    C = sc_ref[:]
    cn2 = jnp.sum(C * C, axis=1)[:, None]
    d_sub = cn2 - 2.0 * jax.lax.dot_general(
        C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
    ds_p = _pack_ids_f32(d_sub, rowk)
    ds3 = ds_p.reshape(A, G, R)
    m = ds3[:, 0]
    for g in range(1, G):
        m = jnp.minimum(m, ds3[:, g])
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(m, jnp.int32), jnp.int32(0xFF)
    )

    mask3 = ds3 == m[:, None, :]
    tab = tab_ref[:].astype(dt).reshape(A, G, -1)
    # bf16 fetch: ext feeds bf16 consumers (h, w1h) and the f32 cand only
    # through out+cand — bf16 rounding there is within compute-dtype noise
    ext = jnp.concatenate(
        [
            jax.lax.dot_general(
                mask3[a].astype(dt), tab[a], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            for a in range(A)
        ],
        axis=0,
    )  # (A*R, Wt) bf16
    cand = ext[:, :D]
    h = ext[:, D : D + De]
    w1h = ext[:, D + De :]

    # cond half of concat + bias on the R rows (bias folded here)
    W2 = sc_ref[:]  # stand-in (real kernel passes w2); (D, De) slice
    cc_cond = jnp.dot(
        xh.astype(dt), W2[:D, :De].astype(dt), preferred_element_type=jnp.float32
    )  # (R, De) + bias would fold here
    cw = De
    cc = w1h.astype(jnp.float32) + jnp.broadcast_to(
        cc_cond[None], (A, R, cw)
    ).reshape(A * R, cw)
    h = h + cc.astype(dt)

    w_up = tab_ref[:De, : spec.dh].astype(dt)
    w_down = tab_ref[: spec.dh, :De].astype(dt)
    w_out = W2[:De, :D].astype(dt)
    for l in range(spec.L):
        up = jnp.dot(h, w_up, preferred_element_type=jnp.float32)
        up = jnp.maximum(up, 0.0).astype(dt)
        down = jnp.dot(up, w_down, preferred_element_type=jnp.float32)
        h = h + down.astype(dt)
    out = jnp.dot(h, w_out, preferred_element_type=jnp.float32)
    out = out + cand.astype(jnp.float32)

    # residual-form distance: ||x - (out + xh)||^2 == ||r - out||^2
    diff = jnp.broadcast_to(
        r.astype(jnp.float32)[None], (A, R, D)
    ).reshape(A * R, D) - out
    d = jnp.sum(diff * diff, axis=-1).reshape(A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T


def perbin_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, tab_ref, w2_ref,
                  cb_ref, fu_ref, fd_ref, op_ref, dist_ref):
    """Per-bin post-selection chain: fetch -> MLP -> distance runs
    bin-by-bin on (R, .) slabs.  No (A*R, Wt) ext concat, no (A, R, .)
    broadcasts — per-bin adds reuse the same (R, .) condition rows, and
    only A (1, R) distance rows are concatenated at the end.  Uses the
    fold_up table layout [C | H=C*P*(I+W1) | U=H*W_up0]."""
    R = xh_ref.shape[0]
    K = sc_ref.shape[0]
    D, De, Dh = spec.D, spec.de, spec.dh
    G = K // A
    dt = jnp.dtype(spec.compute_dtype)

    xv, xh, ds3, m = _selection(spec, A, beams, x_ref, xh_ref, sc_ref)
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(m, jnp.int32), jnp.int32(0xFF)
    )
    mask3 = ds3 == m[:, None, :]
    tab = tab_ref[:].astype(dt).reshape(A, G, -1)

    r = xv - xh  # (R, D) f32; ||x - (out+cand+xh)||^2 == ||r - out - cand||^2

    # Condition-row products, once for all bins (every bin shares them).
    cc_cond = jnp.dot(
        xh.astype(dt), w2_ref[:].astype(dt), preferred_element_type=jnp.float32
    )  # (R, De)
    ccb = (cc_cond + cb_ref[0, :]).astype(jnp.float32)  # (R, De)
    up_cond = jnp.dot(
        ccb.astype(dt), fu_ref[0].astype(dt), preferred_element_type=jnp.float32
    )  # (R, Dh)

    outs = []
    for a in range(A):
        fetch = jax.lax.dot_general(
            mask3[a].astype(dt), tab[a], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, Wt) f32
        cand = fetch[:, :D]
        h = (fetch[:, D:D + De] + ccb).astype(dt)
        up1 = jnp.maximum(fetch[:, D + De:] + up_cond, 0.0).astype(dt)
        down = jnp.dot(up1, fd_ref[0].astype(dt),
                       preferred_element_type=jnp.float32)
        h = h + down.astype(dt)
        for l in range(1, spec.L):
            up = jnp.dot(h, fu_ref[l].astype(dt),
                         preferred_element_type=jnp.float32)
            up = jnp.maximum(up, 0.0).astype(dt)
            down = jnp.dot(up, fd_ref[l].astype(dt),
                           preferred_element_type=jnp.float32)
            h = h + down.astype(dt)
        out = jnp.dot(h, op_ref[:].astype(dt),
                      preferred_element_type=jnp.float32)
        diff = r - out - cand
        outs.append(jnp.sum(diff * diff, axis=-1)[None, :])  # (1, R)
    d = jnp.concatenate(outs, axis=0)  # (A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T


def run_perbin(name, iters, row_tile=512, n_bufs=3):
    """Custom runner for per-bin variants: fold_up table + weight operands."""
    spec = SPEC
    A, B = spec.A, spec.B
    N = 4096
    NF = N * B
    inputs = [make_inputs(s) for s in range(n_bufs)]
    D, De, Dh = spec.D, spec.de, spec.dh

    def call(**kw):
        x, xh = kw["x"], kw["xh"]
        beams = B
        pad = _round_up(NF, row_tile) - NF
        n_tiles = (NF + pad) // row_tile
        dt = jnp.dtype(spec.compute_dtype)
        cp = jnp.dot(kw["codebook"].astype(dt), kw["in_proj"].astype(dt),
                     preferred_element_type=jnp.float32)
        w1 = kw["concat_w"][:De]
        w2 = kw["concat_w"][De:]
        h_cand = cp + jnp.dot(cp.astype(dt), w1.astype(dt),
                              preferred_element_type=jnp.float32)
        up_cand = jnp.dot(h_cand.astype(dt), kw["ffn_up"][0].astype(dt),
                          preferred_element_type=jnp.float32)
        table = jnp.concatenate([kw["codebook"], h_cand, up_cand], axis=1)
        cb = kw["concat_b"].reshape(1, -1)
        ops = [x, xh, kw["sub_codebook"], table, w2, cb,
               kw["ffn_up"], kw["ffn_down"], kw["out_proj"]]
        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: tuple(0 for _ in a.shape),
            memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((row_tile // beams, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(kw["sub_codebook"]), full(table), full(w2), full(cb),
            full(kw["ffn_up"]), full(kw["ffn_down"]), full(kw["out_proj"]),
        ]
        out = pl.pallas_call(
            lambda *refs: perbin_kernel(spec, A, beams, *refs),
            out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((row_tile, A), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(*ops)
        return out.sum()

    jitted = jax.jit(call)
    dt = timeit(lambda **kw: jitted(**kw), inputs, iters)
    print(f"{name:12s}: {dt*1e3:8.3f} ms/step")
    return dt


def sgfetch_kernel(spec, A, beams, S, x_ref, xh_ref, sc_ref, tabbd_ref,
                   w2_ref, cb_ref, fu_ref, fd_ref, op_ref, dist_ref):
    """Per-bin chain with a SUPERGROUP block-diagonal fetch: S bins'
    one-hot masks stack on the sublane axis into a (S·G, R) slab and
    contract in ONE dot_general against a block-diagonal table
    (S·G, S·Wt) — a 128-deep (S=8, G=16) MXU contraction instead of S
    16-deep ones.  8x more nominal FLOPs (the zero blocks), but if
    Mosaic pads the 16-deep contraction to a full MXU pass anyway the
    pass count is identical and the dispatch overhead is 1/S.  The fetch
    stays exact selection (off-block zeros contribute exactly 0)."""
    R = xh_ref.shape[0]
    K = sc_ref.shape[0]
    D, De = spec.D, spec.de
    G = K // A
    dt = jnp.dtype(spec.compute_dtype)

    xv, xh, ds3, m = _selection(spec, A, beams, x_ref, xh_ref, sc_ref)
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(m, jnp.int32), jnp.int32(0xFF)
    )
    mask3 = ds3 == m[:, None, :]  # (A, G, R)
    mask_sg = mask3.reshape(A // S, S * G, R)
    tabbd = tabbd_ref[:]  # (A//S, S*G, S*Wt), already compute-dtype
    Wt = tabbd.shape[2] // S

    r = xv - xh
    cc_cond = jnp.dot(
        xh.astype(dt), w2_ref[:], preferred_element_type=jnp.float32
    )
    ccb = (cc_cond + cb_ref[0, :]).astype(jnp.float32)  # (R, De)
    up_cond = jnp.dot(
        ccb.astype(dt), fu_ref[0], preferred_element_type=jnp.float32
    )  # (R, Dh)

    outs = []
    for s in range(A // S):
        fsg = jax.lax.dot_general(
            mask_sg[s].astype(dt), tabbd[s], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, S*Wt)
        for j in range(S):
            fetch = fsg[:, j * Wt : (j + 1) * Wt]
            cand = fetch[:, :D]
            h = (fetch[:, D : D + De] + ccb).astype(dt)
            up1 = jnp.maximum(fetch[:, D + De :] + up_cond, 0.0).astype(dt)
            down = jnp.dot(up1, fd_ref[0], preferred_element_type=jnp.float32)
            h = h + down.astype(dt)
            for l in range(1, spec.L):
                up = jnp.dot(h, fu_ref[l], preferred_element_type=jnp.float32)
                up = jnp.maximum(up, 0.0).astype(dt)
                down = jnp.dot(
                    up, fd_ref[l], preferred_element_type=jnp.float32)
                h = h + down.astype(dt)
            out = jnp.dot(h, op_ref[:], preferred_element_type=jnp.float32)
            diff = r - out - cand
            outs.append(jnp.sum(diff * diff, axis=-1)[None, :])  # (1, R)
    d = jnp.concatenate(outs, axis=0)  # (A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T


def run_sgfetch(name, iters, S=8, row_tile=256, n_bufs=3, check=False):
    """Runner for the supergroup block-diagonal fetch variant."""
    spec = SPEC
    A, B = spec.A, spec.B
    N = 4096 if not check else 128
    NF = N * B
    inputs = [make_inputs(s, N=N) for s in range(n_bufs)]
    D, De = spec.D, spec.de

    def call(**kw):
        x, xh = kw["x"], kw["xh"]
        beams = B
        pad = _round_up(NF, row_tile) - NF
        n_tiles = (NF + pad) // row_tile
        dt = jnp.dtype(spec.compute_dtype)
        cp = jnp.dot(kw["codebook"].astype(dt), kw["in_proj"].astype(dt),
                     preferred_element_type=jnp.float32)
        w1 = kw["concat_w"][:De]
        w2 = kw["concat_w"][De:]
        h_cand = cp + jnp.dot(cp.astype(dt), w1.astype(dt),
                              preferred_element_type=jnp.float32)
        up_cand = jnp.dot(h_cand.astype(dt), kw["ffn_up"][0].astype(dt),
                          preferred_element_type=jnp.float32)
        table = jnp.concatenate(
            [kw["codebook"], h_cand, up_cand], axis=1).astype(dt)
        K = table.shape[0]
        G = K // A
        Wt = table.shape[1]
        tabr = table.reshape(A, G, Wt)
        # block-diagonal supergroup table (A/S, S*G, S*Wt)
        blocks = []
        for s in range(A // S):
            rows = []
            for j in range(S):
                row = jnp.zeros((G, S * Wt), dt)
                row = row.at[:, j * Wt : (j + 1) * Wt].set(tabr[s * S + j])
                rows.append(row)
            blocks.append(jnp.concatenate(rows, axis=0))
        tabbd = jnp.stack(blocks)
        cb = kw["concat_b"].reshape(1, -1)
        ops = [x, xh, kw["sub_codebook"], tabbd, w2.astype(dt), cb,
               kw["ffn_up"].astype(dt), kw["ffn_down"].astype(dt),
               kw["out_proj"].astype(dt)]
        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: tuple(0 for _ in a.shape),
            memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((row_tile // beams, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [full(o) for o in ops[2:]]
        out = pl.pallas_call(
            lambda *refs: sgfetch_kernel(spec, A, beams, S, *refs),
            out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((row_tile, A), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(*ops)
        return out[:NF]

    if check:
        kw = inputs[0]
        got = np.asarray(jax.jit(call)(**kw))
        want_ = np.asarray(fused_substep_scores_pallas(
            SPEC.with_(perbin=True), kw["x"], kw["xh"], kw["sub_codebook"],
            kw["codebook"], kw["in_proj"], kw["concat_w"], None,
            kw["concat_b"], kw["ffn_up"], kw["ffn_down"], kw["out_proj"],
            n_codes=A, beams=B, row_tile=row_tile,
            interpret=jax.default_backend() != "tpu",
        ))
        ok = np.allclose(got, want_, rtol=2e-3, atol=2e-3)
        print(f"{name}: check {'OK' if ok else 'MISMATCH'} "
              f"(max abs diff {np.abs(got - want_).max():.3e})")
        return

    jitted = jax.jit(lambda **kw: call(**kw).sum())
    dt = timeit(lambda **kw: jitted(**kw), inputs, iters)
    print(f"{name:12s}: {dt*1e3:8.3f} ms/step")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", type=str, default="full,sel,self")
    args = ap.parse_args()
    want = set(args.variants.split(","))

    inputs = [make_inputs(s) for s in range(3)]

    if "full" in want:
        @jax.jit
        def full(**kw):
            return fused_substep_scores_pallas(
                SPEC, kw["x"], kw["xh"], kw["sub_codebook"], kw["codebook"],
                kw["in_proj"], kw["concat_w"], None, kw["concat_b"],
                kw["ffn_up"], kw["ffn_down"], kw["out_proj"],
                n_codes=SPEC.A, beams=SPEC.B, row_tile=256,
            ).sum()

        dt = timeit(lambda **kw: full(**kw), inputs, args.iters)
        print(f"{'full':12s}: {dt*1e3:8.3f} ms/step")

    if "full512" in want:
        @jax.jit
        def full512(**kw):
            return fused_substep_scores_pallas(
                SPEC, kw["x"], kw["xh"], kw["sub_codebook"], kw["codebook"],
                kw["in_proj"], kw["concat_w"], None, kw["concat_b"],
                kw["ffn_up"], kw["ffn_down"], kw["out_proj"],
                n_codes=SPEC.A, beams=SPEC.B, row_tile=512,
            ).sum()

        dt = timeit(lambda **kw: full512(**kw), inputs, args.iters)
        print(f"{'full512':12s}: {dt*1e3:8.3f} ms/step")

    if "full128" in want:
        @jax.jit
        def full128(**kw):
            return fused_substep_scores_pallas(
                SPEC, kw["x"], kw["xh"], kw["sub_codebook"], kw["codebook"],
                kw["in_proj"], kw["concat_w"], None, kw["concat_b"],
                kw["ffn_up"], kw["ffn_down"], kw["out_proj"],
                n_codes=SPEC.A, beams=SPEC.B, row_tile=128,
            ).sum()

        dt = timeit(lambda **kw: full128(**kw), inputs, args.iters)
        print(f"{'full128':12s}: {dt*1e3:8.3f} ms/step")

    if "selected" in want:
        # The exact-selection production path (selected_scores_pallas):
        # outside packed-distance top-A + the fused-table scoring kernel.
        from qinco_tpu.ops.pallas_kernels import selected_scores_pallas

        def sel_vals(kw):
            xh = kw["xh"]
            NF = xh.shape[0]
            beams = SPEC.B
            x_f = jnp.broadcast_to(
                kw["x"][:, None, :], (NF // beams, beams, SPEC.D)
            ).reshape(NF, SPEC.D)
            C = kw["sub_codebook"]
            d = jnp.sum(C * C, axis=1)[None, :] - 2.0 * jnp.dot(
                x_f - xh, C.T, preferred_element_type=jnp.float32
            )
            d_pk = _pack_ids_f32(
                d, jnp.arange(C.shape[0], dtype=jnp.int32)[None, :]
            )
            nvals, _ = jax.lax.approx_max_k(-d_pk, SPEC.A)
            return (-nvals).T  # (A, NF)

        for rt in (256, 512):
            @jax.jit
            def sel_full(rt=rt, **kw):
                return selected_scores_pallas(
                    SPEC.with_(fused_substep=False), kw["x"], kw["xh"],
                    sel_vals(kw), kw["codebook"], kw["in_proj"],
                    kw["concat_w"], kw["concat_b"], kw["ffn_up"],
                    kw["ffn_down"], kw["out_proj"],
                    n_codes=SPEC.A, beams=SPEC.B, row_tile=rt,
                ).sum()

            dt = timeit(lambda **kw: sel_full(**kw), inputs, args.iters)
            print(f"{'selected@%d' % rt:14s}: {dt*1e3:8.3f} ms/step")

        # kernel-only: selection precomputed once outside the timed scan
        vals0 = jax.jit(sel_vals)(inputs[0])

        @jax.jit
        def sel_kernel_only(**kw):
            return selected_scores_pallas(
                SPEC.with_(fused_substep=False), kw["x"], kw["xh"], vals0,
                kw["codebook"], kw["in_proj"], kw["concat_w"],
                kw["concat_b"], kw["ffn_up"], kw["ffn_down"],
                kw["out_proj"],
                n_codes=SPEC.A, beams=SPEC.B, row_tile=256,
            ).sum()

        dt = timeit(lambda **kw: sel_kernel_only(**kw), inputs, args.iters)
        print(f"{'selected-ko':14s}: {dt*1e3:8.3f} ms/step")

    if "selcat" in want:
        # selected-kernel fetch as ONE (A*R, K) @ (K, Wt) matmul (masks
        # concatenated before the contraction) instead of A per-slot
        # matmuls — same FLOPs, possibly better MXU scheduling.
        from qinco_tpu.ops.pallas_kernels import _round_up as _ru

        def selcat_kernel(spec, A, beams, x_ref, xh_ref, vals_ref, tab_ref,
                          w2_ref, cb_ref, fu_ref, fd_ref, op_ref, dist_ref):
            R = xh_ref.shape[0]
            K = tab_ref.shape[0]
            D = spec.D
            dt = jnp.dtype(spec.compute_dtype)
            xv = x_ref[:].astype(jnp.float32)
            xv = jnp.broadcast_to(
                xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
            xh = xh_ref[:].astype(jnp.float32)
            vals = vals_ref[:]
            ids = jnp.bitwise_and(
                jax.lax.bitcast_convert_type(vals, jnp.int32),
                jnp.int32(0xFF))
            cc_cond = jnp.dot(xh.astype(dt), w2_ref[:].astype(dt),
                              preferred_element_type=jnp.float32)
            ccb = cc_cond + cb_ref[0, :]
            tab = tab_ref[:].astype(dt)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, K), dimension=1)
            mask = jnp.concatenate(
                [(col == ids[a][:, None]).astype(dt) for a in range(A)],
                axis=0)  # (A*R, K)
            ext = jnp.dot(mask, tab,
                          preferred_element_type=jnp.float32).astype(dt)
            cand = ext[:, :D].astype(jnp.float32)
            De = ccb.shape[1]
            h = (ext[:, D:]
                 + jnp.broadcast_to(ccb[None], (A, R, De)).reshape(A * R, De)
                 ).astype(dt)
            for l in range(spec.L):
                up = jnp.dot(h, fu_ref[l].astype(dt),
                             preferred_element_type=jnp.float32)
                up = jnp.maximum(up, 0.0).astype(dt)
                down = jnp.dot(up, fd_ref[l].astype(dt),
                               preferred_element_type=jnp.float32)
                h = h + down.astype(dt)
            out = jnp.dot(h, op_ref[:].astype(dt),
                          preferred_element_type=jnp.float32)
            out = out + cand
            cond = jnp.broadcast_to(xh[None], (A, R, D)).reshape(A * R, D)
            diff = (jnp.broadcast_to(xv[None], (A, R, D)).reshape(A * R, D)
                    - out - cond)
            d = jnp.sum(diff * diff, axis=-1).reshape(A, R)
            dist_ref[:] = _pack_ids_f32(d, ids).T

        def run_selcat(row_tile):
            spec = SPEC.with_(fused_substep=False)
            A, B = spec.A, spec.B
            NF = 4096 * B
            D, De = spec.D, spec.de

            def call(**kw):
                dt = jnp.dtype(spec.compute_dtype)
                xh = kw["xh"]
                x_f = jnp.broadcast_to(
                    kw["x"][:, None, :], (NF // B, B, D)).reshape(NF, D)
                C = kw["sub_codebook"]
                dd = jnp.sum(C * C, axis=1)[None, :] - 2.0 * jnp.dot(
                    x_f - xh, C.T, preferred_element_type=jnp.float32)
                d_pk = _pack_ids_f32(
                    dd, jnp.arange(C.shape[0], dtype=jnp.int32)[None, :])
                nvals, _ = jax.lax.approx_max_k(-d_pk, A)
                vals = (-nvals).T
                cp = jnp.dot(kw["codebook"].astype(dt),
                             kw["in_proj"].astype(dt),
                             preferred_element_type=jnp.float32)
                w1 = kw["concat_w"][:De]
                w2 = kw["concat_w"][De:].astype(dt)
                h_cand = cp + jnp.dot(cp.astype(dt), w1.astype(dt),
                                      preferred_element_type=jnp.float32)
                table = jnp.concatenate(
                    [kw["codebook"], h_cand], axis=1).astype(dt)
                cb = kw["concat_b"].reshape(1, -1)
                pad = _ru(NF, row_tile) - NF
                n_tiles = (NF + pad) // row_tile
                ops = [kw["x"], xh, vals, table, w2, cb,
                       kw["ffn_up"].astype(dt), kw["ffn_down"].astype(dt),
                       kw["out_proj"].astype(dt)]
                full = lambda a: pl.BlockSpec(
                    a.shape, lambda i: tuple(0 for _ in a.shape),
                    memory_space=pltpu.VMEM)
                in_specs = [
                    pl.BlockSpec((row_tile // B, D), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, row_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ] + [full(o) for o in ops[3:]]
                out = pl.pallas_call(
                    lambda *refs: selcat_kernel(spec, A, B, *refs),
                    out_shape=jax.ShapeDtypeStruct((NF + pad, A),
                                                   jnp.float32),
                    grid=(n_tiles,),
                    in_specs=in_specs,
                    out_specs=pl.BlockSpec((row_tile, A), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    interpret=jax.default_backend() != "tpu",
                )(*ops)
                return out[:NF].sum()

            jitted = jax.jit(call)
            dt_s = timeit(lambda **kw: jitted(**kw), inputs, args.iters)
            print(f"{'selcat@%d' % row_tile:14s}: {dt_s*1e3:8.3f} ms/step")

        for rt in (256, 512):
            run_selcat(rt)

    if "sel" in want:
        run_variant("sel", sel_kernel, [], args.iters)

    if "selrt" in want:
        for rt in (512, 1024, 2048):
            run_variant(f"sel@rt{rt}", sel_kernel, [], args.iters,
                        row_tile=rt)

    if "dsub" in want:
        # distances + pack only, no bin-min loop: isolates the G-slab min
        def dsub_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, dist_ref):
            R = xh_ref.shape[0]
            K = sc_ref.shape[0]
            D = spec.D
            dt = jnp.dtype(spec.compute_dtype)
            xv = x_ref[:].astype(jnp.float32)
            xv = jnp.broadcast_to(
                xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
            xh = xh_ref[:].astype(jnp.float32)
            r = xv - xh
            C = sc_ref[:]
            cn2 = jnp.sum(C * C, axis=1)[:, None]
            d_sub = cn2 - 2.0 * jax.lax.dot_general(
                C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
            ds_p = _pack_ids_f32(d_sub, rowk)
            # lane-axis-preserving reduce to (R, A): sum over K/A groups
            dist_ref[:] = jnp.sum(
                ds_p.reshape(A, K // A, R), axis=1
            ).T
        run_variant("dsub", dsub_kernel, [], args.iters)

    if "noop" in want:
        # pure streaming: read tiles, write a (R, A) slice — floor cost
        def noop_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, dist_ref):
            xh = xh_ref[:]
            dist_ref[:] = xh[:, : A] * 2.0
        run_variant("noop", noop_kernel, [], args.iters)
        for rt in (512, 2048):
            run_variant(f"noop@rt{rt}", noop_kernel, [], args.iters,
                        row_tile=rt)

    if "self" in want or "sel+fetch" in want:
        def body(spec, A, beams, x_r, xh_r, sc_r, tab_r, out_r):
            off_h, off_w1 = SPEC.D, SPEC.D + SPEC.de
            sel_fetch_kernel(spec, A, beams, off_h, off_w1,
                             x_r, xh_r, sc_r, tab_r, out_r)
        run_variant("sel+fetch", body, ["table"], args.iters)

    if "bw" in want:
        # raw-bandwidth probes: xh f32 vs bf16 read, small out
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            for rt in (512, 2048):
                def call(xh):
                    NF = xh.shape[0]
                    n_tiles = NF // rt
                    def bwk(xh_ref, o_ref):
                        sm = jnp.sum(
                            xh_ref[:].astype(jnp.float32), axis=0,
                            keepdims=True)
                        o_ref[:] = jnp.broadcast_to(sm, (8, 128))

                    out = pl.pallas_call(
                        bwk,
                        out_shape=jax.ShapeDtypeStruct(
                            (n_tiles * 8, 128), jnp.float32
                        ),
                        grid=(n_tiles,),
                        in_specs=[pl.BlockSpec((rt, 128), lambda i: (i, 0),
                                               memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                               memory_space=pltpu.VMEM),
                    )(xh)
                    return out.sum()

                xh0 = jnp.asarray(
                    np.random.default_rng(0).normal(size=(4096 * 32, 128)),
                    dtype,
                )
                jf = jax.jit(call)

                @jax.jit
                def run(xh):
                    def body(acc, i):
                        return acc + jf(xh * (1 + i * 1e-6).astype(dtype)), None
                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((), jnp.float32),
                        jnp.arange(args.iters))
                    return acc

                float(np.asarray(run(xh0)))
                t0 = time.perf_counter()
                float(np.asarray(run(xh0)))
                dt = (time.perf_counter() - t0) / args.iters
                mb = 4096 * 32 * 128 * (4 if dtype == jnp.float32 else 2) / 1e6
                print(f"bw {tag}@rt{rt}: {dt*1e3:8.3f} ms "
                      f"({mb/dt/1e3:.0f} GB/s)")

    if "fetchb" in want:
        # batched-dot_general fetch: one (A,G,R)x(A,G,Wt) -> (A,R,Wt) op
        def fetchb_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, tab_ref,
                          dist_ref):
            R = xh_ref.shape[0]
            K = sc_ref.shape[0]
            G = K // A
            dt = jnp.dtype(spec.compute_dtype)
            xv, xh, ds3, m = _selection(spec, A, beams, x_ref, xh_ref, sc_ref)
            mask3 = ds3 == m[:, None, :]
            tab = tab_ref[:].astype(dt).reshape(A, G, -1)
            ext = jax.lax.dot_general(
                mask3.astype(dt), tab, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (A, R, Wt)
            ext = ext.reshape(A * R, tab.shape[-1])
            dist_ref[:] = jnp.sum(ext * ext, axis=-1).reshape(A, R).T
        run_variant("fetchb", fetchb_kernel, ["table"], args.iters)

    if "perbin" in want:
        run_perbin("perbin@512", args.iters, row_tile=512)
        run_perbin("perbin@256", args.iters, row_tile=256)

    if "sgfetch" in want:
        run_sgfetch("sg8@256", args.iters, S=8, row_tile=256)
        run_sgfetch("sg4@256", args.iters, S=4, row_tile=256)
        run_sgfetch("sg4@512", args.iters, S=4, row_tile=512)

    if "sgcheck" in want:
        run_sgfetch("sg8check", args.iters, S=8, row_tile=256, check=True)
        run_sgfetch("sg4check", args.iters, S=4, row_tile=256, check=True)

    if "fullopt" in want:
        run_variant("fullopt", fullopt_kernel, ["table"], args.iters)
        run_variant("fullopt@512", fullopt_kernel, ["table"], args.iters,
                    row_tile=512)

    if "mlponly" in want:
        # skip selection+fetch: synthesize the (A*R, .) rows from xh and
        # run cond-half + FFN chain + distance — isolates the MLP cost
        def mlponly_kernel(spec, A, beams, x_ref, xh_ref, sc_ref, tab_ref,
                           dist_ref):
            R = xh_ref.shape[0]
            D, De = spec.D, spec.de
            dt = jnp.dtype(spec.compute_dtype)
            xv = x_ref[:].astype(jnp.float32)
            xv = jnp.broadcast_to(
                xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
            xh = xh_ref[:].astype(jnp.float32)
            tab = tab_ref[:]
            # fake per-candidate rows: tile the table's first A*? rows
            ext = jnp.broadcast_to(
                tab[0:1, :], (R * A, tab.shape[1])
            )  # single-row broadcast avoids a gather lowering
            cand = ext[:, :D]
            h = ext[:, D : D + De].astype(dt)
            w1h = ext[:, D + De :]
            W2 = sc_ref[:]  # reuse sub_codebook (K=256>=D rows? (K,D)) as W2
            cc_cond = jnp.dot(
                xh.astype(dt), W2[:D].astype(dt),
                preferred_element_type=jnp.float32,
            )  # (R, D)
            cc = w1h + jnp.broadcast_to(
                cc_cond[:, None, :], (R, A, De)
            ).reshape(R * A, De)
            h = h + cc.astype(dt)
            w_up = tab[:De, : spec.dh].astype(dt)  # (De, Dh) fake weights
            w_down = tab[: spec.dh, :De].astype(dt)  # (Dh, De)
            w_out = W2[:De, :D].astype(dt)
            for l in range(spec.L):
                up = jnp.dot(h, w_up, preferred_element_type=jnp.float32)
                up = jnp.maximum(up, 0.0).astype(dt)
                down = jnp.dot(up, w_down, preferred_element_type=jnp.float32)
                h = h + down.astype(dt)
            out = jnp.dot(h, w_out, preferred_element_type=jnp.float32)
            out = out + cand
            cond = jnp.broadcast_to(
                xh[:, None, :], (R, A, D)).reshape(R * A, D)
            cand_abs = out + cond
            diff = jnp.broadcast_to(
                xv[:, None, :], (R, A, D)).reshape(R * A, D) - cand_abs
            d = jnp.sum(diff * diff, axis=-1)
            dist_ref[:] = d.reshape(R, A)
        run_variant("mlponly", mlponly_kernel, ["table"], args.iters)


if __name__ == "__main__":
    main()
