#!/usr/bin/env python
"""Per-component profile of the QINCo2-S encode hot path on one chip.

Times, with host readback (block_until_ready does not guarantee
completion on the axon transport) and input rotation (identical
dispatches may be served from a transport cache):

  full      : encode() end-to-end, batch 4096
  kernel    : one fused-substep kernel dispatch at steady-state shapes
              (NF = N*B rows)
  topk      : topk_smallest on the (N, B*A) distance tile
  recompute : the selected-beam reconstruction recompute (N*B rows)
  stepx     : one full _beam_step_fused at steady-state shapes

Usage: python scripts/profile_encode.py [--batch 4096] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, inputs, iters):
    """fn(x) -> array; rotates inputs, forces readback, returns s/call."""
    float(np.asarray(fn(inputs[0])).ravel()[0])  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(inputs[i % len(inputs)])
    float(np.asarray(r).ravel()[0])
    # one extra readback per call would double-count transport latency;
    # a single final readback after `iters` dispatches measures the
    # pipelined device time (matches bench.py's scan-readback protocol).
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", choices=("fused", "perbin"), default="fused",
                    help="which binned kernel chain to profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import (
        _beam_step_fused,
        encode,
        step_predict,
        topk_smallest,
    )
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.ops.pallas_kernels import fused_substep_scores_pallas

    spec = QincoSpec(
        D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
        fast=True, pallas=True, fused_substep=True, compute_dtype="bfloat16",
        perbin=(args.profile == "perbin"),
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    N = args.batch
    B, A, D = spec.B, spec.A, spec.D
    NF = N * B
    rng = np.random.default_rng(0)
    n_bufs = 4

    xs = [jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
          for _ in range(n_bufs)]

    # --- full encode ---
    @jax.jit
    def full(x):
        codes, _, _ = encode(params, spec, x)
        return codes.sum()

    t_full = timeit(full, xs, args.iters)
    print(f"full      : {t_full * 1e3:8.2f} ms  "
          f"({N / t_full:,.0f} vec/s)", flush=True)

    # --- steady-state beam step inputs ---
    p = jax.tree.map(lambda a: a[1], params.steps)
    xh_bufs = [jnp.asarray(rng.normal(size=(NF, D)).astype(np.float32) * 0.1)
               for _ in range(n_bufs)]

    # --- fused kernel alone (row tile matches _beam_step_fused's budget) ---
    row_tile = max(8, min(512, 8192 // A))

    @jax.jit
    def kernel(xh):
        d = fused_substep_scores_pallas(
            spec, xs[0], xh, p.sub_codebook, p.codebook, p.in_proj,
            p.concat_w, p.concat_w2, p.concat_b, p.ffn_up, p.ffn_down,
            p.out_proj, n_codes=A, beams=B, row_tile=row_tile,
        )
        return d.sum()

    t_k = timeit(kernel, xh_bufs, args.iters)
    print(f"kernel    : {t_k * 1e3:8.2f} ms/step  (x{spec.M - 1} steps = "
          f"{t_k * (spec.M - 1) * 1e3:.1f} ms)", flush=True)

    # --- topk alone ---
    d_bufs = [jnp.asarray(rng.normal(size=(N, B * A)).astype(np.float32) ** 2)
              for _ in range(n_bufs)]

    @jax.jit
    def topk(d):
        sel, vals = topk_smallest(d, B)
        return vals.sum() + sel.sum()

    t_t = timeit(topk, d_bufs, args.iters)
    print(f"topk      : {t_t * 1e3:8.2f} ms/step  (x{spec.M - 1})", flush=True)

    # --- recompute alone ---
    cand_bufs = [
        (
            jnp.asarray(rng.integers(0, spec.K, size=(N, B)).astype(np.int32)),
            jnp.asarray(rng.normal(size=(N, B, D)).astype(np.float32) * 0.1),
        )
        for _ in range(n_bufs)
    ]

    @jax.jit
    def recompute(args_):
        real, xh_sel = args_
        cand_sel = p.codebook[real]
        NB = N * B
        pred = step_predict(
            spec, p, cand_sel.reshape(NB, 1, D), xh_sel.reshape(NB, D)
        )
        return pred.sum()

    t_r = timeit(recompute, cand_bufs, args.iters)
    print(f"recompute : {t_r * 1e3:8.2f} ms/step  (x{spec.M - 1})", flush=True)

    # --- one full fused beam step ---
    xhat_bufs = [xh.reshape(N, B, D) for xh in xh_bufs]

    @jax.jit
    def stepx(xhat):
        xh_n, real, par, _ = _beam_step_fused(
            spec, p, xs[0], xhat, B, A, None, want_stats=False
        )
        return xh_n.sum() + real.sum()

    t_s = timeit(stepx, xhat_bufs, args.iters)
    print(f"stepx     : {t_s * 1e3:8.2f} ms/step  (x{spec.M - 1} = "
          f"{t_s * (spec.M - 1) * 1e3:.1f} ms)", flush=True)

    resid = t_full - t_s * (spec.M - 1)
    print(f"residual (step0 argmin + first step + backtrace + glue): "
          f"{resid * 1e3:.1f} ms")

    # --- fused select+rebuild kernel alone (replaces topk + recompute) ---
    from qinco_tpu.ops.pallas_kernels import select_rebuild_pallas

    pk_bufs = [
        jnp.asarray(
            rng.normal(size=(N, B * A)).astype(np.float32) ** 2
            + rng.integers(0, spec.K, size=(N, B * A)).astype(np.float32)
            * 1e-7  # packed-id-ish low bits; values stay pairwise distinct
        )
        for _ in range(n_bufs)
    ]

    @jax.jit
    def fsel(d):
        xh_n, real, par = select_rebuild_pallas(
            spec, d, xh_bufs[0], p.codebook, p.in_proj, p.concat_w,
            p.concat_w2, p.concat_b, p.ffn_up, p.ffn_down, p.out_proj,
            A_eff=A, F_out=B, vec_tile=spec.select_tile or 64,
        )
        return xh_n.sum() + real.sum()

    t_f = timeit(fsel, pk_bufs, args.iters)
    print(f"fsel      : {t_f * 1e3:8.2f} ms/step  (x{spec.M - 1}; replaces "
          f"topk {t_t * 1e3:.2f} + recompute {t_r * 1e3:.2f})", flush=True)

    # --- one full beam step with fused_select ---
    spec_fs = spec.with_(fused_select=True)

    @jax.jit
    def stepx_fs(xhat):
        xh_n, real, par, _ = _beam_step_fused(
            spec_fs, p, xs[0], xhat, B, A, None, want_stats=False
        )
        return xh_n.sum() + real.sum()

    t_sf = timeit(stepx_fs, xhat_bufs, args.iters)
    print(f"stepx_fsel: {t_sf * 1e3:8.2f} ms/step  (x{spec.M - 1} = "
          f"{t_sf * (spec.M - 1) * 1e3:.1f} ms)", flush=True)

    flop_mlp = 2 * NF * A * (D * spec.de / A  # fetch amortized: G-wide
                             + spec.de * D    # out_proj
                             + spec.L * 2 * spec.de * spec.dh)
    print(f"kernel MLP TFLOP/step ~ {flop_mlp / 1e12:.2f}; "
          f"kernel sustained {flop_mlp / t_k / 1e12:.1f} TFLOP/s "
          f"({flop_mlp / t_k / 197e12 * 100:.0f}% of v5e bf16 peak)")


if __name__ == "__main__":
    main()
