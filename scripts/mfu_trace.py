#!/usr/bin/env python
"""Profiler-verified MFU for the encode hot path (VERDICT r4 #6).

docs/architecture.md's "~55-60% MFU" was an analytic FLOP-floor
estimate.  This script derives MFU from MEASURED wall-clock against the
known FLOP content of one encode dispatch, and captures a
``jax.profiler`` trace alongside so the number is auditable:

    MFU = (FLOPs per dispatch) / (measured dispatch time x peak FLOPs)

FLOP accounting (per vector, QINCo2-S, the same floor used by the
analytic estimate — kernel matmuls only, elementwise free):
  per MLP step (M-1 of them at beam F=B, first step F=1):
    fetch        2·A·K·Wt          (one-hot candidate fetch, per beam row)
    MLP          2·A·(L·2·De·Dh + [proj terms])
    substep      2·K·D             (partial-distance matmul, per beam row)
    distance     2·A·D             (candidate scoring, per beam row)
    select+rebuild (fsel kernel)   2·F_out·(VtF_in + K)·D / Vt per row
Peak: v5e MXU 197 TFLOP/s bf16.

Writes bench_artifacts/mfu_r5.json and a trace under
bench_artifacts/mfu_trace/ (viewable with tensorboard or xprof).

Run WITH the axon TPU env:  python scripts/mfu_trace.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

PEAK_BF16 = 197e12  # v5e MXU peak, FLOP/s


def encode_flops_per_vector(spec) -> float:
    """MXU FLOPs per encoded vector for the perbin/ktopa kernel routes
    (matmul terms only — the analytic floor the MFU denominator uses)."""
    D, K, A, B, L = spec.D, spec.K, spec.A, spec.B, spec.L
    De, Dh = spec.De, spec.dh
    flops = 0.0
    # step 0: argmin over K0 (2·K·D per vector)
    flops += 2 * K * D
    n_mlp = spec.M - 1 if not spec.ivf_in_use else spec.M
    for i in range(n_mlp):
        F_in = 1 if i == 0 and not spec.ivf_in_use else B
        per_row = 0.0
        # substep partial distances (K, R) matmul: 2·K·D per beam row
        per_row += 2 * K * D
        if spec.fused_substep:
            # G-wide binned fetch of the [C | CP(I+W1) | CPW1U0] table
            Wt = D + De + (Dh if spec.fold_up else 0)
            per_row += 2 * A * (K // A) * Wt
            mlp_L = L - (1 if spec.fold_up else 0)
            up0 = 0 if spec.fold_up else 2 * De * Dh
        else:
            # full-K one-hot fetch (exactness price); lean fetch under
            # spec.fast fetches D columns + dense (D, De) fold
            Wt = D if spec.fast else D + De
            per_row += 2 * A * K * Wt
            if spec.fast:
                per_row += 2 * A * D * De
            mlp_L = L
            up0 = 0
        # condition half on the beam row: W2 (D, De) + first-up (De, Dh)
        per_row += 2 * D * De + (2 * De * Dh if spec.fused_substep
                                 and spec.fold_up else 0)
        # FFN chain on A candidate rows
        per_row += A * (up0 + mlp_L * 2 * 2 * De * Dh)
        # in/out projections
        if spec.de and spec.de != D:
            per_row += 2 * A * (De * D)  # out_proj (in_proj rides fetch)
        # candidate distance: 2·D per candidate
        per_row += 2 * A * D
        flops += F_in * per_row
        # select+rebuild kernel (fsel): one-hot gathers on the MXU
        if spec.fused_select:
            F_out = B
            Vt = 64
            flops += F_out * (2 * Vt * F_in * D + 2 * K * D + 2 * D * De
                              + L * 2 * 2 * De * Dh)
    return flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--profile", default="perbin_fsel",
                    choices=["perbin_fsel", "perbin", "ktopa_fsel", "ktopa"])
    ap.add_argument("--out", default=str(
        Path(__file__).parent.parent / "bench_artifacts" / "mfu_r5.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode as encode_n
    from qinco_tpu.models.spec import QincoSpec

    overrides = {
        "perbin_fsel": dict(fused_substep=True, perbin=True,
                            fused_select=True),
        "perbin": dict(fused_substep=True, perbin=True),
        "ktopa_fsel": dict(fused_select=True),
        "ktopa": dict(),
    }[args.profile]
    spec = QincoSpec(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
                     fast=True, pallas=True, compute_dtype="bfloat16",
                     **overrides)
    params = init_params(jax.random.PRNGKey(0), spec)

    # One dispatch runs n_iter batches via scan (the bench protocol):
    # on the remote-TPU relay a single small dispatch measures transport
    # latency, not device time — 32 batches amortize it away.
    n_iter = 32

    @jax.jit
    def encode_many(params, xs):
        def body(_, x):
            codes, _, _ = encode_n(params, spec, x)
            return None, codes.sum()

        _, sums = jax.lax.scan(body, None, xs)
        return sums.sum()

    xs = jnp.asarray(np.random.default_rng(0)
                     .normal(size=(n_iter, args.batch, spec.D))
                     .astype(np.float32))
    float(encode_many(params, xs))  # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(encode_many(params, xs))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_iter  # per batch

    # capture one traced dispatch for auditability
    trace_dir = Path(args.out).parent / "mfu_trace"
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        float(encode_many(params, xs))

    fpv = encode_flops_per_vector(spec)
    total = fpv * args.batch
    mfu = total / (dt * PEAK_BF16)
    # Reference-equivalent accounting: the math a straight per-candidate
    # implementation (reference qinco_inference.py:143-224) performs —
    # in_proj + full concat + L FFN blocks + out_proj + distance per
    # candidate, substep distances per beam row.  Our kernels execute
    # FEWER FLOPs than this (the concat candidate half and first-FFN up
    # are precomputed per step over K, not per A·R row), so
    # mfu_reference_equivalent > mfu_achieved is expected and measures
    # "reference work per second" against peak.
    D, K, A, B, L = spec.D, spec.K, spec.A, spec.B, spec.L
    De, Dh = spec.De, spec.dh
    per_cand = (2 * D * De if spec.de and spec.de != D else 0)
    per_cand += 2 * (De + D) * De + L * 2 * 2 * De * Dh
    per_cand += (2 * De * D if spec.de and spec.de != D else 0) + 2 * D
    per_row = 2 * K * D + A * per_cand
    n_mlp = spec.M - 1 if not spec.ivf_in_use else spec.M
    rows = sum(1 if i == 0 and not spec.ivf_in_use else B
               for i in range(n_mlp))
    useful = 2 * K * D + rows * per_row  # + step-0 argmin
    mfu_useful = (useful * args.batch) / (dt * PEAK_BF16)
    rec = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "profile": args.profile,
        "batch": args.batch,
        "n_iter_per_dispatch": n_iter,
        "batch_time_s_median3": round(dt, 6),
        "vec_per_s": round(args.batch / dt, 1),
        "flops_per_vector_achieved": round(fpv),
        "mfu_achieved_vs_197T_bf16": round(mfu, 4),
        "flops_per_vector_reference_equivalent": round(useful),
        "mfu_reference_equivalent_vs_197T_bf16": round(mfu_useful, 4),
        "trace_dir": str(trace_dir),
        "note": "achieved = the kernel matmul FLOPs actually executed "
                "(incl. one-hot fetch/select gathers, the TPU-structural "
                "gather cost; our kernels algebraically delete part of "
                "the reference's per-candidate math, so achieved < "
                "reference-equivalent) / (measured per-batch time x 197 "
                "TFLOPs bf16 peak); reference_equivalent = the FLOPs a "
                "straight per-candidate implementation performs for the "
                "same encode.  Both exclude VPU/elementwise work, so "
                "achieved is a LOWER bound on MXU duty cycle. Trace "
                "captured for audit.",
    }
    print(json.dumps(rec, indent=1), flush=True)
    Path(args.out).write_text(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
