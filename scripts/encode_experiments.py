#!/usr/bin/env python
"""One-process batch of encode-path experiments (axon dials are slow, so
everything rides a single interpreter):

  1. full-encode throughput at batch 4096 / 8192 / 16384
  2. beam top-k cost under the scan protocol: exact lax.top_k vs
     approx_max_k on the (N, F*A) distance tile
  3. approx top-k MSE impact (code quality) at batch 4096
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from qinco_tpu.models import init_params
from qinco_tpu.models.qinco import encode, topk_smallest
from qinco_tpu.models.spec import QincoSpec

SPEC = QincoSpec(
    D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
    fast=True, pallas=True, fused_substep=True, compute_dtype="bfloat16",
)


def scan_time(fn, x, iters=20):
    @jax.jit
    def run(x):
        def body(acc, i):
            return acc + fn(x * (1.0 + i.astype(jnp.float32) * 1e-6)), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters))
        return acc

    float(np.asarray(run(x)))
    t0 = time.perf_counter()
    float(np.asarray(run(x)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), SPEC)
    print("devices:", jax.devices(), flush=True)

    # 1. batch scaling
    for N in (4096, 8192, 16384):
        xs = [jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
              for _ in range(3)]

        @jax.jit
        def full(x):
            codes, _, _ = encode(params, SPEC, x)
            return codes.sum()

        float(np.asarray(full(xs[0])))
        iters = max(4, 32768 // N)
        t0 = time.perf_counter()
        for i in range(iters):
            r = full(xs[i % 3])
        float(np.asarray(r))
        dt = (time.perf_counter() - t0) / iters
        print(f"encode batch {N}: {dt*1e3:8.2f} ms  ({N/dt:,.0f} vec/s)",
              flush=True)

    # 2. top-k timing on the beam tile
    N = 4096
    d = jnp.asarray(
        np.abs(rng.normal(size=(N, SPEC.B * SPEC.A))).astype(np.float32))

    def exact(x):
        idx, vals = topk_smallest(x, SPEC.B)
        return vals.sum()

    def approx(x):
        neg, idx = jax.lax.approx_max_k(-x, SPEC.B)
        return (-neg).sum()

    print(f"topk exact : {scan_time(exact, d)*1e3:8.3f} ms", flush=True)
    print(f"topk approx: {scan_time(approx, d)*1e3:8.3f} ms", flush=True)

    # 3. approx-topk selection quality: overlap with the exact top-B set
    idx_e, _ = topk_smallest(d, SPEC.B)
    _, idx_a = jax.lax.approx_max_k(-d, SPEC.B)
    ov = np.mean([
        len(set(np.asarray(a)) & set(np.asarray(b))) / SPEC.B
        for a, b in zip(np.asarray(idx_e)[:256], np.asarray(idx_a)[:256])
    ])
    print(f"approx/exact top-{SPEC.B} overlap: {ov:.4f}", flush=True)


if __name__ == "__main__":
    main()
