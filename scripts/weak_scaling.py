#!/usr/bin/env python
"""Multi-device scaling profile on the virtual CPU mesh (VERDICT r2 #8).

Real multi-chip hardware is unavailable in this environment (one tunneled
v5e chip), so this measures the SHARDING OVERHEAD profile on the 8-device
virtual CPU mesh: total batch held fixed while the device count grows
1 -> 2 -> 4 -> 8.  The physical cores are constant, so with zero
partition/collective overhead wall time would stay flat; any slowdown is
the cost of the sharded program (collective ops, padded layouts,
per-shard dispatch).  Real-ICI efficiency (the >=80%-to-2-hosts north
star) cannot be measured here — collectives ride shared host memory, not
ICI — and this script documents that explicitly in its output.

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/weak_scaling.py

Writes docs-ready JSON to --out (default /tmp/weak_scaling.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def time_fn(fn, *args, reps=3):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/weak_scaling.json")
    ap.add_argument("--batch", type=int, default=2048,
                    help="fixed TOTAL batch (weak-scaling per-device "
                         "batch = batch / n)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qinco_tpu.config import load_config
    from qinco_tpu.models import init_model_state, init_params
    from qinco_tpu.models.qinco import encode_raw
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch, shard_stacked_batch)
    from qinco_tpu.train.train_step import build_optimizer, make_train_step

    devices = jax.devices("cpu")
    assert len(devices) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8")

    spec = QincoSpec(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32)
    cfg = load_config({"K": spec.K, "M": spec.M, "lr": 1e-3})
    report = {
        "protocol": "fixed total batch, virtual CPU devices on fixed "
                    "physical cores: slowdown vs n=1 isolates "
                    "partition/collective overhead.  Real-ICI scaling "
                    "efficiency is NOT measurable in this environment "
                    "(single tunneled chip; collectives ride host "
                    "shared memory).",
        "total_batch": args.batch,
        "encode": {},
        "train_step": {},
    }

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(args.batch, spec.D)).astype(np.float32)
    xt_np = rng.normal(size=(args.batch, spec.D)).astype(np.float32)
    wt_np = np.ones((args.batch,), np.float32)

    for n in (1, 2, 4, 8):
        mesh = make_mesh(data=n, model=1, devices=devices[:n])
        params = replicate(mesh, init_params(jax.random.PRNGKey(0), spec))

        # --- encode ---
        xb = shard_batch(mesh, x_np)

        def enc(params, xb):
            return jax.block_until_ready(encode_raw(params, spec, xb))

        dt = time_fn(enc, params, xb, reps=args.reps)
        report["encode"][str(n)] = round(dt * 1e3, 1)

        # --- train step ---
        mstate = replicate(mesh, init_model_state(spec))
        tx = build_optimizer(cfg, jax.device_get(params), spec)
        opt_state = replicate(mesh, tx.init(jax.device_get(params)))
        step = make_train_step(spec, tx, grad_clip=0.1, accum=1)
        xt = shard_batch(mesh, xt_np)
        wt = shard_batch(mesh, wt_np)

        # the train step donates params/opt_state: re-thread the returned
        # state into the next call instead of reusing dead buffers
        state = [params, opt_state, mstate]

        def tr():
            p, o, m, out = step(state[0], state[1], state[2], xt, wt)
            jax.block_until_ready(out.total_loss)
            state[0], state[1], state[2] = p, o, m

        dt = time_fn(tr, reps=args.reps)
        report["train_step"][str(n)] = round(dt * 1e3, 1)
        print(json.dumps({"n": n, "encode_ms": report["encode"][str(n)],
                          "train_ms": report["train_step"][str(n)]}),
              flush=True)

    for k in ("encode", "train_step"):
        base = report[k]["1"]
        report[f"{k}_overhead_vs_1dev_pct"] = {
            n: round(100 * (v / base - 1), 1) for n, v in report[k].items()}

    Path(args.out).write_text(json.dumps(report, indent=1))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
