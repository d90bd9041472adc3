#!/usr/bin/env python
"""Benchmark: QINCo2-S beam-search encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the only end-to-end encode throughput figure published inside
the reference repo — 1M x 256-d vectors in 349.6 s ~= 2,860 vec/s on one
GPU (reference: qinco_v1/docs/PQ_QINCo.md:62; see BASELINE.md).  Our
metric is the QINCo2-S full pipeline (substep pre-selection A=16, beam
B=32, M=8 steps, K=256, D=128) which does strictly more work per vector
than that baseline's PQ variant.

Outage resilience (the round-2 lesson — BENCH_r02.json rc=124):
- each profile runs in its OWN subprocess with a hard wall-clock budget,
  so one hung axon dial / Mosaic compile cannot eat the whole run;
- the measured-known-good rung (fused_substep, 56k vec/s on 2026-08-17)
  runs FIRST; unproven kernels are probed only with leftover budget;
- the axon "backend UNAVAILABLE" signature fails fast with one bounded
  retry instead of a 25-minute re-dial hang;
- the final JSON line is emitted from the best profile that completed,
  even if later rungs died.

Usage:
  python bench.py                 # orchestrate (the driver runs this)
  python bench.py --profile NAME  # child mode: measure one profile
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Profile ladder, ordered measured-good-first (every rung's number is a
# real-v5e measurement from /tmp/tpu_session_r3.json, 2026-08-18).
# Values are QincoSpec keyword overrides on top of the qinco2-S shape.
PROFILES = [
    # per-bin G-hot batched-matmul kernel: 86.2k vec/s measured
    ("perbin", dict(fast=True, pallas=True, fused_substep=True,
                    compute_dtype="bfloat16", perbin=True)),
    # fused binned kernel: 62.5k vec/s measured
    ("fused", dict(fast=True, pallas=True, fused_substep=True,
                   compute_dtype="bfloat16")),
    # exact top-A selection kernel (reference-parity numerics, -0.015%
    # MSE): 50.5k vec/s measured
    ("selected", dict(fast=True, pallas=True, compute_dtype="bfloat16")),
    # fused without the folded-up table (narrower VMEM footprint)
    ("fused_nofold", dict(fast=True, pallas=True, fused_substep=True,
                          compute_dtype="bfloat16", fold_up=False)),
    ("xla_fast", dict(fast=True, compute_dtype="bfloat16")),
    ("exact", dict()),
]

# The axon outage presents as either an instant RuntimeError mentioning
# UNAVAILABLE / failed-to-connect, or a silent multi-minute dial hang
# (the hang is handled by the per-profile timeout).
OUTAGE_MARKERS = ("UNAVAILABLE", "failed to connect", "Connection reset",
                  "DEADLINE_EXCEEDED", "Socket closed")

TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 840))
FIRST_RUNG_BUDGET_S = float(os.environ.get("BENCH_PROFILE_BUDGET_S", 420))


def measure_profile(overrides: dict) -> float:
    """Child mode: compile + time one profile, return vec/s."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode as encode_n
    from qinco_tpu.models.spec import QincoSpec

    spec = QincoSpec(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
                     **overrides)
    params = init_params(jax.random.PRNGKey(0), spec)
    batch, n_iter = 4096, 8

    # One dispatch runs all batches (scan) and reduces to a scalar that
    # we materialize on the host: on the remote-TPU transport,
    # block_until_ready alone does NOT guarantee completion — only host
    # readback does.
    @jax.jit
    def encode_many(params, xs):
        def body(_, x):
            codes, _, _ = encode_n(params, spec, x)
            return None, codes.sum()

        _, sums = jax.lax.scan(body, None, xs)
        return sums.sum()

    xs = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(n_iter, batch, spec.D)).astype(np.float32))
    float(encode_many(params, xs))  # compile + warm-up
    t0 = time.perf_counter()
    float(encode_many(params, xs))  # host readback forces completion
    dt = time.perf_counter() - t0
    return batch * n_iter / dt


def run_child(name: str, budget_s: float):
    """Run one profile in a subprocess.  Returns (vec_per_s | None, outage)."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--profile", name],
            capture_output=True, text=True, timeout=budget_s,
        )
    except subprocess.TimeoutExpired:
        print(f"profile {name}: timeout after {budget_s:.0f}s",
              file=sys.stderr, flush=True)
        return None, True  # a dial hang counts as an outage signal
    for line in reversed(r.stdout.strip().splitlines() or [""]):
        try:
            d = json.loads(line)
            if "vec_per_s" in d:
                return float(d["vec_per_s"]), False
        except (json.JSONDecodeError, TypeError, ValueError):
            continue
    err_tail = (r.stderr or "")[-2000:]
    outage = any(m in err_tail for m in OUTAGE_MARKERS)
    last = err_tail.strip().splitlines()[-1] if err_tail.strip() else "?"
    print(f"profile {name}: rc={r.returncode} outage={outage} | {last}",
          file=sys.stderr, flush=True)
    return None, outage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", type=str, default=None)
    args = ap.parse_args()

    if args.profile is not None:
        overrides = dict(PROFILES)[args.profile]
        vps = measure_profile(overrides)
        print(json.dumps({"vec_per_s": round(vps, 1)}), flush=True)
        return

    # Consult the kernel smoke artifact (scripts/kernel_smoke.py) if one
    # exists: variants that failed their hardware probe go to the back
    # of the ladder rather than burning the budget up front.
    ladder = list(PROFILES)
    smoke_path = os.environ.get(
        "BENCH_SMOKE_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "KERNEL_SMOKE.json"))
    try:
        smoke = json.loads(open(smoke_path).read())["results"]
        ladder.sort(key=lambda p: smoke.get(p[0], "ok").startswith("error"))
    except (OSError, ValueError, KeyError):
        pass

    t_start = time.perf_counter()
    best = None  # (vec_per_s, name)
    outage_strikes = 0
    for i, (name, _) in enumerate(ladder):
        elapsed = time.perf_counter() - t_start
        remaining = TOTAL_BUDGET_S - elapsed
        if best is not None and remaining < 120:
            break  # we have a number; don't risk the emit window
        if remaining < 60:
            break
        budget = min(FIRST_RUNG_BUDGET_S if i == 0 else 300.0, remaining)
        vps, outage = run_child(name, budget)
        if vps is not None:
            best = (vps, name)
            # the ladder is ordered fastest-measured-first, so the first
            # rung that completes is the best available — stop there.
            break
        elif outage:
            outage_strikes += 1
            if best is not None or outage_strikes >= 2:
                break  # bounded retry: don't re-dial a dead pool
            time.sleep(20)

    if best is None:
        print("bench: no profile completed within budget", file=sys.stderr)
        sys.exit(3)

    vec_per_s, name = best
    baseline = 2860.0  # vec/s, reference PQ-QINCo encode on 1 GPU
    print(json.dumps({
        "metric": "qinco2-S_encode_throughput_1chip",
        "value": round(vec_per_s, 1),
        "unit": "vectors/s",
        "vs_baseline": round(vec_per_s / baseline, 2),
        "profile": name,
    }), flush=True)


if __name__ == "__main__":
    main()
