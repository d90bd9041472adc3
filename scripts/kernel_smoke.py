#!/usr/bin/env python
"""Per-variant TPU kernel smoke probe (VERDICT r2 weak #7).

Compiles and runs every encode profile / Pallas kernel variant once at
production shapes, each in its OWN subprocess with a wall-clock budget,
and writes KERNEL_SMOKE.json: {variant: "ok:<vec/s>" | "error:..."}.

Purpose: decouple "does this kernel work on real hardware" from the
round's bench deliverable — CPU interpret-mode tests cannot catch
Mosaic compile failures or VMEM blowups, and one flaky kernel must not
poison the bench record.  Run at TPU-session start and before bench;
bench.py consults the artifact to deprioritize variants marked error.

Usage:
  python scripts/kernel_smoke.py [--out KERNEL_SMOKE.json]
  python scripts/kernel_smoke.py --one NAME   # child mode
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402  (repo-root bench.py: profile ladder + protocol)

# bench's ladder plus the experimental kernel variants not on the ladder.
VARIANTS = {p["name"]: p["overrides"] for p in bench.PROFILES}
VARIANTS.update({
    "selected_approxbeam": dict(fast=True, pallas=True,
                                compute_dtype="bfloat16", approx_beam=True),
    "perbin_approxbeam": dict(fast=True, pallas=True, fused_substep=True,
                              perbin=True, compute_dtype="bfloat16",
                              approx_beam=True),
    # Preset shapes beyond QINCo2-S (the measure_profile default):
    # qinco2-M (L=4, de=dh=384) and qinco2-L (L=16) exercise in/out
    # projections and much deeper unrolled FFN chains in the kernels —
    # Mosaic compile time and VMEM budgets that only a hardware probe
    # can validate (reference presets: config/model_args/qinco2-*.yaml).
    "perbin_qinco2M": dict(fast=True, pallas=True, fused_substep=True,
                           perbin=True, compute_dtype="bfloat16",
                           L=4, de=384, dh=384),
    "perbin_qinco2L": dict(fast=True, pallas=True, fused_substep=True,
                           perbin=True, compute_dtype="bfloat16",
                           L=16, de=384, dh=384),
    "selected_qinco2M": dict(fast=True, pallas=True, fused_topa=False,
                             compute_dtype="bfloat16", L=4, de=384, dh=384),
    "selected_qinco2L": dict(fast=True, pallas=True, fused_topa=False,
                             compute_dtype="bfloat16", L=16, de=384, dh=384),
    # Round-5 in-kernel exact top-A at the M/L preset shapes
    "ktopa_qinco2M": dict(fast=True, pallas=True, fused_topa=True,
                          compute_dtype="bfloat16", L=4, de=384, dh=384),
    "ktopa_qinco2L": dict(fast=True, pallas=True, fused_topa=True,
                          compute_dtype="bfloat16", L=16, de=384, dh=384),
    # (the fused select+rebuild variants perbin_fsel / selected_fsel are
    # bench-ladder rungs and arrive via bench.PROFILES above)
})

# 240s proved too tight on 2026-08-19: perbin timed out at 240s yet ran
# at full speed (85.8k vec/s) given 560s — cold dial + Mosaic compile of
# the A-way-unrolled kernel can exceed 4 min on a slow pool day.  The
# F_out-unrolled select_rebuild kernel's first-ever cold compile ran
# past 420s on 2026-08-20 (subsequent compiles, even at new tile sizes,
# take seconds once the process-local Mosaic pipeline is warm; the
# persistent JAX cache covers exact repeats only), so: 600s.
PER_VARIANT_BUDGET_S = 600.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).parent.parent
                                         / "KERNEL_SMOKE.json"))
    ap.add_argument("--one", default=None)
    args = ap.parse_args()

    if args.one is not None:
        batches = {p["name"]: p.get("batch", 4096) for p in bench.PROFILES}
        totals = {p["name"]: p.get("n_total", 32768) for p in bench.PROFILES}
        vps, compile_s = bench.measure_profile(
            VARIANTS[args.one],
            batch=batches.get(args.one, 1024),
            n_total=totals.get(args.one, 32768))
        print(json.dumps({"vec_per_s": round(vps, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return

    results: dict[str, str] = {}
    for name in VARIANTS:
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--one", name],
                capture_output=True, text=True,
                timeout=PER_VARIANT_BUDGET_S,
            )
            out = None
            for line in reversed(r.stdout.strip().splitlines() or [""]):
                try:
                    out = json.loads(line)["vec_per_s"]
                    break
                except (json.JSONDecodeError, KeyError, ValueError):
                    continue
            if out is not None:
                results[name] = f"ok:{out}"
            else:
                tail = (r.stderr or "").strip().splitlines()
                results[name] = "error:" + (tail[-1][:160] if tail else "?")
        except subprocess.TimeoutExpired:
            results[name] = f"error:timeout>{PER_VARIANT_BUDGET_S:.0f}s"
        print(json.dumps({name: results[name],
                          "t_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        Path(args.out).write_text(json.dumps(
            {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
             "results": results}, indent=1))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
