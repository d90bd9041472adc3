#!/usr/bin/env python
"""select_rebuild scaling bounds (VERDICT r4 #8).

The fused select+rebuild kernel's top-F_out extraction is linear in
F_out (F_out unrolled min/mask passes over the (Vt, F·A) tile,
ops/pallas_kernels.py:_select_rebuild_kernel) and its one-hot parent
gather is quadratic in the vector tile — so larger beam widths B must
eventually stop paying vs the XLA top_k + recompute tail, and K > 256
cannot use it at all (packed 8-bit ids).  This script measures the
fsel-vs-nofsel encode throughput across B (and checks the K=512
fallback path runs) so the fallback threshold in models/qinco.py is a
measured number, not implicit knowledge.

Run WITH the axon TPU env:
  python scripts/fsel_scaling.py [--out bench_artifacts/fsel_scaling.json]

Each measurement runs in this process (one backend dial); shapes are
QINCo2-S-like with B swept.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def measure(overrides, n_total=8192, batch=1024):
    """One timing protocol only: bench.measure_profile (the shared
    scan-amortized, host-readback child measurement)."""
    import bench

    return bench.measure_profile(overrides, batch=batch, n_total=n_total)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).parent.parent / "bench_artifacts"
        / "fsel_scaling.json"))
    args = ap.parse_args()

    report = {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "rows": []}
    base = dict(fast=True, pallas=True, fused_substep=True, perbin=True,
                compute_dtype="bfloat16")

    for B in (16, 32, 64, 128):
        row = {"B": B}
        for fsel in (False, True):
            try:
                vps, cs = measure(dict(base, B=B, fused_select=fsel))
                row["fsel" if fsel else "nofsel"] = round(vps, 1)
                row[("fsel" if fsel else "nofsel") + "_compile_s"] = round(
                    cs, 1)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                row["fsel" if fsel else "nofsel"] = f"error:{type(e).__name__}"
        if isinstance(row.get("fsel"), float) and isinstance(
                row.get("nofsel"), float):
            row["fsel_speedup"] = round(row["fsel"] / row["nofsel"], 3)
        report["rows"].append(row)
        print(json.dumps(row), flush=True)

    # K=512: packed 8-bit ids impossible -> the selected/fused_select
    # routes must fall back (candidate_scores_pallas + XLA top_k) and
    # still run.  K=512 also breaks the fused_substep K<=256 rule, so
    # use the plain pallas route.
    k512 = dict(K=512, fast=True, pallas=True, compute_dtype="bfloat16",
                fused_select=True)
    try:
        vps, cs = measure(k512, n_total=4096)
        report["K512_fallback"] = {"vec_per_s": round(vps, 1),
                                   "compile_s": round(cs, 1)}
    except Exception as e:  # noqa: BLE001
        report["K512_fallback"] = f"error:{type(e).__name__}: {e}"
    print(json.dumps({"K512_fallback": report["K512_fallback"]}), flush=True)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
