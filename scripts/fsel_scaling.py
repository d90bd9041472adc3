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


def measure(spec, n_total=8192, batch=1024):
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode as encode_n

    params = init_params(jax.random.PRNGKey(0), spec)
    n_iter = max(1, n_total // batch)

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
    t0 = time.perf_counter()
    float(encode_many(params, xs))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(encode_many(params, xs))
    dt = time.perf_counter() - t0
    return batch * n_iter / dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).parent.parent / "bench_artifacts"
        / "fsel_scaling.json"))
    args = ap.parse_args()

    from qinco_tpu.models.spec import QincoSpec

    report = {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "rows": []}
    base = dict(D=128, K=256, M=8, L=2, de=128, dh=256, A=16,
                fast=True, pallas=True, fused_substep=True, perbin=True,
                compute_dtype="bfloat16")

    for B in (16, 32, 64, 128):
        row = {"B": B}
        for fsel in (False, True):
            spec = QincoSpec(**base, B=B, fused_select=fsel)
            try:
                vps, cs = measure(spec)
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
    k512 = QincoSpec(D=128, K=512, M=8, L=2, de=128, dh=256, A=16, B=32,
                     fast=True, pallas=True, compute_dtype="bfloat16",
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
