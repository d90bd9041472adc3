#!/usr/bin/env python
"""Encode-profile MSE deltas on a REAL trained checkpoint.

scripts/binperm_experiment.py showed the fused binned pre-selection
(spec.fused_substep) costs ~+3.9% MSE on briefly-trained toy params vs
+0.09% at random init: trained codebooks concentrate the true top-A in
few index bins, and best-per-bin drops the runner-ups.  This script
measures the same deltas on the 10M scale-run checkpoint
(scripts/scale_regression.py output) — the most realistic trained model
available offline — to decide which profile the bench/docs may headline.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/trained_mse_check.py [--dir /root/scale10m]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, default="/root/scale10m")
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qinco_tpu.checkpoint import load_checkpoint, load_checkpoint_meta
    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode
    from qinco_tpu.models.spec import QincoSpec

    meta = load_checkpoint_meta(f"{args.dir}/model.npz")
    hp = meta["parameters"]
    print("checkpoint hyperparams:", hp, flush=True)
    exact = QincoSpec(
        D=meta["data_dim"], K=hp["K"], M=hp["M"], L=hp["L"],
        de=hp.get("de"), dh=hp["dh"], A=hp.get("A") or 0, B=hp.get("B") or 1,
        ivf_K=hp.get("ivf_K") or 0,
    )
    template = init_params(jax.random.PRNGKey(0), exact)
    params = load_checkpoint(
        f"{args.dir}/model.npz", params_template=template)["params"]

    x = np.load(f"{args.dir}/queries.npy", mmap_mode="r")[: args.n]
    x = jnp.asarray(np.ascontiguousarray(x, dtype=np.float32))

    def mse(spec):
        _, xhat, _ = encode(params, spec, x)
        return float(jnp.mean(jnp.sum((x - xhat) ** 2, -1)))

    m_exact = mse(exact)
    print(f"exact                  {m_exact:.4f}", flush=True)
    for tag, sp in [
        # xla_fast: approx_max_k pre-selection is only real on TPU (the
        # CPU lowering is exact top-k) — run this one on the chip to get
        # a meaningful delta for bench.py's ladder metadata
        ("xla_fast (approxA)", exact.with_(
            fast=True, compute_dtype="bfloat16")),
        # old external-selection route (fast=True => approx_max_k on TPU)
        ("fast+pallas (extA)", exact.with_(
            fast=True, pallas=True, fused_topa=False,
            compute_dtype="bfloat16")),
        # round-5 in-kernel EXACT top-A (spec.fused_topa)
        ("ktopa (exact topA) ", exact.with_(
            fast=True, pallas=True, compute_dtype="bfloat16")),
        ("ktopa_fsel         ", exact.with_(
            fast=True, pallas=True, compute_dtype="bfloat16",
            fused_select=True)),
        ("fused_substep      ", exact.with_(
            fast=True, pallas=True, fused_substep=True,
            compute_dtype="bfloat16")),
        ("fused+perbin       ", exact.with_(
            fast=True, pallas=True, fused_substep=True, perbin=True,
            compute_dtype="bfloat16")),
        # fused select+rebuild on top: beam selection is exact, so each
        # should match its underlying scoring route's delta
        ("selected_fsel (ext)", exact.with_(
            fast=True, pallas=True, compute_dtype="bfloat16",
            fused_topa=False, fused_select=True)),
        ("perbin_fsel        ", exact.with_(
            fast=True, pallas=True, fused_substep=True, perbin=True,
            compute_dtype="bfloat16", fused_select=True)),
    ]:
        try:
            m = mse(sp)
            print(f"{tag} {m:.4f}  (+{100 * (m / m_exact - 1):.3f}%)",
                  flush=True)
        except Exception as e:
            print(f"{tag} failed: {type(e).__name__}: {e}", flush=True)

    # Bin-diversification: relabel each step's codewords so that similar
    # words (same balanced-cluster) land in different bins — MSE-invariant
    # on the exact path, changes only bin composition on the fused path.
    from scripts.binperm_experiment import diverse_perm

    steps = params.steps
    n_steps = steps.sub_codebook.shape[0]
    perms = np.stack([
        diverse_perm(np.asarray(steps.sub_codebook[m]), exact.A, seed=m)
        for m in range(n_steps)
    ])
    p2 = params._replace(steps=steps._replace(
        codebook=jnp.stack([steps.codebook[m][perms[m]]
                            for m in range(n_steps)]),
        sub_codebook=jnp.stack([steps.sub_codebook[m][perms[m]]
                                for m in range(n_steps)]),
    ))
    params = p2
    m_inv = mse(exact)
    m_dv = mse(exact.with_(fast=True, pallas=True, fused_substep=True,
                           compute_dtype="bfloat16"))
    print(f"exact after perm    {m_inv:.4f} (invariance check)", flush=True)
    print(f"fused+diverse       {m_dv:.4f}  (+{100 * (m_dv / m_exact - 1):.3f}%)",
          flush=True)


if __name__ == "__main__":
    main()
