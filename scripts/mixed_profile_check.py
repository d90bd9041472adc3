#!/usr/bin/env python
"""Decompose the fused (binned) profile's trained-model MSE cost by step.

The binned pre-selection loses runner-up candidates to bin collisions
(+0.44% MSE on the 10M-run checkpoint, scripts/trained_mse_check.py).
The first MLP step both expands the beam 1->B (n_codes=32, bins of 8)
and sets the beam diversity for everything after — if it dominates the
loss, a mixed profile (exact selection first step, binned rest) gets
near-exact MSE at near-fused speed.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/mixed_profile_check.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import qinco_tpu.models.qinco as qmod
    from qinco_tpu.checkpoint import load_checkpoint, load_checkpoint_meta
    from qinco_tpu.models import init_params
    from qinco_tpu.models.spec import QincoSpec

    d = "/root/scale10m"
    meta = load_checkpoint_meta(f"{d}/model.npz")
    hp = meta["parameters"]
    exact = QincoSpec(
        D=meta["data_dim"], K=hp["K"], M=hp["M"], L=hp["L"],
        de=hp.get("de"), dh=hp["dh"], A=hp.get("A") or 0, B=hp.get("B") or 1,
        ivf_K=hp.get("ivf_K") or 0,
    )
    fused = exact.with_(fast=True, pallas=True, fused_substep=True,
                        compute_dtype="bfloat16")
    template = init_params(jax.random.PRNGKey(0), exact)
    params = load_checkpoint(f"{d}/model.npz", params_template=template)["params"]
    x = np.load(f"{d}/queries.npy", mmap_mode="r")[:2048]
    x = jnp.asarray(np.ascontiguousarray(x, dtype=np.float32))

    orig_beam_step = qmod._beam_step
    mode = {"first": None}  # 'exact_first' | 'fused_first'

    def patched(spec, p, xq, xhat, F_out, n_codes, w=None, want_stats=True):
        first = xhat.shape[1] == 1  # IVF entry: only step 1 has F_in == 1
        if mode["first"] == "exact_first" and first:
            spec = spec.with_(fused_substep=False)
        if mode["first"] == "fused_first" and not first:
            spec = spec.with_(fused_substep=False)
        return orig_beam_step(spec, p, xq, xhat, F_out, n_codes,
                              w=w, want_stats=want_stats)

    def mse(spec):
        _, xhat, _ = qmod.encode.__wrapped__(params, spec, x)
        return float(jnp.mean(jnp.sum((x - xhat) ** 2, -1)))

    m_exact = mse(exact)
    m_fused = mse(fused)
    print(f"exact        {m_exact:.4f}")
    print(f"fused(all)   {m_fused:.4f}  (+{100*(m_fused/m_exact-1):.3f}%)",
          flush=True)
    qmod._beam_step = patched
    try:
        for tag in ("exact_first", "fused_first"):
            mode["first"] = tag
            m = mse(fused)
            print(f"{tag:12s} {m:.4f}  (+{100*(m/m_exact-1):.3f}%)", flush=True)
    finally:
        qmod._beam_step = orig_beam_step


if __name__ == "__main__":
    main()
