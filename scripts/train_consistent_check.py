#!/usr/bin/env python
"""Does training WITH binned pre-selection close its MSE gap?

trained_mse_check.py showed the fused binned pre-selection costs ~+0.44%
MSE when evaluated on a model trained with EXACT selection.  But the
substep loss trains sub_codebook against the codes the encode actually
produced — a model trained under binned selection may adapt its
codebooks to the bin structure.  This trains two models from the same
init on the same data/steps, one with exact top-A, one with binned
(best-per-bin) selection, and cross-evaluates.

Binned selection is emulated in plain XLA (reshape (NF, A, G) argmin ->
top ids into the standard path) — selection-equivalent to the fused
kernel's packed binned argmin (lowest-id tie-break), without
interpret-mode Pallas overhead on CPU.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/train_consistent_check.py [--steps 400]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

BINNED = {"on": False}


def install_binned_patch():
    """Monkeypatch _beam_step: replace exact top-A with best-per-bin."""
    import jax.numpy as jnp

    import qinco_tpu.models.qinco as qmod
    from qinco_tpu.ops.distances import pairwise_sqdist_partial

    orig = qmod._beam_step

    def patched(spec, p, x, xhat, F_out, n_codes, w=None, want_stats=True):
        if not BINNED["on"] or not spec.has_substep():
            return orig(spec, p, x, xhat, F_out, n_codes,
                        w=w, want_stats=want_stats)
        N, F_in, D = xhat.shape
        NF = N * F_in
        xh = xhat.reshape(NF, D)
        x_f = jnp.broadcast_to(x[:, None, :], (N, F_in, D)).reshape(NF, D)
        K, A = spec.K, n_codes
        G = K // A
        d = pairwise_sqdist_partial(x_f - xh, p.sub_codebook)  # (NF, K)
        j = jnp.argmin(d.reshape(NF, A, G), axis=-1)  # (NF, A)
        top_idx = (jnp.arange(A, dtype=jnp.int32)[None, :] * G
                   + j.astype(jnp.int32))
        return _score_with_idx(
            qmod, spec, p, x, xhat, F_out, n_codes, top_idx, w, want_stats)

    qmod._beam_step = patched
    return orig


def _score_with_idx(qmod, spec, p, x, xhat, F_out, n_codes, top_idx, w,
                    want_stats):
    """Plain-XLA scoring of externally chosen candidates (mirrors the
    non-pallas branch of _beam_step)."""
    import jax.numpy as jnp

    N, F_in, D = xhat.shape
    NF = N * F_in
    xh = xhat.reshape(NF, D)
    cand = p.codebook[top_idx]  # (NF, A, D)
    pred = qmod.step_predict(spec, p, cand, xh)
    cand_abs = pred + xh[:, None, :]
    A_eff = n_codes
    flat = cand_abs.reshape(N, F_in * A_eff, D)
    from qinco_tpu.ops.distances import batch_sqdist_partial

    dists = batch_sqdist_partial(x[:, None, :], flat)[:, 0]
    sel, _ = qmod._beam_topk(spec, dists, F_out)
    f_in_idx = sel // A_eff
    real = jnp.take_along_axis(top_idx.reshape(N, F_in * A_eff), sel, axis=1)
    xhat_next = jnp.take_along_axis(flat, sel[..., None], axis=1)
    t_mean, t_std = qmod._maybe_target_stats(spec, x, xhat, w, want_stats)
    return (xhat_next, real.astype(jnp.int32), f_in_idx.astype(jnp.int32),
            (t_mean, t_std))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from qinco_tpu.models import init_params
    from qinco_tpu.models.params import init_model_state
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.train.train_step import make_train_step

    install_binned_patch()
    import qinco_tpu.models.qinco as qmod

    spec = QincoSpec(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32)

    rng = np.random.default_rng(1)
    centers = rng.normal(size=(64, spec.D)).astype(np.float32) * 2.0
    data = (centers[rng.integers(0, 64, size=(60_000,))]
            + rng.normal(size=(60_000, spec.D)).astype(np.float32))
    data = jnp.asarray(data)
    xq = jnp.asarray(
        centers[rng.integers(0, 64, size=(2048,))]
        + rng.normal(size=(2048, spec.D)).astype(np.float32))

    def train(binned):
        BINNED["on"] = binned
        tx = optax.adamw(8e-4, weight_decay=0.1)
        params = init_params(jax.random.PRNGKey(0), spec)
        opt_state = tx.init(params)
        mstate = init_model_state(spec)
        tstep = make_train_step(spec, tx, 0.1)
        w = jnp.ones((512,), jnp.float32)
        t0 = time.time()
        # jit AFTER setting the flag, AND clear the module-level jitted
        # encode's trace cache: train_step calls qinco.encode (itself
        # @jax.jit), whose cached jaxpr — keyed only by (spec, shapes),
        # identical across modes — was traced under the previous flag.
        # Without this, the second model silently trains with the first
        # mode's selection (caught 2026-08-20: both models came out
        # bit-identical).
        qmod.encode.clear_cache()
        step_fn = jax.jit(tstep)
        for step in range(args.steps):
            i = (step * 512) % (60_000 - 512)
            params, opt_state, mstate, out = step_fn(
                params, opt_state, mstate, data[i:i + 512], w)
        print(f"  trained {args.steps} steps in {time.time()-t0:.0f}s "
              f"(loss {float(out.total_loss):.2f})", flush=True)
        return params

    def mse(binned, params):
        BINNED["on"] = binned
        _, xhat, _ = qmod.encode.__wrapped__(params, spec, xq)
        return float(jnp.mean(jnp.sum((xq - xhat) ** 2, -1)))

    print("training exact-selection model...", flush=True)
    p_exact = train(binned=False)
    print("training binned-selection model...", flush=True)
    p_binned = train(binned=True)

    ee = mse(False, p_exact)
    eb = mse(True, p_exact)
    bb = mse(True, p_binned)
    be = mse(False, p_binned)
    print(f"exact-trained  / exact-encode : {ee:.3f}  (baseline)")
    print(f"exact-trained  / binned-encode: {eb:.3f}  (+{100*(eb/ee-1):.3f}%)")
    print(f"binned-trained / binned-encode: {bb:.3f}  (+{100*(bb/ee-1):.3f}%)")
    print(f"binned-trained / exact-encode : {be:.3f}  (+{100*(be/ee-1):.3f}%)")


if __name__ == "__main__":
    main()
