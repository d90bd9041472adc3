#!/usr/bin/env python
"""Does bin-diversification recover the fused profile's MSE gap?

The fused-substep kernel replaces exact top-A pre-selection with
best-per-bin over A contiguous index bins (pallas_kernels.py:
_fused_substep_kernel) — +0.13% MSE at production shapes because
near-duplicate codewords sharing a bin can only contribute one
candidate.  MSE is invariant to codeword RELABELING, so permuting each
step's (sub_)codebook rows changes only which codewords share a bin.

This experiment permutes params so that each bin holds one member from
each of G balanced similarity clusters (similar words land in DIFFERENT
bins), and measures encode MSE exact vs fused vs fused+diverse, on
(a) random-init params and (b) briefly trained params.

Run on CPU: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python
scripts/binperm_experiment.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def balanced_clusters(C: np.ndarray, n_clusters: int, iters: int = 25,
                      seed: int = 0) -> np.ndarray:
    """Balanced k-means: (K, D) rows -> cluster labels with exactly
    K/n_clusters members each (greedy nearest-fill assignment)."""
    K = C.shape[0]
    cap = K // n_clusters
    rng = np.random.default_rng(seed)
    cent = C[rng.choice(K, n_clusters, replace=False)].copy()
    labels = np.zeros(K, np.int64)
    for _ in range(iters):
        d = ((C[:, None, :] - cent[None]) ** 2).sum(-1)  # (K, nc)
        # greedy balanced assignment: visit rows by their best-distance
        # margin, fill clusters to capacity
        order = np.argsort(d.min(1))
        counts = np.zeros(n_clusters, np.int64)
        for i in order:
            for c in np.argsort(d[i]):
                if counts[c] < cap:
                    labels[i] = c
                    counts[c] += 1
                    break
        for c in range(n_clusters):
            cent[c] = C[labels == c].mean(0)
    return labels


def diverse_perm(C: np.ndarray, A: int, seed: int = 0) -> np.ndarray:
    """Permutation perm (K,) s.t. bins perm[i*G:(i+1)*G] each contain one
    member per balanced similarity cluster."""
    K = C.shape[0]
    G = K // A
    labels = balanced_clusters(C, n_clusters=G, seed=seed)  # G clusters of A
    bins = [[] for _ in range(A)]
    for c in range(G):
        members = np.flatnonzero(labels == c)  # A members
        for slot, m in enumerate(members):
            bins[slot].append(m)
    perm = np.concatenate([np.asarray(b) for b in bins])
    assert sorted(perm.tolist()) == list(range(K))
    return perm.astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode
    from qinco_tpu.models.spec import QincoSpec

    base = QincoSpec(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
                     fast=True, pallas=True, fused_substep=True,
                     compute_dtype="bfloat16")
    exact = base.with_(fast=False, pallas=False, fused_substep=False,
                       compute_dtype="float32")

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2048, base.D)).astype(np.float32))

    def permute_params(params, perms):
        """Relabel each step's codeword indices by perms[m] (M, K)."""
        steps = params.steps
        n_steps = steps.codebook.shape[0]  # M-1: step 0 is codebook0
        new_cb = jnp.stack(
            [steps.codebook[m][perms[m]] for m in range(n_steps)])
        new_sub = jnp.stack(
            [steps.sub_codebook[m][perms[m]] for m in range(n_steps)])
        return params._replace(
            steps=steps._replace(codebook=new_cb, sub_codebook=new_sub))

    def mse(spec, params):
        _, xhat, _ = encode(params, spec, x)
        return float(jnp.mean(jnp.sum((x - xhat) ** 2, -1)))

    def report(tag, params):
        m_ex = mse(exact, params)
        m_fu = mse(base, params)
        n_steps = params.steps.sub_codebook.shape[0]
        perms = np.stack([
            diverse_perm(np.asarray(params.steps.sub_codebook[m]), base.A,
                         seed=m)
            for m in range(n_steps)
        ])
        p2 = permute_params(params, perms)
        m_ex2 = mse(exact, p2)  # sanity: relabeling-invariant
        m_dv = mse(base, p2)
        # control: random permutation
        rperms = np.stack([
            np.random.default_rng(100 + m).permutation(base.K).astype(np.int32)
            for m in range(n_steps)
        ])
        m_rp = mse(base, permute_params(params, rperms))
        print(f"[{tag}] exact {m_ex:.2f} (perm-invariance check {m_ex2:.2f})")
        print(f"[{tag}] fused          {m_fu:.2f}  (+{100*(m_fu/m_ex-1):.3f}%)")
        print(f"[{tag}] fused+diverse  {m_dv:.2f}  (+{100*(m_dv/m_ex-1):.3f}%)")
        print(f"[{tag}] fused+randperm {m_rp:.2f}  (+{100*(m_rp/m_ex-1):.3f}%)",
              flush=True)

    params = init_params(jax.random.PRNGKey(0), base)
    report("random-init", params)

    # (b) briefly trained params on clustered synthetic data: structure in
    # the codebooks is what diversification exploits.
    import optax

    from qinco_tpu.models.params import init_model_state
    from qinco_tpu.train.train_step import make_train_step

    centers = rng.normal(size=(64, base.D)).astype(np.float32) * 2.0
    data = (centers[rng.integers(0, 64, size=(50_000,))]
            + rng.normal(size=(50_000, base.D)).astype(np.float32))
    data = jnp.asarray(data)
    xq = (centers[rng.integers(0, 64, size=(2048,))]
          + rng.normal(size=(2048, base.D)).astype(np.float32))
    x = jnp.asarray(xq)

    tspec = exact
    tx = optax.adamw(8e-4, weight_decay=0.1)
    params = init_params(jax.random.PRNGKey(0), tspec)
    opt_state = tx.init(params)
    mstate = init_model_state(tspec)
    tstep = jax.jit(make_train_step(tspec, tx, 0.1))
    w = jnp.ones((512,), jnp.float32)
    t0 = time.time()
    for step in range(300):
        i = (step * 512) % (50_000 - 512)
        params, opt_state, mstate, out = tstep(
            params, opt_state, mstate, data[i:i + 512], w)
    print(f"trained 300 steps in {time.time()-t0:.0f}s "
          f"(loss {float(out.total_loss):.2f})")
    report("trained", params)


if __name__ == "__main__":
    main()
