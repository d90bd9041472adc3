#!/usr/bin/env python
"""Find synthetic-data parameters with a non-degenerate coarse-recall
curve (R@nprobe climbing gradually), cheaply, before committing a
50-minute 10M pipeline run to them.

For each (center_scale, cluster_noise, query_noise) candidate:
1M-row DB, ivf_K=2^13 (same ~122 rows/list as 10M @ 2^16), 15-iter
k-means, then: what fraction of queries have their exact-NN's list
inside their top-nprobe probed lists, for nprobe in {1..64}?

Usage: python scripts/frontier_tune.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def curve(center_scale, cluster_noise, query_noise, d=128, n=1_000_000,
          nq=1024, ivf_k=8192, seed=0):
    import jax.numpy as jnp

    from qinco_tpu.ops.kmeans import kmeans
    from qinco_tpu.ops.distances import chunked_argmin
    from qinco_tpu.search.index import coarse_probe

    rng = np.random.default_rng(seed)
    centers = (rng.normal(size=(8192, d)) * center_scale).astype(np.float32)
    db = (centers[rng.integers(0, 8192, size=n)]
          + cluster_noise * rng.normal(size=(n, d))).astype(np.float32)
    q_src = rng.integers(0, n, size=nq)
    xq = db[q_src] + query_noise * rng.normal(size=(nq, d)).astype(np.float32)

    # exact GT on device (chunked)
    best_d = np.full((nq,), np.inf, np.float32)
    best_i = np.zeros((nq,), np.int64)
    xqj = jnp.asarray(xq)
    for i in range(0, n, 250_000):
        chunk = jnp.asarray(db[i:i + 250_000])
        d2 = jnp.sum((xqj[:, None, :] - chunk[None]) ** 2, -1) \
            if False else None
        # matmul form, f32 accumulate
        d2 = (jnp.sum(xqj**2, 1)[:, None] + jnp.sum(chunk**2, 1)[None]
              - 2.0 * xqj @ chunk.T)
        li = np.asarray(jnp.argmin(d2, 1))
        ld = np.asarray(jnp.min(d2, 1))
        take = ld < best_d
        best_i[take] = li[take] + i
        best_d[take] = ld[take]

    cents = kmeans(db[:200_000], ivf_k, iters=15, seed=1)
    gt_list, _ = chunked_argmin(jnp.asarray(db[best_i]), jnp.asarray(cents))
    gt_list = np.asarray(gt_list)
    probes, _ = coarse_probe(xq, cents, 64)

    out = {}
    for nprobe in (1, 2, 4, 8, 16, 32, 64):
        hit = np.mean([gt_list[j] in set(probes[j, :nprobe])
                       for j in range(nq)])
        out[nprobe] = round(float(hit), 3)
    return out


def main():
    for cs, cn, qn in [
        (1.0, 0.5, 0.35),   # the current 10m_hard setting (reference point)
        (1.0, 1.0, 0.7),
        (1.0, 1.5, 1.0),
        (0.5, 1.0, 0.7),
        (1.0, 2.0, 1.4),
    ]:
        t0 = time.time()
        c = curve(cs, cn, qn)
        print(f"center={cs} noise={cn} qnoise={qn}: {c} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
