"""Lloyd k-means on TPU, in pure JAX.

Replaces both faiss.Kmeans (reference: qinco/search/search_tasks.py:67-77)
and the torch Lloyd loop used for RQ initialization (reference:
qinco/vrq.py:22-88).  TPU-first: assignment is a chunked matmul argmin
(MXU), the centroid update is an unsorted-segment-sum — both static-shape
and jittable; the iteration count is a host loop so huge trainsets can
stream through device memory.

Reference semantics kept:
- init: uniform random in [0,1) scaled by per-dim std + mean
  (vrq.py:30-35);
- empty clusters refilled with a random vector (vrq.py:71-73);
- 10 Lloyd iterations by default for RQ init (vrq.py:246), 100 for IVF
  centroids (search_tasks.py:75).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .distances import chunked_argmin


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_codes(x: jnp.ndarray, centroids: jnp.ndarray, chunk: int = 65536):
    """Nearest-centroid assignment (N,) int32."""
    codes, _ = chunked_argmin(x, centroids, chunk=chunk)
    return codes


@functools.partial(jax.jit, static_argnames=("K",))
def _update_centroids(x, codes, K, key, fill_mean, fill_std):
    """One Lloyd M-step with empty-cluster refill."""
    D = x.shape[1]
    sums = jax.ops.segment_sum(x, codes, num_segments=K)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), codes, K)
    empty = counts < 0.5
    refill = (
        jax.random.uniform(key, (K, D), jnp.float32) * fill_std + fill_mean
    )
    sums = sums + refill * empty[:, None]
    counts = jnp.maximum(counts, 1.0)
    return sums / counts[:, None], counts


def kmeans(
    x: np.ndarray,
    K: int,
    *,
    iters: int = 10,
    seed: int = 0,
    batch: int = 1_000_000,
    chunk: int = 65536,
    init_centroids: np.ndarray | None = None,
    verbose: bool = False,
) -> np.ndarray:
    """Train K centroids on ``x (N, D)``; returns (K, D) float32.

    Streams ``x`` through the device in ``batch``-row slices, so N can
    exceed device memory; per-batch partial sums accumulate on host.
    """
    x = np.asarray(x, np.float32)
    N, D = x.shape
    key = jax.random.PRNGKey(seed)

    stats = x[: min(N, 200_000)]
    mean = jnp.asarray(stats.mean(0))
    std = jnp.asarray(stats.std(0))

    if init_centroids is not None:
        centroids = jnp.asarray(init_centroids, jnp.float32)
    else:
        key, k0 = jax.random.split(key)
        centroids = jax.random.uniform(k0, (K, D), jnp.float32) * std + mean

    # keep the data resident on device across iterations
    x_dev = jnp.asarray(x) if N <= batch else None

    for it in range(iters):
        key, kf = jax.random.split(key)
        if N <= batch:
            codes = assign_codes(x_dev, centroids, chunk=chunk)
            centroids, counts = _update_centroids(
                x_dev, codes, K, kf, mean, std
            )
        else:
            sums = np.zeros((K, D), np.float64)
            counts_np = np.zeros((K,), np.int64)
            for i in range(0, N, batch):
                xb = jnp.asarray(x[i : i + batch])
                codes = np.asarray(assign_codes(xb, centroids, chunk=chunk))
                np.add.at(counts_np, codes, 1)
                np.add.at(sums, codes, x[i : i + batch].astype(np.float64))
            empty = counts_np < 1
            refill = np.asarray(
                jax.random.uniform(kf, (K, D), jnp.float32) * std + mean
            )
            sums[empty] = refill[empty]
            counts_np = np.maximum(counts_np, 1)
            centroids = jnp.asarray((sums / counts_np[:, None]).astype(np.float32))
        if verbose:
            print(f"kmeans iter {it + 1}/{iters}")
    return np.asarray(centroids)
