"""Fixed additive-quantizer (AQ) codebook fitting.

Least-squares estimate of fixed codebooks C_m[k] minimizing
``‖x - Σ_m C_m[code_m]‖²`` given fixed codes — used by the index build to
approximate QINCo decodes with pure table lookups (reference:
qinco/search/search_utils.py:81-115, which materializes an (nt, M·k)
one-hot design matrix and calls LAPACK lstsq).

TPU-first: never materialize the design matrix.  The normal equations
need only
- ``GᵀG``: the (M·k, M·k) code co-occurrence counts — M² blocks of (k, k)
  one-hot matmuls on the MXU, and
- ``Gᵀx``: per-(step, code) sums of x — segment-sums.
The small (M·k, M·k) system is then solved with a pinv (minimum-norm, the
same solution family lstsq returns for the rank-deficient one-hot
system).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _cooccurrence_and_sums(codes: jnp.ndarray, x: jnp.ndarray, k: int):
    """codes (nt, M) int32, x (nt, D) -> (GtG (Mk, Mk), Gtx (Mk, D))."""
    nt, M = codes.shape
    onehot = jax.nn.one_hot(codes, k, dtype=jnp.float32)  # (nt, M, k)

    # GtG blocks: (M, k, M, k) via one matmul over the sample axis.
    flat = onehot.reshape(nt, M * k)
    gtg = jax.lax.dot_general(
        flat,
        flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gtx = jax.lax.dot_general(
        flat,
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return gtg, gtx


def compute_fixed_aq_codebooks(
    xt: np.ndarray, train_codes: np.ndarray, k: int, *, batch: int = 262144,
    ridge: float = 1e-6
) -> np.ndarray:
    """Estimate fixed codebooks (M, k, D) from (codes, vectors)
    (reference: search_utils.py:92-102)."""
    xt = np.asarray(xt, np.float32)
    train_codes = np.asarray(train_codes)
    nt, M = train_codes.shape
    assert len(xt) == nt

    gtg = np.zeros((M * k, M * k), np.float64)
    gtx = np.zeros((M * k, xt.shape[1]), np.float64)
    for i in range(0, nt, batch):
        g, s = _cooccurrence_and_sums(
            jnp.asarray(train_codes[i : i + batch], jnp.int32),
            jnp.asarray(xt[i : i + batch]),
            k,
        )
        gtg += np.asarray(g, np.float64)
        gtx += np.asarray(s, np.float64)

    # Minimum-norm solution of the (rank-deficient) normal equations.
    # A small ridge keeps the pinv stable for unused codes.
    gtg += np.eye(M * k) * ridge * max(gtg.max(), 1.0)
    sol = np.linalg.solve(gtg, gtx)
    return sol.reshape(M, k, -1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _segment_fit(target: jnp.ndarray, codes_m: jnp.ndarray, k: int):
    """(sums (k, D), counts (k,)) of target rows grouped by code."""
    sums = jax.ops.segment_sum(target, codes_m, num_segments=k)
    counts = jax.ops.segment_sum(
        jnp.ones((target.shape[0],), jnp.float32), codes_m, num_segments=k
    )
    return sums, counts


def compute_fixed_aq_codebooks_backfit(
    xt: np.ndarray, train_codes: np.ndarray, k: int, *, sweeps: int = 4,
    shrinkage: float = 8.0, batch: int = 262144,
    prior: np.ndarray | None = None,
) -> np.ndarray:
    """Backfitting (cyclic coordinate-descent) estimate of fixed additive
    codebooks — the large-K path the joint normal equations can't reach.

    At the paired-code scale (K² = 65536, M/2 books) the reference's
    lstsq formulation needs an (M·K²)² system — hundreds of GB — which
    is why the reference ships pair_codes hardcoded off
    (reference: search_tasks.py:641, 145-151).  Backfitting needs only
    per-code segment-sums: each pass refits book m to the conditional
    mean of (residual + its own contribution), shrunk by a pseudo-count
    for sparse bins (65536 bins over 1M rows ≈ 15 samples each), and
    converges like Gauss-Seidel on the same normal equations.

    ``prior (M, k, D)`` recenters the shrinkage: sparse bins pull toward
    the prior codeword instead of toward zero (a MAP fit with a Gaussian
    prior of strength ``shrinkage`` pseudo-counts per bin).  The paired
    index build passes the *composed unpaired* AQ solution — bins the
    trainset barely populates then keep the additive (m1) + (m2)
    estimate rather than collapsing toward the bin-mean of ~nothing,
    which is what cost the paired index its shortlist recall at 1M-row
    trainsets (0.920 vs 0.976 unpaired; docs/search.md).
    """
    xt = np.asarray(xt, np.float32)
    train_codes = np.asarray(train_codes, np.int64)
    nt, M = train_codes.shape
    D = xt.shape[1]
    if prior is not None:
        assert prior.shape == (M, k, D), (prior.shape, (M, k, D))
        books = np.asarray(prior, np.float32).copy()
        resid = xt.copy()
        for m in range(M):
            cm = train_codes[:, m]
            for i in range(0, nt, batch):
                sl = slice(i, i + batch)
                resid[sl] -= books[m][cm[sl]]
    else:
        books = np.zeros((M, k, D), np.float32)
        resid = xt.copy()

    for sweep in range(sweeps):
        for m in range(M):
            cm = train_codes[:, m]
            # target = resid + current contribution of book m
            sums = np.zeros((k, D), np.float64)
            counts = np.zeros((k,), np.float64)
            for i in range(0, nt, batch):
                tgt = resid[i:i + batch] + books[m][cm[i:i + batch]]
                s, c = _segment_fit(
                    jnp.asarray(tgt), jnp.asarray(cm[i:i + batch]), k)
                sums += np.asarray(s, np.float64)
                counts += np.asarray(c, np.float64)
            if prior is not None:
                new_book = (
                    (sums + shrinkage * prior[m])
                    / (counts + shrinkage)[:, None]
                ).astype(np.float32)
            else:
                new_book = (
                    sums / (counts + shrinkage)[:, None]
                ).astype(np.float32)
            for i in range(0, nt, batch):
                sl = slice(i, i + batch)
                resid[sl] += books[m][cm[sl]] - new_book[cm[sl]]
            books[m] = new_book
    return books


def reconstruct_from_codebooks(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Additive reconstruction Σ_m C_m[code_m]
    (reference: search_utils.py:105-115)."""
    codes = np.asarray(codes)
    M = codes.shape[1]
    assert codebooks.shape[0] == M
    out = codebooks[0][codes[:, 0]].copy()
    for m in range(1, M):
        out += codebooks[m][codes[:, m]]
    return out
