"""Two-stage flat search: AQ-LUT shortlist + QINCo exact rerank.

Reference: qinco_v1/search_2stage.py — demonstrates large-shortlist
retrieval without an IVF index: stage 1 ranks the whole database by the
cheap fixed-codebook (AQ) reconstruction distance, stage 2 decodes the
top ``nshort`` with the full QINCo model and reranks exactly.

TPU-first: stage 1 is one LUT build (M·K dot products per query) plus a
gather-accumulate over the code matrix — no reconstruction of the
database is ever materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import compute_recalls
from ..models.qinco import decode_raw
from ..utils import TimersManager


@functools.partial(jax.jit, static_argnames=("nshort",))
def _aq_shortlist(q: jnp.ndarray, codes_MN: jnp.ndarray, codebooks: jnp.ndarray,
                  norms: jnp.ndarray, nshort: int):
    """Stage-1 ranking for one query batch.

    dist(q, y) ≈ −2 Σ_m LUT_m[code_m] + ‖y‖² (partial; ‖q‖² constant).
    LUT build: (M, K, D) · (Bq, D) on the MXU; accumulation is a gather
    over the stored codes.
    """
    # luts: (Bq, M, K)
    luts = -2.0 * jnp.einsum(
        "qd,mkd->qmk", q, codebooks, preferred_element_type=jnp.float32
    )

    def body(acc, xs):
        lut_m, codes_m = xs  # (Bq, K), (N,)
        return acc + lut_m[:, codes_m], None

    M, N = codes_MN.shape
    acc0 = jnp.broadcast_to(norms[None, :], (q.shape[0], N))
    dists, _ = jax.lax.scan(
        body, acc0, (jnp.moveaxis(luts, 1, 0), codes_MN)
    )
    neg, idx = jax.lax.top_k(-dists, nshort)
    return idx, -neg


def run_search_two_stage(
    params,
    spec,
    db_codes: np.ndarray,  # (M_ivf, N) QINCo codes of the database
    aq_codebooks: np.ndarray,  # (M_ivf_or_M, K, D) fixed codebooks (incl. step0 book)
    queries: np.ndarray,
    gt: np.ndarray,
    *,
    nshort: int = 100,
    batch_queries: int = 256,
    decode_batch: int = 8192,
    log=print,
):
    """-> (I (nq, 100), recalls dict).  Stage 1 AQ, stage 2 QINCo rerank."""
    timers = TimersManager("shortlist", "rerank")
    M, N = db_codes.shape
    assert aq_codebooks.shape[0] == M

    # Precompute AQ reconstruction norms ‖y‖² once for the whole DB.
    recon_norms = np.zeros((N,), np.float32)
    recon = np.zeros((N, aq_codebooks.shape[-1]), np.float32)
    for m in range(M):
        recon += aq_codebooks[m][db_codes[m]]
    recon_norms = (recon**2).sum(-1).astype(np.float32)
    del recon

    codes_j = jnp.asarray(db_codes)
    books_j = jnp.asarray(aq_codebooks, jnp.float32)
    norms_j = jnp.asarray(recon_norms)

    all_I = []
    for i in range(0, len(queries), batch_queries):
        q = jnp.asarray(np.asarray(queries[i : i + batch_queries], np.float32))
        with timers.shortlist:
            idx, _ = _aq_shortlist(q, codes_j, books_j, norms_j, nshort)
        with timers.rerank:
            idx_np = np.asarray(idx)  # (Bq, nshort)
            cand_codes = db_codes[:, idx_np.reshape(-1)]  # (M, Bq*nshort)
            dec = []
            for j in range(0, cand_codes.shape[1], decode_batch):
                chunk = cand_codes[:, j : j + decode_batch]
                n_valid = chunk.shape[1]
                if n_valid < decode_batch:
                    chunk = np.concatenate(
                        [chunk, np.zeros((M, decode_batch - n_valid), np.int32)],
                        axis=1,
                    )
                dec.append(
                    np.asarray(decode_raw(params, spec, jnp.asarray(chunk)))[:n_valid]
                )
            dec = np.concatenate(dec).reshape(len(idx_np), nshort, -1)
            # exact rerank on decoded candidates
            diff = np.asarray(q)[:, None, :] - dec
            d = (diff * diff).sum(-1)
            order = np.argsort(d, axis=1)[:, :100]
            all_I.append(np.take_along_axis(idx_np, order, axis=1))
    I = np.concatenate(all_I)
    recalls = compute_recalls(I, np.asarray(gt))
    log(
        f"2-stage search: R@1={recalls[1] * 100:.2f} R@10={recalls[10] * 100:.2f} "
        f"R@100={recalls[100] * 100:.2f} "
        f"[T_shortlist={timers.shortlist.s()} T_rerank={timers.rerank.s()}]"
    )
    return I, recalls
