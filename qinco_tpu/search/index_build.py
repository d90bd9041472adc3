"""Index construction: AQ training phase + add phase.

Reference: build_index_training_phase / build_index_adding_phase
(qinco/search/search_tasks.py:154-268).  The faiss
``IVF{K}_HNSW32,RQ{M}x8_Nqint8`` factory is replaced by the native
packed-list index (native/ivf_index.cpp) + TPU coarse probing; the AQ
codebooks come from :mod:`qinco_tpu.ops.aq` instead of LAPACK lstsq.
"""

from __future__ import annotations

import numpy as np

from ..metrics import corrected_mse
from ..ops.aq import (
    compute_fixed_aq_codebooks,
    compute_fixed_aq_codebooks_backfit,
    reconstruct_from_codebooks,
)
from ..utils import Timer
from .index import IvfIndex

ADD_BATCH = 1_000_000  # reference: search_tasks.py:245


def pair_codes_ivf(codes: np.ndarray, K: int) -> np.ndarray:
    """Combine code pairs (m, m + M/2) into one K²-ary code
    (reference: pair_codes_ivf, search_tasks.py:145-151).

    ``codes (n, M+1)`` with the IVF code in column 0 -> ``(n, M/2+1)``.
    Halves the per-code scan cost of the inverted lists at the price of
    K²-entry AQ codebooks.
    """
    ivf, rest = codes[:, :1], codes[:, 1:]
    M = rest.shape[-1]
    assert M % 2 == 0, f"pair_codes needs an even M, got {M}"
    rest = rest.reshape(-1, 2, M // 2)
    paired = rest[:, 0] * K + rest[:, 1]
    return np.concatenate([ivf, paired], axis=-1)


def unpair_codes_ivf(codes: np.ndarray, K: int) -> np.ndarray:
    """Inverse of :func:`pair_codes_ivf`: ``(n, M/2+1) -> (n, M+1)``."""
    ivf, paired = codes[:, :1], codes[:, 1:]
    first, second = paired // K, paired % K
    return np.concatenate([ivf, first, second], axis=-1)


#: Above this many one-hot design columns (M·K) the dense normal
#: equations stop fitting in memory and the backfit AQ path is used.
AQ_DENSE_FIT_MAX = 16384


def build_index_training_phase(
    cfg, ivf_centroids: np.ndarray, vec_data: np.ndarray,
    encoded_data: np.ndarray, log=print,
    aq_dense_fit_max: int = AQ_DENSE_FIT_MAX,
) -> IvfIndex:
    """Fit AQ codebooks on IVF residuals and assemble an empty index.

    ``aq_dense_fit_max`` caps the M·K design width the dense lstsq fit
    is allowed (tests lower it to exercise the backfit path at small
    scale — the K²=65536 production regime always exceeds the default).
    """
    timer = Timer()
    K = cfg.K
    unpaired_data = None
    if cfg.search.pair_codes:
        # K -> K² combined codes (reference formulation:
        # search_tasks.py:145-151, shipped hardcoded off at :641).
        # K² <= 256 stores 1-byte codes like any index; K² <= 65536
        # (the reference's K=256 setting) stores 2-byte codes and scans
        # with the query-only LUT (norm_mode="full" — see IvfIndex).
        assert K * K <= 65536, (
            f"pair_codes requires K² <= 65536 (got K={K}); use K <= 256"
        )
        log(f"[{timer}] Pairing training codes: K {K} -> {K * K}")
        K = K * K
        unpaired_data = encoded_data
        encoded_data = pair_codes_ivf(encoded_data, cfg.K)
    norm_mode = "full" if K > 256 else "resid"
    with timer:
        assert vec_data.dtype == np.float32
        max_nt = min(len(vec_data), cfg.search.aq_training_samples)
        log(f"[{timer}] Computing residuals on {max_nt}/{len(vec_data)} rows")
        xt_residuals = vec_data - ivf_centroids[encoded_data[:, 0]]

        M_codes = encoded_data.shape[1] - 1
        if M_codes * K > aq_dense_fit_max:
            prior = None
            if unpaired_data is not None and cfg.search.pair_prior:
                # Recenter the sparse-bin shrinkage on the composed
                # UNPAIRED solution: at 1M-row trainsets the K² bins see
                # ~15 samples each and the zero-centered conditional
                # mean cost the paired index its shortlist recall
                # (0.920 vs 0.976 unpaired — docs/search.md).  The
                # unpaired fit is a narrow (M·K)² system; pairing (m1,
                # m2) codewords additively gives each K² bin a
                # data-independent fallback estimate.
                log(f"[{timer}] Fitting the unpaired AQ prior "
                    f"({M_codes * 2}x{cfg.K})")
                unp = compute_fixed_aq_codebooks(
                    xt_residuals[:max_nt], unpaired_data[:max_nt, 1:],
                    k=cfg.K,
                )  # (M, K, D)
                half = unp.shape[0] // 2
                prior = (
                    unp[:half, :, None, :] + unp[half:, None, :, :]
                ).reshape(half, K, -1)
            # the (M·K)² normal equations stop fitting in memory; the
            # backfitting fit converges to the same solution family
            log(f"[{timer}] Training fixed AQ codebooks (backfit, "
                f"{M_codes}x{K}"
                + (", prior-centered shrinkage)" if prior is not None
                   else ")"))
            codebooks = compute_fixed_aq_codebooks_backfit(
                xt_residuals[:max_nt], encoded_data[:max_nt, 1:], k=K,
                prior=prior,
            )
        else:
            log(f"[{timer}] Training fixed AQ codebooks")
            codebooks = compute_fixed_aq_codebooks(
                xt_residuals[:max_nt], encoded_data[:max_nt, 1:], k=K
            )
        log(f"[{timer}] Codebooks {codebooks.shape}")

        xt_recons = reconstruct_from_codebooks(encoded_data[:, 1:], codebooks)
        mse = corrected_mse(xt_recons, xt_residuals, cfg.mse_scale)
        log(f"[{timer}] AQ train MSE: {mse:g}")

        index = IvfIndex.build(ivf_centroids, codebooks, norm_mode=norm_mode)
        # Norm quantizer trained on reconstruction norms
        # (reference: search_tasks.py:195,219 + add-phase norms :258).
        # norm_mode="full" stores ||c + r||² (centroid included) so the
        # scan's LUT can be query-only.
        if norm_mode == "full":
            norms = ((xt_recons + ivf_centroids[encoded_data[:, 0]]) ** 2
                     ).sum(-1)
            # list_nos lets the index subtract the exact per-list ||c||²
            # so the int8 quantizer spans only the residual-dependent
            # part (round-3 advisor finding)
            index.train_norm(norms, list_nos=encoded_data[:, 0])
        else:
            norms = (xt_recons**2).sum(-1)
            index.train_norm(norms)
        log(f"[{timer}] Index ready (nlist={index.nlist}, M={index.M}, "
            f"norm_mode={norm_mode})")
    return index


def build_index_adding_phase(cfg, encoded_db, index: IvfIndex, log=print) -> None:
    """Pack pre-computed codes into the inverted lists
    (reference: search_tasks.py:228-268)."""
    timer = Timer()
    with timer:
        codebooks = index.codebooks
        for batch in encoded_db.iter(ADD_BATCH):
            if cfg.search.pair_codes:
                batch = pair_codes_ivf(batch, cfg.K)
            assert batch.shape[1] == index.M + 1
            recons = reconstruct_from_codebooks(batch[:, 1:], codebooks)
            if index.norm_mode == "full":
                recons = recons + index.ivf_centroids[batch[:, 0]]
            norms = (recons**2).sum(-1)
            ids = np.arange(
                encoded_db.batch_start_id, encoded_db.batch_end_id, dtype=np.int64
            )
            log(
                f"[{timer}] Adding rows {encoded_db.batch_start_id}:"
                f"{encoded_db.batch_end_id}"
            )
            index.add_batch(ids, batch[:, 0], batch[:, 1:], norms)
    log(f"Adding done in {timer}; ntotal={index.ntotal}")


def run_build_index(task):
    """BuildIndexTask driver (reference: search_tasks.py:700-732)."""
    cfg = task.cfg
    assert cfg.ivf_centroids, "Specify 'ivf_centroids'"
    assert cfg.encoded_db, "Specify 'encoded_db'"
    assert cfg.encoded_trainset, "Specify 'encoded_trainset'"
    assert cfg.output and str(cfg.output).endswith(".qivf"), (
        "Specify a .qivf output path for the index"
    )
    from ..data.datasets import load_vec_trainset
    from ..tasks.search_tasks import EncodedDBIterator

    (train_vecs, _), _ = load_vec_trainset(cfg)
    train_codes = EncodedDBIterator(cfg, cfg.encoded_trainset).load_all()
    n = min(len(train_vecs), len(train_codes), cfg.ds.trainset or len(train_vecs))
    encoded_db = EncodedDBIterator(cfg, cfg.encoded_db)
    ivf_centroids = task.ivf_centroids.astype(np.float32)

    index = build_index_training_phase(
        cfg, ivf_centroids, np.asarray(train_vecs[:n], np.float32),
        train_codes[:n], log=task.print,
    )
    build_index_adding_phase(cfg, encoded_db, index, log=task.print)
    task.print(f"Saving index to {cfg.output}")
    index.save(cfg.output)
    return index
