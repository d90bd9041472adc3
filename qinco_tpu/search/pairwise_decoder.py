"""Pairwise additive decoder for fast mid-reranking.

Re-implementation of the reference's PairwiseDecoderIVF
(reference: qinco/search/pairwise_decoder.py, paper QINCo2 §3.3):

1. The 2^20-entry IVF codebook is decomposed into ``IVF_M=5`` small
   K-entry codebooks by usage-weighted iterative k-means over the
   centroids themselves, giving every IVF code a 5-tuple of small codes
   (reference: :132-174).
2. Greedy selection of ``M_target = n_pairwise_codebooks · M`` code
   *pairs* (m1, m2): for each candidate pair a K²-entry codebook of
   conditional means of the current residual is fitted; the pair with
   the lowest local error is kept and its reconstruction subtracted
   (reference: :176-205).
3. Decoding is then ``Σ_t books[t][c_{m1(t)} · K + c_{m2(t)}]`` — pure
   table lookups, ideal for both TPU gathers and the C++ scan path.

TPU-first: codebook fitting is ``jax.ops.segment_sum`` into K² bins
(MXU-free but bandwidth-friendly), pair scoring runs one jitted pass per
pair with only the scalar error materialized.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import pairwise_sqdist_partial

IVF_M = 5  # reference: pairwise_decoder.py:16
ITER_STEPS = 50  # reference: pairwise_decoder.py:17
EVAL_ROWS = 100_000  # reference: pairwise_decoder.py:106


# ---------------------------------------------------------------------------
# IVF codebook decomposition
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("K_base",))
def _weighted_kmeans_step(centroids, weights, book, K_base):
    d = pairwise_sqdist_partial(centroids, book)
    assign = jnp.argmin(d, axis=-1)
    w = weights
    sums = jax.ops.segment_sum(centroids * w[:, None], assign, num_segments=K_base)
    counts = jax.ops.segment_sum(w, assign, num_segments=K_base)
    book = sums / jnp.maximum(counts, 1.0)[:, None]
    return assign.astype(jnp.int32), book


def decompose_ivf_codebook(
    ivf_centroids: np.ndarray,
    usage_counts: np.ndarray,
    K_base: int,
    *,
    ivf_m: int = IVF_M,
    iters: int = ITER_STEPS,
    seed: int = 0,
):
    """-> (small_books (ivf_m, K_base, D), code_map (IVF_K, ivf_m) int32).

    Stage-wise weighted k-means on the (residual) IVF centroids
    (reference: train_make_ivf_small_codesbooks, :132-174).
    """
    cent = jnp.asarray(ivf_centroids, jnp.float32)
    weights = jnp.asarray(np.maximum(usage_counts, 0), jnp.float32)
    IVF_K, D = cent.shape
    rng = np.random.default_rng(seed)

    books, maps = [], []
    probs = np.asarray(weights, np.float64)
    for m in range(ivf_m):
        p = probs / probs.sum() if probs.sum() > 0 else None
        init_idx = rng.choice(IVF_K, size=K_base, replace=False, p=p)
        book = cent[jnp.asarray(init_idx)]
        assign = jnp.zeros((IVF_K,), jnp.int32)
        for it in range(iters):
            new_assign, book = _weighted_kmeans_step(cent, weights, book, K_base)
            if bool(jnp.all(new_assign == assign)) and it > 0:
                break
            assign = new_assign
        books.append(np.asarray(book))
        maps.append(np.asarray(assign))
        cent = cent - book[assign]
    return np.stack(books), np.stack(maps, axis=1)


# ---------------------------------------------------------------------------
# Greedy pairwise codebook training
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("K2",))
def _fit_pair_book(codes_comb, resid, K2, shrink=0.0):
    """Conditional-mean codebook over combined codes
    (reference: build_combined_codebook, :100-110).

    ``shrink`` adds a pseudo-count to every bin, shrinking sparse-bin
    means toward zero (the residual is zero-mean after earlier books).
    The reference's unregularized fit (shrink=0) overfits when K^2 bins
    see only a handful of training rows each."""
    counts = jax.ops.segment_sum(
        jnp.ones((len(codes_comb),), jnp.float32), codes_comb, num_segments=K2
    )
    sums = jax.ops.segment_sum(resid, codes_comb, num_segments=K2)
    book = sums / jnp.maximum(counts + shrink, 1.0)[:, None]
    return book


@functools.partial(jax.jit, static_argnames=("K2", "n_eval"))
def _pair_error(codes_comb, resid, K2, n_eval, shrink=0.0):
    book = _fit_pair_book(codes_comb, resid, K2, shrink)
    r = resid[:n_eval] - book[codes_comb[:n_eval]]
    return jnp.sum(r * r) / n_eval


@dataclass
class PairwiseDecoder:
    """Trained pairwise decoder (weights only; pure functions below)."""

    books: np.ndarray  # (M_target, K_base**2, D)
    pairs: np.ndarray  # (2, M_target) indices into combined code rows
    ivf_small_books: np.ndarray  # (IVF_M, K_base, D)
    ivf_code_map: np.ndarray  # (IVF_K, IVF_M)
    K_base: int
    M_base: int

    def save(self, path) -> None:
        np.savez_compressed(
            path,
            books=self.books,
            pairs=self.pairs,
            ivf_small_books=self.ivf_small_books,
            ivf_code_map=self.ivf_code_map,
            K_base=self.K_base,
            M_base=self.M_base,
        )

    @classmethod
    def load(cls, path) -> "PairwiseDecoder":
        z = np.load(path)
        return cls(
            books=z["books"],
            pairs=z["pairs"],
            ivf_small_books=z["ivf_small_books"],
            ivf_code_map=z["ivf_code_map"],
            K_base=int(z["K_base"]),
            M_base=int(z["M_base"]),
        )

    def _device_tables(self):
        # The K^2-entry books are hundreds of MB; transfer them once and
        # keep them resident instead of re-uploading per decode call.
        cached = getattr(self, "_dev", None)
        if cached is None:
            cached = (
                jnp.asarray(self.books),
                jnp.asarray(self.pairs),
                jnp.asarray(self.ivf_code_map),
            )
            object.__setattr__(self, "_dev", cached)
        return cached

    def decode(self, codes_MB: np.ndarray, ivf_codes: np.ndarray) -> np.ndarray:
        """Residual reconstruction past the IVF centroid
        (reference: forward + map_codes, :88-93,126-130).

        On an accelerator backend the K²-table gathers run on device
        (tables cached resident); on the CPU backend the native OpenMP
        gather-accumulate kernel (native/ivf_index.cpp:qpw_decode) does
        the same sum with half the memory traffic of the XLA scan."""
        if jax.default_backend() == "cpu":
            return self.decode_native(codes_MB, ivf_codes)
        books, pairs, code_map = self._device_tables()
        return np.asarray(
            pairwise_decode(
                books,
                pairs,
                code_map,
                jnp.asarray(codes_MB, jnp.int32),
                jnp.asarray(ivf_codes, jnp.int32),
                self.K_base,
            )
        )

    def decode_native(
        self, codes_MB: np.ndarray, ivf_codes: np.ndarray, nthreads: int = 0
    ) -> np.ndarray:
        """CPU decode through the native kernel; bit-compatible table sum
        (same accumulation order as the jitted scan)."""
        import ctypes

        from .index import _ptr, get_lib

        codes_MB = np.ascontiguousarray(codes_MB, np.int32)  # (M_base, B)
        ivf_codes = np.ascontiguousarray(ivf_codes, np.int32)  # (B,)
        code_map = self._code_map_i32c()  # (n_map, ivf_m)
        pairs = np.ascontiguousarray(self.pairs, np.int32)  # (2, T)
        books = self._books_f32c()
        T, K2, D = books.shape
        B = codes_MB.shape[1]
        out = np.empty((B, D), np.float32)
        get_lib().qpw_decode(
            _ptr(books, ctypes.c_float), _ptr(codes_MB, ctypes.c_int),
            _ptr(ivf_codes, ctypes.c_int), _ptr(code_map, ctypes.c_int),
            code_map.shape[1], self.M_base, self.K_base,
            _ptr(pairs, ctypes.c_int), T, B, K2, D,
            _ptr(out, ctypes.c_float), nthreads,
        )
        return out

    def scores(
        self,
        xq: np.ndarray,  # (nq, D)
        codes_int32: np.ndarray,  # (nq * nmid, M_base + 1), col 0 = IVF code
        centroids: np.ndarray,  # (nlist, D)
        nmid: int,
        nthreads: int = 0,
    ) -> np.ndarray:
        """Fused mid-rerank scoring: squared distance of each query to
        the pairwise-decoded reconstruction (centroid + residual) of its
        nmid shortlist entries, (nq, nmid) f32.  The decoded (B, D)
        shortlist never materializes (the reference decodes, adds the
        centroid and computes distances in three passes,
        search_tasks.py:448-471).  Native OpenMP kernel on the CPU
        backend; one fused jit on accelerators."""
        nq = len(xq)
        if jax.default_backend() == "cpu":
            import ctypes

            from .index import _ptr, get_lib

            codes_int32 = np.ascontiguousarray(codes_int32, np.int32)
            xq = np.ascontiguousarray(xq, np.float32)
            cents = np.ascontiguousarray(centroids, np.float32)
            books = self._books_f32c()
            code_map = self._code_map_i32c()
            pairs = np.ascontiguousarray(self.pairs, np.int32)
            T, K2, D = books.shape
            B = codes_int32.shape[0]
            assert B == nq * nmid and codes_int32.shape[1] == self.M_base + 1
            out = np.empty((B,), np.float32)
            get_lib().qpw_score(
                _ptr(books, ctypes.c_float), _ptr(codes_int32, ctypes.c_int),
                _ptr(code_map, ctypes.c_int), code_map.shape[1], self.M_base,
                self.K_base, _ptr(pairs, ctypes.c_int), T, K2, D,
                _ptr(cents, ctypes.c_float), _ptr(xq, ctypes.c_float),
                nmid, B, _ptr(out, ctypes.c_float), nthreads,
            )
            return out.reshape(nq, nmid)
        books, pairs, code_map = self._device_tables()
        return np.asarray(
            pairwise_scores(
                books, pairs, code_map,
                jnp.asarray(codes_int32[:, 1:].T, jnp.int32),
                jnp.asarray(codes_int32[:, 0], jnp.int32),
                jnp.asarray(centroids), jnp.asarray(xq), self.K_base, nmid,
            )
        )

    def _books_f32c(self) -> np.ndarray:
        cached = getattr(self, "_books_c", None)
        if cached is None:
            cached = np.ascontiguousarray(self.books, np.float32)
            object.__setattr__(self, "_books_c", cached)
        return cached

    def _code_map_i32c(self) -> np.ndarray:
        cached = getattr(self, "_code_map_c", None)
        if cached is None:
            cached = np.ascontiguousarray(self.ivf_code_map, np.int32)
            object.__setattr__(self, "_code_map_c", cached)
        return cached


@functools.partial(jax.jit, static_argnames=("K_base",))
def pairwise_decode(books, pairs, ivf_code_map, codes_MB, ivf_codes, K_base):
    """codes_MB (M_base, B), ivf_codes (B,) -> xhat (B, D)."""
    ivf_small = ivf_code_map[ivf_codes].T  # (IVF_M, B)
    all_codes = jnp.concatenate([codes_MB, ivf_small], axis=0)
    comb = all_codes[pairs[0]] * K_base + all_codes[pairs[1]]  # (M_target, B)

    def body(acc, xs):
        book, c = xs
        return acc + book[c], None

    out, _ = jax.lax.scan(
        body, jnp.zeros((codes_MB.shape[1], books.shape[-1]), jnp.float32),
        (books, comb),
    )
    return out


@functools.partial(jax.jit, static_argnames=("K_base", "nmid"))
def pairwise_scores(
    books, pairs, ivf_code_map, codes_MB, ivf_codes, centroids, xq,
    K_base, nmid,
):
    """Device-fused mid-rerank scores (nq, nmid): decode + centroid add
    + squared distance in one jit — the decoded shortlist stays on
    device and only the scores come back."""
    xhat = pairwise_decode(
        books, pairs, ivf_code_map, codes_MB, ivf_codes, K_base
    )
    xhat = xhat + centroids[ivf_codes]
    q = jnp.repeat(xq, nmid, axis=0)  # (nq*nmid, D)
    return jnp.sum((q - xhat) ** 2, axis=-1).reshape(len(xq), nmid)


def train_pairwise_decoder(
    train_codes_MB: np.ndarray,  # (M_base, B) QINCo codes (no IVF row)
    ivf_codes: np.ndarray,  # (B,)
    resid: np.ndarray,  # (B, D) trainset minus IVF centroid
    ivf_centroids: np.ndarray,  # (IVF_K, D)
    *,
    K_base: int,
    M_target: int,
    seed: int = 0,
    shrinkage: float = 0.0,
    verbose: bool = True,
    log=print,
) -> PairwiseDecoder:
    """Full training (reference: PairwiseDecoderIVF.train, :176-205)."""
    B = resid.shape[0]
    M_base = train_codes_MB.shape[0]
    K2 = K_base * K_base

    # 1. decompose the IVF codebook, weighted by trainset usage
    usage = np.bincount(ivf_codes, minlength=len(ivf_centroids))
    ivf_small_books, ivf_code_map = decompose_ivf_codebook(
        ivf_centroids, usage, K_base, seed=seed
    )

    all_codes = np.concatenate(
        [np.asarray(train_codes_MB, np.int64), ivf_code_map[ivf_codes].T], axis=0
    )
    M_comb = M_base + IVF_M

    resid_j = jnp.asarray(resid, jnp.float32)
    n_eval = min(EVAL_ROWS, B)

    pairs_all = [(m1, m2) for m1 in range(M_comb) for m2 in range(m1 + 1, M_comb)]
    books, sel_pairs = [], []
    for i_code in range(M_target):
        best = (np.inf, None)
        for m1, m2 in pairs_all:
            comb = jnp.asarray(all_codes[m1] * K_base + all_codes[m2])
            err = float(_pair_error(comb, resid_j, K2, n_eval, shrinkage))
            if err < best[0]:
                best = (err, (m1, m2))
        m1, m2 = best[1]
        comb = jnp.asarray(all_codes[m1] * K_base + all_codes[m2])
        book = _fit_pair_book(comb, resid_j, K2, shrinkage)
        resid_j = resid_j - book[comb]
        books.append(np.asarray(book))
        sel_pairs.append((m1, m2))
        if verbose:
            mse = float(jnp.mean(jnp.sum(resid_j**2, -1)))
            log(f"pairwise code {i_code}: pair {m1}-{m2}, residual MSE={mse:g}")

    return PairwiseDecoder(
        books=np.stack(books),
        pairs=np.asarray(sel_pairs, np.int64).T,
        ivf_small_books=ivf_small_books,
        ivf_code_map=ivf_code_map,
        K_base=K_base,
        M_base=M_base,
    )


def run_train_pairwise_decoder(task):
    """Task driver (reference: TrainPairwiseDecoderTask,
    search_tasks.py:735-832)."""
    cfg = task.cfg
    assert cfg.ivf_centroids, "Specify 'ivf_centroids'"
    assert cfg.encoded_trainset, "Specify 'encoded_trainset'"
    assert cfg.output and str(cfg.output).endswith(".npz"), (
        "Specify a .npz output path"
    )
    from ..tasks.search_tasks import EncodedDBIterator
    from ..metrics import corrected_mse

    codes_it = EncodedDBIterator(cfg, cfg.encoded_trainset)
    all_codes = codes_it.load_all()  # (n, M_ivf) with IVF code first
    n_train = cfg.ds.trainset
    train_codes = all_codes[:n_train]
    val_codes = all_codes[-cfg.ds.valset:]

    ivf_centroids = task.ivf_centroids.astype(np.float32)
    train_vecs = np.asarray(task.train_vecs[:n_train], np.float32)
    val_vecs = np.asarray(task.val_vecs, np.float32)

    resid = train_vecs - ivf_centroids[train_codes[:, 0]]
    M_target = round(cfg.n_pairwise_codebooks * cfg.M)

    # 'auto' = pseudo-count 8: regularizes the sparse-occupancy regime
    # (1M rows / 65536 bins ~ 15 samples per bin) where the reference's
    # unshrunk conditional means overfit and mid-rerank hurts recall;
    # a no-op for bins with counts >> 8, so safe at every scale.
    shrinkage = cfg.pairwise_shrinkage
    shrinkage = 8.0 if shrinkage == "auto" else float(shrinkage)

    dec = train_pairwise_decoder(
        train_codes[:, 1:].T,
        train_codes[:, 0],
        resid,
        ivf_centroids,
        K_base=cfg.K,
        M_target=M_target,
        seed=cfg.seed,
        shrinkage=shrinkage,
        verbose=cfg.verbose,
        log=task.print,
    )
    dec.save(cfg.output)

    # Round-trip self-check (reference: search_tasks.py:819-832).
    dec2 = PairwiseDecoder.load(cfg.output)
    rec = dec2.decode(train_codes[:65536, 1:].T, train_codes[:65536, 0])
    train_mse = corrected_mse(rec, resid[:65536], cfg.mse_scale)
    val_resid = val_vecs - ivf_centroids[val_codes[:, 0]]
    rec_val = dec2.decode(val_codes[:, 1:].T, val_codes[:, 0])
    val_mse = corrected_mse(rec_val, val_resid, cfg.mse_scale)
    task.print(f"pairwise decoder train_MSE={train_mse:.6f} val_MSE={val_mse:.6f}")
    return dec
