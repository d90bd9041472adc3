"""Search-pipeline tests: AQ fit, native IVF index, pairwise decoder,
operating points, end-to-end mini search."""

import numpy as np
import pytest

from qinco_tpu.metrics import compute_recalls
from qinco_tpu.ops.aq import compute_fixed_aq_codebooks, reconstruct_from_codebooks
from qinco_tpu.search.operating_points import OperatingPoints
from qinco_tpu.search.optim_order import sort_experiments_by_prior


def test_aq_fit_recovers_true_codebooks():
    """If data is exactly additive, the lstsq fit must reconstruct it."""
    rng = np.random.default_rng(0)
    M, k, D, n = 3, 8, 6, 5000
    true_books = rng.normal(size=(M, k, D)).astype(np.float32)
    codes = rng.integers(0, k, size=(n, M))
    x = reconstruct_from_codebooks(codes, true_books)
    books = compute_fixed_aq_codebooks(x, codes, k)
    rec = reconstruct_from_codebooks(codes, books)
    err = ((rec - x) ** 2).mean()
    assert err < 1e-6, err


def test_aq_fit_reduces_error_vs_means():
    rng = np.random.default_rng(1)
    M, k, D, n = 4, 16, 8, 8000
    codes = rng.integers(0, k, size=(n, M))
    x = rng.normal(size=(n, D)).astype(np.float32)
    x += reconstruct_from_codebooks(codes, rng.normal(size=(M, k, D)).astype(np.float32))
    books = compute_fixed_aq_codebooks(x, codes, k)
    rec = reconstruct_from_codebooks(codes, books)
    base = ((x - x.mean(0)) ** 2).mean()
    assert ((rec - x) ** 2).mean() < base * 0.6


def test_aq_backfit_matches_normal_equations():
    """The large-K backfitting fit must converge to (nearly) the same
    reconstruction error as the joint normal equations on a small
    problem where both run."""
    from qinco_tpu.ops.aq import compute_fixed_aq_codebooks_backfit

    rng = np.random.default_rng(2)
    M, k, D, n = 3, 16, 8, 6000
    codes = rng.integers(0, k, size=(n, M))
    x = 0.3 * rng.normal(size=(n, D)).astype(np.float32)
    x += reconstruct_from_codebooks(
        codes, rng.normal(size=(M, k, D)).astype(np.float32))

    exact = compute_fixed_aq_codebooks(x, codes, k)
    err_exact = ((reconstruct_from_codebooks(codes, exact) - x) ** 2).mean()
    bf = compute_fixed_aq_codebooks_backfit(
        x, codes, k, sweeps=6, shrinkage=1e-6)
    err_bf = ((reconstruct_from_codebooks(codes, bf) - x) ** 2).mean()
    assert err_bf <= err_exact * 1.05, (err_bf, err_exact)


def test_aq_backfit_prior_recenters_sparse_bins():
    """Prior-centered shrinkage (the paired-index fit): with K² bins and
    only a handful of samples per bin, plain zero-centered backfit
    collapses unpopulated/sparse bins toward zero, while shrinkage
    toward the composed unpaired solution keeps the additive estimate —
    held-out reconstruction error must improve substantially."""
    from qinco_tpu.ops.aq import compute_fixed_aq_codebooks_backfit
    from qinco_tpu.search.index_build import pair_codes_ivf

    rng = np.random.default_rng(7)
    M, K, D = 4, 32, 12
    true_books = rng.normal(size=(M, K, D)).astype(np.float32)
    # Real QINCo codes carry pairwise structure the additive model can't
    # express — that interaction is what the paired K² fit is FOR.
    interact = 0.25 * rng.normal(size=(M // 2, K * K, D)).astype(np.float32)

    def make(n, seed):
        r = np.random.default_rng(seed)
        codes = r.integers(0, K, size=(n, M))
        x = reconstruct_from_codebooks(codes, true_books)
        for m in range(M // 2):
            x += interact[m][codes[:, m] * K + codes[:, m + M // 2]]
        x += 0.1 * r.normal(size=x.shape).astype(np.float32)
        return codes, x

    # ~16 samples per K²=1024 bin: the sparse regime of the 1M-row
    # paired build (docs/search.md quotes ~15/bin at K²=65536).
    codes_tr, x_tr = make(16384, 1)
    codes_te, x_te = make(4096, 2)

    # Pair (m, m + M/2) exactly like the index build (drop the IVF col).
    def paired(codes):
        with_ivf = np.concatenate(
            [np.zeros((len(codes), 1), np.int64), codes], axis=1)
        return pair_codes_ivf(with_ivf, K)[:, 1:]

    k2 = K * K
    unp = compute_fixed_aq_codebooks(x_tr, codes_tr, K)
    prior = (unp[: M // 2, :, None, :] + unp[M // 2 :, None, :, :]).reshape(
        M // 2, k2, D)

    plain = compute_fixed_aq_codebooks_backfit(
        x_tr, paired(codes_tr), k2, shrinkage=8.0)
    prio = compute_fixed_aq_codebooks_backfit(
        x_tr, paired(codes_tr), k2, shrinkage=8.0, prior=prior)

    err_plain = ((reconstruct_from_codebooks(paired(codes_te), plain)
                  - x_te) ** 2).mean()
    err_prior = ((reconstruct_from_codebooks(paired(codes_te), prio)
                  - x_te) ** 2).mean()
    err_unpaired = ((reconstruct_from_codebooks(codes_te, unp)
                     - x_te) ** 2).mean()
    # prior-centered must (a) beat zero-centered clearly and (b) beat
    # the unpaired fit it falls back to (it captures the pairwise
    # interaction where bins have data, keeps the prior where they
    # don't; plain zero-shrinkage captures it too but wrecks the
    # additive part in sparse bins).
    assert err_prior < err_plain * 0.8, (err_prior, err_plain)
    assert err_prior < err_unpaired * 0.95, (err_prior, err_unpaired)


def test_qlut_scan_2byte_codes_full_norms(tmp_path):
    """Paired-K² layout: 2-byte code storage + the query-only-LUT scan
    with full-reconstruction norms must return exact distances (up to
    the int8 norm quantization) and survive save/load.
    K = 1024 > 256 forces code_bytes=2 (the K=256 pair-codes regime)."""
    from qinco_tpu.search.index import IvfIndex

    rng = np.random.default_rng(3)
    nlist, D, M, K = 32, 16, 2, 1024
    centroids = rng.normal(size=(nlist, D)).astype(np.float32) * 4
    books = rng.normal(size=(M, K, D)).astype(np.float32) * 0.5

    n = 4000
    list_nos = rng.integers(0, nlist, size=n)
    codes = rng.integers(0, K, size=(n, M)).astype(np.int64)
    recons = books[0][codes[:, 0]] + books[1][codes[:, 1]]
    vectors = centroids[list_nos] + recons

    index = IvfIndex.build(centroids, books, norm_mode="full")
    assert index.code_bytes == 2
    norms = (vectors**2).sum(-1)  # full-recon norms: ||c + r||²
    index.train_norm(norms, list_nos=list_nos)
    index.add_batch(np.arange(n, dtype=np.int64), list_nos, codes, norms)

    xq = (vectors[:24] + 0.01 * rng.normal(size=(24, D))).astype(np.float32)
    dists, ids, out_codes = index.search_and_return_codes(
        xq, 8, nprobe=nlist)
    assert (ids[:, 0] == np.arange(24)).mean() > 0.9
    for q in range(24):
        j = ids[q, 0]
        if j < 0:
            continue
        assert out_codes[q, 0, 0] == list_nos[j]
        np.testing.assert_array_equal(out_codes[q, 0, 1:], codes[j])
    true_d = ((xq[0] - vectors[ids[0, :5]]) ** 2).sum(-1)
    np.testing.assert_allclose(dists[0, :5], true_d, rtol=0.1, atol=2.0)

    # save/load keeps code width + norm mode
    path = tmp_path / "paired.qivf"
    index.save(path)
    index2 = IvfIndex.load(path)
    assert index2.code_bytes == 2 and index2.norm_mode == "full"
    d2, i2, c2 = index2.search_and_return_codes(xq, 8, nprobe=nlist)
    np.testing.assert_array_equal(ids, i2)
    np.testing.assert_allclose(dists, d2, rtol=1e-5)


def test_full_norm_quantizer_relative_precision():
    """norm_mode='full' quantizes the relative ||y||² - ||c||²: with a
    large centroid-norm spread across lists, the int8 step must track
    the residual-dependent range only, keeping scanned distances tight.
    The legacy absolute-||y||² quantizer spread the 255 levels over the
    centroid-norm variation and biased every distance (round-3 advisor
    finding on native/ivf_index.cpp)."""
    from qinco_tpu.search.index import IvfIndex

    rng = np.random.default_rng(7)
    nlist, D, M, K = 64, 16, 2, 64
    # centroid norms span two orders of magnitude across lists
    centroids = rng.normal(size=(nlist, D)).astype(np.float32)
    centroids *= rng.uniform(1.0, 60.0, size=(nlist, 1)).astype(np.float32)
    books = rng.normal(size=(M, K, D)).astype(np.float32) * 0.5

    n = 4000
    list_nos = rng.integers(0, nlist, size=n)
    codes = rng.integers(0, K, size=(n, M)).astype(np.int64)
    vectors = centroids[list_nos] + books[0][codes[:, 0]] + books[1][codes[:, 1]]
    norms = (vectors.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    xq = (vectors[:64] + 0.01 * rng.normal(size=(64, D))).astype(np.float32)

    def max_abs_err(index):
        dists, found, _ = index.search_and_return_codes(xq, 4, nprobe=nlist)
        true = ((xq[:, None, :] - vectors[found]) ** 2).sum(-1)
        return np.abs(dists - true).max()

    idx_rel = IvfIndex.build(centroids, books, norm_mode="full")
    idx_rel.train_norm(norms, list_nos=list_nos)
    idx_rel.add_batch(ids, list_nos, codes, norms)

    idx_abs = IvfIndex.build(centroids, books, norm_mode="full")
    idx_abs._legacy_abs_norms = True
    idx_abs.train_norm(norms)
    idx_abs.add_batch(ids, list_nos, codes, norms)

    err_rel, err_abs = max_abs_err(idx_rel), max_abs_err(idx_abs)
    # relative-norm quantization step ~ residual range / 255; absolute ~
    # centroid-norm spread / 255 — orders of magnitude coarser here
    assert err_rel < err_abs / 10, (err_rel, err_abs)
    # and tight in absolute terms: within a few quantization steps of
    # the residual-dependent range
    rel_range = (norms - (centroids[list_nos] ** 2).sum(-1))
    step = (rel_range.max() - rel_range.min()) / 255.0
    assert err_rel < 2.0 * step, (err_rel, step)


def test_build_index_pair_codes_k_gt_16():
    """build_index_training_phase at the reference's K=256-style regime
    (here K=32 -> K²=1024 for speed): must pick the backfit AQ fit,
    full-reconstruction norms, and 2-byte code storage, and the scan
    must retrieve the encoded vectors (reference formulation:
    search_tasks.py:145-151, shipped hardcoded off at :641).

    ``aq_dense_fit_max`` is lowered so M·K² (2·1024) exceeds it and the
    backfit path — the one the K²=65536 production regime always takes —
    actually runs; the log capture asserts which fit was picked."""
    from qinco_tpu.config import load_config
    from qinco_tpu.search.index_build import (
        build_index_training_phase, pair_codes_ivf)

    rng = np.random.default_rng(4)
    nlist, D, M, K, n = 16, 8, 4, 32, 20000
    cfg = load_config(["K=32", "M=4", "search.pair_codes=true",
                       "search.aq_training_samples=20000"])
    centroids = rng.normal(size=(nlist, D)).astype(np.float32) * 4
    # synthetic encoded data: [ivf_code, code_0..code_{M-1}]
    encoded = np.concatenate(
        [rng.integers(0, nlist, size=(n, 1)),
         rng.integers(0, K, size=(n, M))], axis=1).astype(np.int64)
    true_books = rng.normal(size=(M, K, D)).astype(np.float32)
    resid = np.zeros((n, D), np.float32)
    for m in range(M):
        resid += true_books[m][encoded[:, m + 1]]
    vecs = centroids[encoded[:, 0]] + resid

    log_lines: list[str] = []
    index = build_index_training_phase(
        cfg, centroids, vecs, encoded,
        log=lambda *a: log_lines.append(" ".join(map(str, a))),
        aq_dense_fit_max=1024)
    assert index.norm_mode == "full" and index.code_bytes == 2
    assert index.K == K * K and index.M == M // 2
    assert any("backfit" in line for line in log_lines), log_lines

    paired = pair_codes_ivf(encoded, K)
    recons = reconstruct_from_codebooks(paired[:, 1:], index.codebooks)
    full = recons + centroids[encoded[:, 0]]
    norms = (full**2).sum(-1)
    index.add_batch(np.arange(n, dtype=np.int64), encoded[:, 0],
                    paired[:, 1:], norms)

    xq = vecs[:32]
    dists, ids, codes = index.search_and_return_codes(xq, 4, nprobe=nlist)
    # the paired AQ approximation is lossy (backfit + shrinkage on
    # ~20 rows/bin) but self-retrieval must still dominate
    assert (ids[:, 0] == np.arange(32)).mean() > 0.8, ids[:, 0]


# ---------------------------------------------------------------------------
# native IVF index
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivf_setup():
    rng = np.random.default_rng(0)
    nlist, D, M, K = 64, 16, 4, 256
    centroids = rng.normal(size=(nlist, D)).astype(np.float32) * 4
    books = rng.normal(size=(M, K, D)).astype(np.float32) * 0.5

    n = 5000
    list_nos = rng.integers(0, nlist, size=n)
    codes = rng.integers(0, K, size=(n, M)).astype(np.uint8)
    recons = np.zeros((n, D), np.float32)
    for m in range(M):
        recons += books[m][codes[:, m]]
    vectors = centroids[list_nos] + recons
    return dict(
        centroids=centroids, books=books, list_nos=list_nos, codes=codes,
        vectors=vectors, recons=recons, nlist=nlist, D=D, M=M,
    )


def _build_index(s):
    from qinco_tpu.search.index import IvfIndex

    index = IvfIndex.build(s["centroids"], s["books"])
    norms = (s["recons"] ** 2).sum(-1)
    index.train_norm(norms)
    ids = np.arange(len(s["vectors"]), dtype=np.int64)
    index.add_batch(ids, s["list_nos"], s["codes"], norms)
    return index


def test_ivf_index_add_and_scan_exact_distance(ivf_setup):
    s = ivf_setup
    index = _build_index(s)
    assert index.ntotal == len(s["vectors"])

    rng = np.random.default_rng(1)
    xq = (s["vectors"][:32] + 0.01 * rng.normal(size=(32, s["D"]))).astype(np.float32)
    dists, ids, codes = index.search_and_return_codes(xq, 10, nprobe=s["nlist"])
    # probing every list with exact LUT distances (+quantized norms) must
    # find each query's own source vector first
    assert (ids[:, 0] == np.arange(32)).mean() > 0.9
    # returned codes must match what was stored
    for q in range(32):
        j = ids[q, 0]
        if j < 0:
            continue
        assert codes[q, 0, 0] == s["list_nos"][j]
        np.testing.assert_array_equal(codes[q, 0, 1:], s["codes"][j])
    # distances approximate true squared distances (norm is int8-quantized)
    true_d = ((xq[0] - s["vectors"][ids[0, :5]]) ** 2).sum(-1)
    np.testing.assert_allclose(dists[0, :5], true_d, rtol=0.1, atol=2.0)


def test_ivf_index_save_load_roundtrip(ivf_setup, tmp_path):
    from qinco_tpu.search.index import IvfIndex

    s = ivf_setup
    index = _build_index(s)
    path = tmp_path / "test.qivf"
    index.save(path)
    index2 = IvfIndex.load(path)
    assert index2.ntotal == index.ntotal
    assert index2.nlist == index.nlist

    xq = s["vectors"][100:110]
    d1, i1, c1 = index.search_and_return_codes(xq, 5, nprobe=8)
    d2, i2, c2 = index2.search_and_return_codes(xq, 5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_ivf_recall_improves_with_nprobe(ivf_setup):
    s = ivf_setup
    index = _build_index(s)
    rng = np.random.default_rng(3)
    xq = (s["vectors"][:200] + 0.05 * rng.normal(size=(200, s["D"]))).astype(
        np.float32
    )
    gt = np.arange(200)[:, None]
    recs = []
    for nprobe in (1, 4, 16):
        _, ids, _ = index.search_and_return_codes(xq, 10, nprobe=nprobe)
        recs.append(compute_recalls(ids, gt)[10])
    assert recs[0] <= recs[1] <= recs[2]
    assert recs[2] > 0.9


# ---------------------------------------------------------------------------
# pairwise decoder
# ---------------------------------------------------------------------------


def test_pairwise_decoder_trains_and_roundtrips(tmp_path):
    from qinco_tpu.search.pairwise_decoder import (
        PairwiseDecoder,
        train_pairwise_decoder,
    )

    rng = np.random.default_rng(0)
    IVF_K, K_base, M_base, D, B = 128, 8, 3, 10, 4000
    ivf_centroids = rng.normal(size=(IVF_K, D)).astype(np.float32) * 2
    ivf_codes = rng.integers(0, IVF_K, size=B)
    codes = rng.integers(0, K_base, size=(M_base, B))
    # residual correlated with codes so the decoder can learn something
    step_books = rng.normal(size=(M_base, K_base, D)).astype(np.float32)
    resid = sum(step_books[m][codes[m]] for m in range(M_base))
    resid += 0.05 * rng.normal(size=(B, D)).astype(np.float32)

    dec = train_pairwise_decoder(
        codes, ivf_codes, resid.astype(np.float32), ivf_centroids,
        K_base=K_base, M_target=4, verbose=False,
    )
    rec = dec.decode(codes, ivf_codes)
    mse = ((rec - resid) ** 2).sum(-1).mean()
    base = (resid**2).sum(-1).mean()
    assert mse < base * 0.3, (mse, base)

    path = tmp_path / "pd.npz"
    dec.save(path)
    dec2 = PairwiseDecoder.load(path)
    rec2 = dec2.decode(codes, ivf_codes)
    np.testing.assert_allclose(rec, rec2, rtol=1e-5, atol=1e-5)


def test_pairwise_decoder_shrinkage_helps_sparse_bins():
    """With K^2 bins seeing only a few rows each, the unregularized
    conditional-mean fit (reference behavior, shrinkage=0) overfits;
    additive smoothing must improve held-out reconstruction."""
    from qinco_tpu.search.pairwise_decoder import train_pairwise_decoder

    rng = np.random.default_rng(1)
    IVF_K, K_base, M_base, D = 64, 16, 3, 8
    B_train, B_val = 3000, 3000  # ~12 rows per K^2=256 bin
    step_books = rng.normal(size=(M_base, K_base, D)).astype(np.float32)
    ivf_centroids = rng.normal(size=(IVF_K, D)).astype(np.float32)

    def make(B):
        codes = rng.integers(0, K_base, size=(M_base, B))
        ivf = rng.integers(0, IVF_K, size=B)
        resid = sum(step_books[m][codes[m]] for m in range(M_base))
        # heavy noise: sparse bins memorize it without shrinkage
        resid = resid + 2.0 * rng.normal(size=(B, D))
        return codes, ivf, resid.astype(np.float32)

    tr_codes, tr_ivf, tr_resid = make(B_train)
    va_codes, va_ivf, va_resid = make(B_val)

    def val_mse(shrink):
        dec = train_pairwise_decoder(
            tr_codes, tr_ivf, tr_resid, ivf_centroids,
            K_base=K_base, M_target=3, shrinkage=shrink, verbose=False,
        )
        rec = dec.decode(va_codes, va_ivf)
        return ((rec - va_resid) ** 2).sum(-1).mean()

    m0, m8 = val_mse(0.0), val_mse(8.0)
    assert m8 < m0, (m0, m8)


# ---------------------------------------------------------------------------
# operating points
# ---------------------------------------------------------------------------


def test_operating_points_grid_and_pareto():
    op = OperatingPoints()
    op.add_range("nprobe", [1, 4, 16])
    op.add_range("nshort", [10, 100])
    assert op.num_experiments() == 6
    keys = op.all_keys()
    assert len(keys) == 6
    assert op.get_parameters((2, 1)) == {"nprobe": 16, "nshort": 100}

    op.add_operating_point((0, 0), 0.5, 1.0)
    op.add_operating_point((2, 1), 0.9, 10.0)
    # a point dominated by (0.5, 1.0) is not pareto-optimal
    assert not op.is_pareto_optimal(0.4, 2.0)
    assert op.is_pareto_optimal(0.7, 2.0)
    # bounds: key (1,0) is >= (0,0) in all params -> time at least 1.0;
    # <= (2,1) -> perf at most 0.9
    max_perf, min_time = op.predict_bounds((1, 0))
    assert max_perf <= 0.9 and min_time >= 1.0


def test_experiment_ordering_prefers_balanced_settings():
    op = OperatingPoints()
    op.add_range("nprobe", [1, 1024])
    op.add_range("quantizer_efSearch", [4, 2048])
    op.add_range("nshort", [1, 64])
    op.add_range("nmid_short", [1, 64])
    keys = sort_experiments_by_prior(op, op.all_keys())
    first = op.get_parameters(keys[0])
    # a balanced small setting should be explored before the most
    # pathological corner (nprobe=1024 with nshort=1)
    last = op.get_parameters(keys[-1])
    assert first["nmid_short"] <= 8
    assert (last["nprobe"], last["nshort"]) in [(1024, 1), (1, 64), (1024, 64), (1, 1)]


# ---------------------------------------------------------------------------
# native HNSW coarse quantizer
# ---------------------------------------------------------------------------


def test_hnsw_recall_vs_exact():
    from qinco_tpu.search.index import HnswQuantizer

    rng = np.random.default_rng(0)
    n, D = 2000, 16
    cent = rng.normal(size=(n, D)).astype(np.float32)
    q = rng.normal(size=(100, D)).astype(np.float32)
    hnsw = HnswQuantizer.build(cent, M=16, ef_construction=40)

    idx, dists = hnsw.search(q, 10, ef=64)
    true = np.argsort(((q[:, None] - cent[None]) ** 2).sum(-1), axis=1)[:, :10]
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, true)])
    assert recall > 0.8, recall
    # distances must be true squared L2 of the returned ids
    d_true = ((q[0] - cent[idx[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d_true, rtol=1e-4)

    # higher ef -> higher (or equal) recall
    idx_lo, _ = hnsw.search(q, 10, ef=10)
    recall_lo = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx_lo, true)])
    assert recall >= recall_lo - 0.05


def test_hnsw_efconstruction_monotone():
    """Bigger efConstruction pools must not hurt recall.  With naive
    closest-M pruning they did, badly (clustered neighbor lists): 0.52
    -> 0.19 recall@16 on 2^16 centroids when efC went 20 -> 80.  The
    diversity-heuristic selection keeps the trend monotone."""
    from qinco_tpu.search.index import HnswQuantizer

    rng = np.random.default_rng(3)
    # clustered data (like IVF centroids over clustered vectors) is the
    # regime where closest-M pruning degenerates
    centers = rng.normal(size=(64, 24)).astype(np.float32) * 4
    cent = (centers[rng.integers(0, 64, size=6000)]
            + rng.normal(size=(6000, 24)).astype(np.float32))
    q = (centers[rng.integers(0, 64, size=200)]
         + rng.normal(size=(200, 24)).astype(np.float32))
    true = np.argsort(((q[:, None] - cent[None]) ** 2).sum(-1), axis=1)[:, :10]

    def recall(efc):
        h = HnswQuantizer.build(cent, M=8, ef_construction=efc)
        idx, _ = h.search(q, 10, ef=48)
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, true)])

    r_lo, r_hi = recall(10), recall(80)
    assert r_hi >= r_lo - 0.03, (r_lo, r_hi)
    assert r_hi > 0.75, r_hi


def test_hnsw_save_load(tmp_path):
    from qinco_tpu.search.index import HnswQuantizer

    rng = np.random.default_rng(1)
    cent = rng.normal(size=(500, 8)).astype(np.float32)
    h1 = HnswQuantizer.build(cent, M=8, ef_construction=20)
    path = tmp_path / "g.qhnsw"
    h1.save(path)
    h2 = HnswQuantizer.load(path)
    q = rng.normal(size=(20, 8)).astype(np.float32)
    i1, d1 = h1.search(q, 5, ef=32)
    i2, d2 = h2.search(q, 5, ef=32)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_index_with_hnsw_coarse(ivf_setup):
    s = ivf_setup
    index = _build_index(s)
    index.use_hnsw(M=16, ef_construction=40, ef_search=64)
    rng = np.random.default_rng(7)
    xq = (s["vectors"][:100] + 0.01 * rng.normal(size=(100, s["D"]))).astype(
        np.float32
    )
    _, ids, _ = index.search_and_return_codes(xq, 10, nprobe=8)
    gt = np.arange(100)[:, None]
    rec = compute_recalls(ids, gt)[10]
    assert rec > 0.8, rec


def test_coarse_probe_nlist_not_multiple_of_chunk():
    """Padded centroid columns must never win top-nprobe (inf-padding
    produced NaN distances that lax.top_k ranked first — ADVICE r1)."""
    from qinco_tpu.search.index import _coarse_probe_jit
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    nlist, D, nq, nprobe = 100, 16, 32, 8
    cent = rng.normal(size=(nlist, D)).astype(np.float32)
    xq = rng.normal(size=(nq, D)).astype(np.float32)
    idx, dists = _coarse_probe_jit(
        jnp.asarray(xq), jnp.asarray(cent), nprobe, chunk=64
    )
    idx, dists = np.asarray(idx), np.asarray(dists)
    assert idx.max() < nlist and idx.min() >= 0
    assert np.isfinite(dists).all()
    # matches brute force exactly (CPU: DEFAULT == f32)
    ref = ((xq[:, None, :] - cent[None]) ** 2).sum(-1)
    ref_idx = np.argsort(ref, axis=1)[:, :nprobe]
    assert sorted(idx[0].tolist()) == sorted(ref_idx[0].tolist())
    np.testing.assert_allclose(
        np.sort(dists, axis=1), np.sort(ref, axis=1)[:, :nprobe], rtol=1e-4
    )


def test_coarse_probe_bias_is_exact():
    """The returned bias must be the exact ||q-c||^2 of the selected
    centroids (recomputed at HIGHEST precision after selection)."""
    from qinco_tpu.search.index import coarse_probe

    rng = np.random.default_rng(4)
    # non-centered data: bf16 rounding error on |q.c| would be visible
    cent = (rng.normal(size=(64, 8)) + 50.0).astype(np.float32)
    xq = (rng.normal(size=(16, 8)) + 50.0).astype(np.float32)
    idx, bias = coarse_probe(xq, cent, 4)
    ref = ((xq[:, None, :] - cent[idx]) ** 2).sum(-1)
    np.testing.assert_allclose(bias, ref, rtol=1e-5)


def test_pair_unpair_codes_roundtrip():
    from qinco_tpu.search.index_build import pair_codes_ivf, unpair_codes_ivf

    rng = np.random.default_rng(5)
    K, M = 16, 6
    codes = np.concatenate(
        [
            rng.integers(0, 1000, size=(200, 1)),
            rng.integers(0, K, size=(200, M)),
        ],
        axis=1,
    ).astype(np.int32)
    paired = pair_codes_ivf(codes, K)
    assert paired.shape == (200, M // 2 + 1)
    assert paired[:, 1:].max() < K * K
    np.testing.assert_array_equal(unpair_codes_ivf(paired, K), codes)


def test_split_lut_scan_matches_classic(ivf_setup):
    """Split-LUT scan (qterm + precomputed cterm) returns the same
    shortlists as the classic per-probe LUT scan — the decomposition
    -2(q-c).C = -2q.C + 2c.C is exact up to f32 addition order.
    ivf_setup's lists average ~78 entries (< K/2), exercising the
    native double-lookup branch."""
    s = ivf_setup
    index = _build_index(s)
    rng = np.random.default_rng(2)
    xq = (s["vectors"][:48] + 0.01 * rng.normal(size=(48, s["D"]))).astype(
        np.float32
    )
    d0, i0, c0 = index.search_and_return_codes(xq, 10, nprobe=8)
    assert index.enable_split_lut()
    d1, i1, c1 = index.search_and_return_codes(xq, 10, nprobe=8)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-3)
    # ids may swap only on f32 ties; require near-total agreement
    assert (i0 == i1).mean() > 0.99
    np.testing.assert_array_equal(c0[i0 == i1], c1[i0 == i1])


def test_split_lut_scan_long_list_branch():
    """Few big lists (n >= K/2 entries each) drive the native
    combine-then-scan branch; results must match the classic scan."""
    rng = np.random.default_rng(3)
    nlist, D, M, K = 4, 8, 2, 16
    centroids = rng.normal(size=(nlist, D)).astype(np.float32) * 4
    books = rng.normal(size=(M, K, D)).astype(np.float32) * 0.5
    n = 600  # 150 entries/list >= K/2 = 8
    list_nos = rng.integers(0, nlist, size=n)
    codes = rng.integers(0, K, size=(n, M)).astype(np.uint8)
    recons = np.zeros((n, D), np.float32)
    for m in range(M):
        recons += books[m][codes[:, m]]
    vectors = centroids[list_nos] + recons

    from qinco_tpu.search.index import IvfIndex

    index = IvfIndex.build(centroids, books)
    norms = (recons**2).sum(-1)
    index.train_norm(norms)
    index.add_batch(np.arange(n, dtype=np.int64), list_nos, codes, norms)

    xq = (vectors[:16] + 0.01 * rng.normal(size=(16, D))).astype(np.float32)
    d0, i0, _ = index.search_and_return_codes(xq, 5, nprobe=nlist)
    assert index.enable_split_lut()
    d1, i1, _ = index.search_and_return_codes(xq, 5, nprobe=nlist)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-3)
    assert (i0 == i1).mean() > 0.99


def test_split_lut_budget_gate():
    """enable_split_lut refuses when the cterm table exceeds the budget."""
    rng = np.random.default_rng(4)
    from qinco_tpu.search.index import IvfIndex

    centroids = rng.normal(size=(32, 8)).astype(np.float32)
    books = rng.normal(size=(2, 16, 8)).astype(np.float32)
    index = IvfIndex.build(centroids, books)
    assert not index.enable_split_lut(max_bytes=100)
    assert index._cterm is None


def test_pairwise_native_decode_matches_jax(tmp_path):
    """The native OpenMP gather-accumulate (qpw_decode) matches the
    jitted scan decode on the same tables."""
    import jax

    from qinco_tpu.search.pairwise_decoder import (
        PairwiseDecoder,
        pairwise_decode,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    K_base, M_base, ivf_m, n_pair, D = 8, 4, 2, 3, 16
    M_target = n_pair
    books = rng.normal(size=(M_target, K_base**2, D)).astype(np.float32)
    srcs = M_base + ivf_m
    pairs = np.stack(
        [rng.integers(0, srcs, size=M_target),
         rng.integers(0, srcs, size=M_target)]
    ).astype(np.int64)
    ivf_code_map = rng.integers(0, K_base, size=(32, ivf_m)).astype(np.int64)
    dec = PairwiseDecoder(
        books=books, pairs=pairs,
        ivf_small_books=np.zeros((ivf_m, K_base, D), np.float32),
        ivf_code_map=ivf_code_map, K_base=K_base, M_base=M_base,
    )
    B = 257
    codes = rng.integers(0, K_base, size=(M_base, B))
    ivf_codes = rng.integers(0, 32, size=B)
    ref = np.asarray(
        pairwise_decode(
            jnp.asarray(books), jnp.asarray(pairs), jnp.asarray(ivf_code_map),
            jnp.asarray(codes, jnp.int32), jnp.asarray(ivf_codes, jnp.int32),
            K_base,
        )
    )
    out = dec.decode_native(codes, ivf_codes)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_pairwise_scores_matches_decode_path():
    """Fused mid-rerank scores == decode + centroid add + sqdist."""
    from qinco_tpu.search.pairwise_decoder import PairwiseDecoder

    rng = np.random.default_rng(6)
    K_base, M_base, ivf_m, n_pair, D, nlist = 8, 4, 2, 5, 16, 32
    M_target = n_pair
    books = rng.normal(size=(M_target, K_base**2, D)).astype(np.float32)
    srcs = M_base + ivf_m
    pairs = np.stack(
        [rng.integers(0, srcs, size=M_target),
         rng.integers(0, srcs, size=M_target)]
    ).astype(np.int64)
    code_map = rng.integers(0, K_base, size=(nlist, ivf_m)).astype(np.int64)
    cents = rng.normal(size=(nlist, D)).astype(np.float32)
    dec = PairwiseDecoder(
        books=books, pairs=pairs,
        ivf_small_books=np.zeros((ivf_m, K_base, D), np.float32),
        ivf_code_map=code_map, K_base=K_base, M_base=M_base,
    )
    nq, nmid = 7, 33
    B = nq * nmid
    codes = np.concatenate(
        [rng.integers(0, nlist, size=(B, 1)),
         rng.integers(0, K_base, size=(B, M_base))], axis=1
    ).astype(np.int32)
    xq = rng.normal(size=(nq, D)).astype(np.float32)

    got = dec.scores(xq, codes, cents, nmid)
    recon = dec.decode_native(codes[:, 1:].T, codes[:, 0]) + cents[codes[:, 0]]
    want = (
        ((np.repeat(xq, nmid, axis=0) - recon) ** 2).sum(-1).reshape(nq, nmid)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_adaptive_explorer_seed_order_and_active_features():
    """Seed strata are visited cheapest-first (nshort ascending) so the
    early picks double as frontier candidates, and axes that don't vary
    in the grid contribute no fit features (they'd inflate the
    overdetermined-fit gate without adding information)."""
    from qinco_tpu.search.optim_order import AdaptiveExplorer

    op = OperatingPoints()
    op.add_range("nprobe", [2, 8, 32])
    op.add_range("nshort", [4, 16, 64])
    op.add_range("nmid_short", [1])  # constant axis
    ex = AdaptiveExplorer(op, op.all_keys())

    ns_order = [op.get_parameters(k)["nshort"]
                for k in ex.remaining[: ex.seed_n]]
    assert ns_order == sorted(ns_order) and ns_order[0] == 4, ns_order
    # features: intercept + log2(nprobe) + log2(nshort) + 1/nprobe +
    # 1/nshort; the constant nmid_short axis is dropped
    assert len(ex._feat({})) == 5, ex._feat({})


def test_adaptive_explorer_finds_frontier_early():
    """On a synthetic response surface where recall depends ONLY on
    nprobe and time grows with nshort (the regime that defeats any
    static prior built from a shortlist-limited workload), the adaptive
    explorer must measure the true frontier — the nprobe ladder at
    minimal nshort — within its seed pass + a few adaptive picks."""
    from qinco_tpu.search.optim_order import AdaptiveExplorer

    op = OperatingPoints()
    op.add_range("nprobe", [2, 4, 8, 16, 32, 64])
    op.add_range("nshort", [10, 30, 100])
    op.add_range("nmid_short", [1, 2, 3])

    def oracle(p):
        recall = 1.0 - 0.5 / p["nprobe"]  # only nprobe matters
        t = 0.2 * p["nprobe"] + 0.05 * p["nshort"] + 0.01 * p["nmid_short"]
        return recall, t

    ex = AdaptiveExplorer(op, op.all_keys())
    explored = []
    while True:
        k = ex.next()
        if k is None:
            break
        p = op.get_parameters(k)
        r, t = oracle(p)
        ex.update(p, r, t)
        explored.append((p, r, t))

    assert len(explored) == 54
    # true frontier: (nprobe, nshort=10, nmid=1) for every nprobe
    frontier = {(np_, 10, 1) for np_ in (2, 4, 8, 16, 32, 64)}
    early = {
        (p["nprobe"], p["nshort"], p["nmid_short"])
        for p, _, _ in explored[: ex.seed_n + 2 * len(frontier)]
    }
    hit = len(frontier & early) / len(frontier)
    assert hit >= 0.8, (hit, ex.seed_n, sorted(early))
