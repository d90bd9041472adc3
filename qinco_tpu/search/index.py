"""ctypes binding for the native IVF index (native/ivf_index.cpp).

The division of labor is TPU-first (SURVEY.md §7): the C++ side owns the
memory-bound inverted-list scan and storage; the *coarse quantizer*
(top-nprobe over the 2^20-centroid codebook) and the per-(query, list)
LUT construction are batched matmuls that run on the TPU (see
:func:`coarse_probe` / :func:`build_luts`).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libqinco_ivf.so"


def _ensure_lib() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    c = ctypes
    lib.qivf_new.restype = c.c_void_p
    lib.qivf_new.argtypes = [c.c_int, c.c_int, c.c_int, c.c_int]
    lib.qivf_free.argtypes = [c.c_void_p]
    for fn in ("qivf_nlist", "qivf_code_m", "qivf_code_k", "qivf_dim",
               "qivf_code_bytes"):
        getattr(lib, fn).restype = c.c_int
        getattr(lib, fn).argtypes = [c.c_void_p]
    lib.qivf_ntotal.restype = c.c_int64
    lib.qivf_ntotal.argtypes = [c.c_void_p]
    lib.qivf_list_size.restype = c.c_int64
    lib.qivf_list_size.argtypes = [c.c_void_p, c.c_int]
    lib.qivf_set_norm_quant.argtypes = [c.c_void_p, c.c_float, c.c_float]
    lib.qivf_train_norm.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    lib.qivf_add_entries.argtypes = [
        c.c_void_p, c.c_int, c.c_int64,
        c.POINTER(c.c_int64), c.POINTER(c.c_uint8), c.POINTER(c.c_float),
    ]
    lib.qivf_search.argtypes = [
        c.c_void_p, c.c_int64,
        c.POINTER(c.c_int), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.c_int, c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int), c.POINTER(c.c_float),
        c.c_int,
    ]
    lib.qivf_search_split.argtypes = [
        c.c_void_p, c.c_int64,
        c.POINTER(c.c_int), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.POINTER(c.c_float),
        c.c_int, c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int), c.POINTER(c.c_float),
        c.c_int,
    ]
    lib.qivf_search_qlut.argtypes = [
        c.c_void_p, c.c_int64,
        c.POINTER(c.c_int), c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.c_int, c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int), c.POINTER(c.c_float),
        c.c_int,
    ]
    lib.qpw_decode.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.c_int), c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_int), c.c_int, c.c_int64, c.c_int, c.c_int,
        c.POINTER(c.c_float), c.c_int,
    ]
    lib.qpw_score.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_int), c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_float), c.POINTER(c.c_float),
        c.c_int64, c.c_int64,
        c.POINTER(c.c_float), c.c_int,
    ]
    lib.qivf_save.restype = c.c_int
    lib.qivf_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.qivf_load.restype = c.c_void_p
    lib.qivf_load.argtypes = [c.c_char_p]
    # HNSW coarse quantizer (native/hnsw.cpp)
    lib.qhnsw_build.restype = c.c_void_p
    lib.qhnsw_build.argtypes = [
        c.POINTER(c.c_float), c.c_int, c.c_int, c.c_int, c.c_int, c.c_uint64,
    ]
    lib.qhnsw_free.argtypes = [c.c_void_p]
    lib.qhnsw_search.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int64, c.c_int, c.c_int,
        c.POINTER(c.c_int), c.POINTER(c.c_float), c.c_int,
    ]
    lib.qhnsw_save.restype = c.c_int
    lib.qhnsw_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.qhnsw_load.restype = c.c_void_p
    lib.qhnsw_load.argtypes = [c.c_char_p]
    return lib


@functools.lru_cache(maxsize=1)
def get_lib() -> ctypes.CDLL:
    return _ensure_lib()


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class HnswQuantizer:
    """Native HNSW coarse quantizer over the IVF centroids
    (parity surface for faiss's HNSW32; reference sets
    efConstruction=20, search_tasks.py:199-205)."""

    def __init__(self, handle):
        self._lib = get_lib()
        self._h = ctypes.c_void_p(handle)

    @classmethod
    def build(cls, centroids: np.ndarray, *, M: int = 32,
              ef_construction: int = 20, seed: int = 0) -> "HnswQuantizer":
        lib = get_lib()
        cent = np.ascontiguousarray(centroids, np.float32)
        n, d = cent.shape
        h = lib.qhnsw_build(
            _ptr(cent, ctypes.c_float), n, d, M, ef_construction, seed
        )
        return cls(h)

    def __del__(self):
        try:
            self._lib.qhnsw_free(self._h)
        except Exception:
            pass

    def search(self, xq: np.ndarray, k: int, *, ef: int = 16,
               nthreads: int = 0):
        """-> (indices (nq, k) int32, sq distances (nq, k))."""
        xq = np.ascontiguousarray(xq, np.float32)
        nq = len(xq)
        out_idx = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        self._lib.qhnsw_search(
            self._h, _ptr(xq, ctypes.c_float), nq, k, ef,
            _ptr(out_idx, ctypes.c_int), _ptr(out_d, ctypes.c_float), nthreads,
        )
        return out_idx, out_d

    def save(self, path: str) -> None:
        rc = self._lib.qhnsw_save(self._h, str(path).encode())
        assert rc == 0, f"failed to save HNSW to {path}"

    @classmethod
    def load(cls, path: str) -> "HnswQuantizer":
        lib = get_lib()
        h = lib.qhnsw_load(str(path).encode())
        assert h, f"failed to load HNSW from {path}"
        return cls(h)


class IvfIndex:
    """Native packed-inverted-list index with AQ codebooks.

    Python-side state: the IVF centroids (for coarse probing on TPU) and
    the AQ codebooks (for LUT construction); native-side: the lists.
    The coarse quantizer is the exact TPU top-nprobe scan by default;
    ``use_hnsw()`` switches to the native HNSW graph (efSearch knob).
    """

    def __init__(self, handle, ivf_centroids: np.ndarray, codebooks: np.ndarray,
                 norm_mode: str = "resid"):
        self._lib = get_lib()
        self._h = ctypes.c_void_p(handle)
        self.ivf_centroids = np.ascontiguousarray(ivf_centroids, np.float32)
        self.codebooks = np.ascontiguousarray(codebooks, np.float32)  # (M,K,D)
        # norm_mode: which squared norm the int8 quantizer stores.
        #  "resid": ||r||² of the AQ reconstruction; scan uses per-(q,p)
        #           LUTs -2(q-c).C (or their split decomposition).
        #  "full":  full-reconstruction distances via the query-only LUT
        #           -2q.C — the only tractable layout for paired K²
        #           codes, where per-centroid tables would be
        #           nlist*M*K²*4 bytes.  The quantizer stores the
        #           *relative* norm ||y||² - ||c_list||² = ||r||² + 2c.r:
        #           quantizing the absolute ||c+r||² would spread the
        #           int8 range over the centroid-norm variation across
        #           all lists and coarsen every scanned distance
        #           (round-3 advisor finding).  ||c||² is exact and
        #           known per list, so the scan folds it into the bias,
        #           which becomes exactly ||q - c||².
        assert norm_mode in ("resid", "full"), norm_mode
        self.norm_mode = norm_mode
        # Pre-2026-08-19 saved indexes quantized the absolute ||c+r||²;
        # load() flips this so they keep scanning correctly.
        self._legacy_abs_norms = False
        self.hnsw: HnswQuantizer | None = None
        self.ef_search = 16
        # Split-LUT scan state (enable_split_lut): cterm (nlist, M, K) f32
        # and the flattened (M*K, D) codebook used for qterm matmuls.
        self._cterm: np.ndarray | None = None
        self._cb2d: np.ndarray | None = None
        self._cent_norms: np.ndarray | None = None  # full-mode bias term

    def use_hnsw(self, *, M: int = 32, ef_construction: int = 20,
                 ef_search: int = 16, seed: int = 0) -> None:
        """Build (or rebuild) the native HNSW coarse quantizer."""
        self.hnsw = HnswQuantizer.build(
            self.ivf_centroids, M=M, ef_construction=ef_construction, seed=seed
        )
        self.ef_search = ef_search

    # -- construction -------------------------------------------------------
    @classmethod
    def build(cls, ivf_centroids: np.ndarray, codebooks: np.ndarray,
              norm_mode: str = "resid") -> "IvfIndex":
        lib = get_lib()
        nlist, D = ivf_centroids.shape
        M, K, D2 = codebooks.shape
        assert D2 == D and K <= 65536, f"codebooks {codebooks.shape} vs D={D}"
        h = lib.qivf_new(nlist, M, K, D)
        assert h, f"qivf_new rejected K={K}"
        return cls(h, ivf_centroids, codebooks, norm_mode=norm_mode)

    def __del__(self):
        try:
            self._lib.qivf_free(self._h)
        except Exception:
            pass

    @property
    def nlist(self) -> int:
        return self._lib.qivf_nlist(self._h)

    @property
    def M(self) -> int:
        return self._lib.qivf_code_m(self._h)

    @property
    def K(self) -> int:
        return self._lib.qivf_code_k(self._h)

    @property
    def ntotal(self) -> int:
        return self._lib.qivf_ntotal(self._h)

    def list_size(self, list_no: int) -> int:
        return self._lib.qivf_list_size(self._h, list_no)

    @property
    def cent_norms(self) -> np.ndarray:
        """Exact ||c||² per list (f64 accumulation), cached."""
        if self._cent_norms is None:
            self._cent_norms = (
                self.ivf_centroids.astype(np.float64) ** 2
            ).sum(-1).astype(np.float32)
        return self._cent_norms

    def train_norm(self, norms: np.ndarray, list_nos=None) -> None:
        """Train the int8 norm quantizer.  ``norms`` are ||r||² for
        norm_mode='resid' and the full ||c+r||² for 'full' — in the
        latter case ``list_nos`` is required so the exact per-list
        ||c||² can be subtracted before fitting the quantizer range."""
        norms = np.ascontiguousarray(norms, np.float32)
        if self.norm_mode == "full" and not self._legacy_abs_norms:
            assert list_nos is not None, (
                "norm_mode='full' needs list_nos to train the relative-"
                "norm quantizer")
            norms = norms - self.cent_norms[np.asarray(list_nos)]
            norms = np.ascontiguousarray(norms, np.float32)
        self._lib.qivf_train_norm(self._h, _ptr(norms, ctypes.c_float), len(norms))

    @property
    def code_bytes(self) -> int:
        return self._lib.qivf_code_bytes(self._h)

    def add_entries(self, list_no: int, ids, codes, norms) -> None:
        """codes: (n, M) ints < K; norms: (n,) sq-norms — ||r||² for
        norm_mode='resid', full ||c+r||² for 'full' (the per-list ||c||²
        is subtracted here before quantization; see __init__)."""
        ids = np.ascontiguousarray(ids, np.int64)
        dtype = np.uint8 if self.code_bytes == 1 else np.uint16
        codes = np.ascontiguousarray(codes, dtype)
        norms = np.asarray(norms, np.float32)
        if self.norm_mode == "full" and not self._legacy_abs_norms:
            norms = norms - self.cent_norms[list_no]
        norms = np.ascontiguousarray(norms, np.float32)
        n = len(ids)
        assert codes.shape == (n, self.M)
        self._lib.qivf_add_entries(
            self._h, list_no, n,
            _ptr(ids, ctypes.c_int64),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _ptr(norms, ctypes.c_float),
        )

    def add_batch(self, ids, list_nos, codes, norms) -> None:
        """Group a batch by list and append (reference: add_to_ivfaq_index,
        search_utils.py:121-163 — argsort by list + per-list add)."""
        list_nos = np.asarray(list_nos)
        order = np.argsort(list_nos, kind="stable")
        sorted_lists = list_nos[order]
        bounds = np.flatnonzero(np.diff(sorted_lists)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(order)]])
        ids = np.asarray(ids)
        codes = np.asarray(codes)
        norms = np.asarray(norms)
        for s, e in zip(starts, ends):
            sel = order[s:e]
            self.add_entries(int(sorted_lists[s]), ids[sel], codes[sel], norms[sel])

    # -- search -------------------------------------------------------------
    def enable_split_lut(self, max_bytes: int = 4 << 30) -> bool:
        """Precompute the per-centroid LUT half (faiss IVFPQ's
        "precomputed tables" idea applied to the AQ LUT):

            LUT[q,p,m,k] = -2 (q - c_p).C_m[k]
                         = (-2 q.C_m[k]) + (+2 c_p.C_m[k])
                         = qterm[q]      + cterm[list(p)]

        so the scan never materializes the (nq, nprobe, M, K) tensor —
        2 GB at nq=4096, nprobe=64 — and the per-batch LUT work drops
        from nq·nprobe·M·K·D FLOPs to nq·M·K·D (nprobe-independent).
        cterm is (nlist, M, K) f32, computed once per index; returns
        False (and leaves the classic path active) when that exceeds
        ``max_bytes`` (2^20 lists x 8 x 256 = 8 GB).  Exact up to f32
        addition order.
        """
        nlist = self.nlist
        M, K, D = self.codebooks.shape
        if self.norm_mode == "full":
            # full-norm indexes already scan with the cheaper query-only
            # LUT; there is no centroid term to precompute
            return False
        if nlist * M * K * 4 > max_bytes:
            return False
        self._cb2d = np.ascontiguousarray(
            self.codebooks.reshape(M * K, D), np.float32
        )
        # (nlist, D) @ (D, M*K): one BLAS call, ~nlist·M·K·D FLOPs.
        self._cterm = np.ascontiguousarray(
            2.0 * (self.ivf_centroids @ self._cb2d.T), np.float32
        )
        return True

    def scan_split(
        self,
        probe_lists: np.ndarray,  # (nq, nprobe) int32
        qterm: np.ndarray,  # (nq, M, K) f32 = -2 q.C
        bias: np.ndarray,  # (nq, nprobe) f32
        nshort: int,
        nthreads: int = 0,
    ):
        assert self._cterm is not None, "call enable_split_lut() first"
        nq, nprobe = probe_lists.shape
        probe_lists = np.ascontiguousarray(probe_lists, np.int32)
        qterm = np.ascontiguousarray(qterm, np.float32)
        bias = np.ascontiguousarray(bias, np.float32)
        out_ids = np.empty((nq, nshort), np.int64)
        out_codes = np.empty((nq, nshort, self.M + 1), np.int32)
        out_dists = np.empty((nq, nshort), np.float32)
        self._lib.qivf_search_split(
            self._h, nq,
            _ptr(probe_lists, ctypes.c_int), _ptr(qterm, ctypes.c_float),
            _ptr(self._cterm, ctypes.c_float),
            _ptr(bias, ctypes.c_float), nprobe, nshort,
            _ptr(out_ids, ctypes.c_int64), _ptr(out_codes, ctypes.c_int),
            _ptr(out_dists, ctypes.c_float), nthreads,
        )
        return out_ids, out_codes, out_dists

    def scan_qlut(
        self,
        probe_lists: np.ndarray,  # (nq, nprobe) int32
        qlut: np.ndarray,  # (nq, M, K) f32 = -2 q.C
        bias: np.ndarray,  # (nq, nprobe) f32 = ||q - c_p||²
        nshort: int,
        nthreads: int = 0,
    ):
        """Query-only-LUT scan for norm_mode='full' indexes (paired K²
        codes).  The stored norm is the relative ||y||² - ||c||² so the
        bias carries the exact ||q - c||² (legacy absolute-norm indexes
        pass ||q||² - 2q.c instead).  Distances are exact ||q - y||² up
        to the int8 norm quantization, like the other scans."""
        assert self.norm_mode == "full", "qlut scan needs full-recon norms"
        nq, nprobe = probe_lists.shape
        probe_lists = np.ascontiguousarray(probe_lists, np.int32)
        qlut = np.ascontiguousarray(qlut, np.float32)
        bias = np.ascontiguousarray(bias, np.float32)
        out_ids = np.empty((nq, nshort), np.int64)
        out_codes = np.empty((nq, nshort, self.M + 1), np.int32)
        out_dists = np.empty((nq, nshort), np.float32)
        self._lib.qivf_search_qlut(
            self._h, nq,
            _ptr(probe_lists, ctypes.c_int), _ptr(qlut, ctypes.c_float),
            _ptr(bias, ctypes.c_float), nprobe, nshort,
            _ptr(out_ids, ctypes.c_int64), _ptr(out_codes, ctypes.c_int),
            _ptr(out_dists, ctypes.c_float), nthreads,
        )
        return out_ids, out_codes, out_dists

    def scan(
        self,
        probe_lists: np.ndarray,  # (nq, nprobe) int32
        luts: np.ndarray,  # (nq, nprobe, M, K) f32
        bias: np.ndarray,  # (nq, nprobe) f32
        nshort: int,
        nthreads: int = 0,
    ):
        nq, nprobe = probe_lists.shape
        probe_lists = np.ascontiguousarray(probe_lists, np.int32)
        luts = np.ascontiguousarray(luts, np.float32)
        bias = np.ascontiguousarray(bias, np.float32)
        out_ids = np.empty((nq, nshort), np.int64)
        out_codes = np.empty((nq, nshort, self.M + 1), np.int32)
        out_dists = np.empty((nq, nshort), np.float32)
        self._lib.qivf_search(
            self._h, nq,
            _ptr(probe_lists, ctypes.c_int), _ptr(luts, ctypes.c_float),
            _ptr(bias, ctypes.c_float), nprobe, nshort,
            _ptr(out_ids, ctypes.c_int64), _ptr(out_codes, ctypes.c_int),
            _ptr(out_dists, ctypes.c_float), nthreads,
        )
        return out_ids, out_codes, out_dists

    def search_and_return_codes(
        self, xq: np.ndarray, nshort: int, *, nprobe: int, nthreads: int = 0,
        coarse_batch: int = 8192,
    ):
        """Full search: TPU coarse probe + LUTs, native scan
        (reference contract: search_tasks.py:419-424).

        With split LUTs enabled (enable_split_lut) the per-chunk LUT is
        a single (nq, M·K) matmul on the host and only qterm — 33 MB at
        nq=4096 vs 2 GB for the classic (nq, nprobe, M, K) tensor at
        nprobe=64 — is handed to the native scan."""
        xq = np.asarray(xq, np.float32)
        out = []
        for i in range(0, len(xq), coarse_batch):
            chunk = xq[i : i + coarse_batch]
            if self.hnsw is not None:
                probes, bias = self.hnsw.search(
                    chunk, nprobe, ef=max(self.ef_search, nprobe),
                    nthreads=nthreads,
                )
            else:
                probes, bias = coarse_probe(chunk, self.ivf_centroids, nprobe)
            if self.norm_mode == "full":
                M, K, D = self.codebooks.shape
                if self._cb2d is None:
                    self._cb2d = np.ascontiguousarray(
                        self.codebooks.reshape(M * K, D), np.float32)
                if self._legacy_abs_norms:
                    # legacy absolute ||y||² norms: bias = ||q||² - 2 q.c
                    bias_f = bias - self.cent_norms[probes]
                else:
                    # relative norms ||y||² - ||c||²: bias = ||q - c||²,
                    # exactly what coarse_probe / HNSW already return
                    bias_f = bias
                # qlut is (nq_sub, M, K) f32 — 2 MB/query at M=8, K=2^16;
                # sub-batch so the buffer stays under ~256 MB
                qb = max(64, (256 << 20) // (M * K * 4))
                subs = []
                for j in range(0, len(chunk), qb):
                    qlut = (-2.0 * (chunk[j:j + qb] @ self._cb2d.T)).reshape(
                        -1, M, K)
                    subs.append(self.scan_qlut(
                        probes[j:j + qb], qlut, bias_f[j:j + qb], nshort,
                        nthreads))
                out.append(tuple(
                    np.concatenate([s[t] for s in subs]) for t in range(3)))
            elif self._cterm is not None:
                M, K, _ = self.codebooks.shape
                qterm = (-2.0 * (chunk @ self._cb2d.T)).reshape(-1, M, K)
                out.append(
                    self.scan_split(probes, qterm, bias, nshort, nthreads)
                )
            else:
                luts = build_luts(
                    chunk, self.ivf_centroids, self.codebooks, probes
                )
                out.append(self.scan(probes, luts, bias, nshort, nthreads))
        ids = np.concatenate([o[0] for o in out])
        codes = np.concatenate([o[1] for o in out])
        dists = np.concatenate([o[2] for o in out])
        return dists, ids, codes

    # -- serialization ------------------------------------------------------
    def save(self, path: str) -> None:
        rc = self._lib.qivf_save(self._h, str(path).encode())
        assert rc == 0, f"failed to save index to {path}"
        np.savez_compressed(
            str(path) + ".meta.npz",
            ivf_centroids=self.ivf_centroids,
            codebooks=self.codebooks,
            norm_mode=np.asarray(self.norm_mode),
            # full-mode norms are stored relative (||y||² - ||c||²)
            # unless this index was itself loaded from a legacy file
            norm_rel=np.asarray(not self._legacy_abs_norms),
        )

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        lib = get_lib()
        h = lib.qivf_load(str(path).encode())
        assert h, f"failed to load index from {path}"
        meta = np.load(str(path) + ".meta.npz")
        norm_mode = (str(meta["norm_mode"]) if "norm_mode" in meta.files
                     else "resid")
        idx = cls(h, meta["ivf_centroids"], meta["codebooks"],
                  norm_mode=norm_mode)
        if norm_mode == "full" and not (
                "norm_rel" in meta.files and bool(meta["norm_rel"])):
            idx._legacy_abs_norms = True  # pre-2026-08-19 file
        return idx


# ---------------------------------------------------------------------------
# TPU-side coarse probing + LUT construction
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nprobe", "chunk"))
def _coarse_probe_jit(xq, centroids, nprobe: int, chunk: int = 65536):
    """Top-nprobe nearest centroids, K-chunked.

    Padding rows are zeros with their distances overwritten by a large
    *finite* sentinel — +inf rows would produce 0·inf = NaN in the matmul
    distance form, and lax.top_k ranks NaN above everything (silent
    recall collapse when nlist % chunk != 0).
    """
    from ..ops.distances import pairwise_sqdist, pairwise_sqdist_partial

    K = centroids.shape[0]
    chunk = min(chunk, K)
    n_chunks = -(-K // chunk)
    pad = n_chunks * chunk - K
    cent = jnp.pad(centroids, ((0, pad), (0, 0)))
    books = cent.reshape(n_chunks, chunk, -1)

    def body(carry, xs):
        best_d, best_i = carry
        i_chunk, book = xs
        nq_ = xq.shape[0]
        # Selection tolerates bf16-rounded inputs (DEFAULT) — flips happen
        # only at probe-boundary ties; the bias term is recomputed exactly
        # for the selected centroids below.
        d = pairwise_sqdist_partial(
            xq, book, precision=jax.lax.Precision.DEFAULT
        )
        chunk_ids = (
            jnp.arange(chunk, dtype=jnp.int32)[None, :] + i_chunk * chunk
        )
        d = jnp.where(chunk_ids < K, d, 3.4e37)  # mask padded columns
        cand_d = jnp.concatenate([best_d, d], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(chunk_ids, (nq_, chunk))], axis=1
        )
        neg, sel = jax.lax.top_k(-cand_d, nprobe)
        return (-neg, jnp.take_along_axis(cand_i, sel, axis=1)), None

    nq = xq.shape[0]
    init = (
        jnp.full((nq, nprobe), 3.4e38, jnp.float32),
        jnp.zeros((nq, nprobe), jnp.int32),
    )
    (_, idx), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32), books)
    )
    # Exact ‖q−c‖² bias for the selected centroids only (nprobe·D work):
    # the bias enters the scan's distance estimate additively, and its
    # bf16 input-rounding error scales with |q·c| — dominant on
    # non-centered datasets — so it is kept at HIGHEST precision.
    sel_cent = cent[idx]  # (nq, nprobe, D)
    diff = xq[:, None, :] - sel_cent
    dists = jnp.sum(diff * diff, axis=-1)
    return idx, dists


def coarse_probe(xq: np.ndarray, centroids: np.ndarray, nprobe: int):
    """-> (probe_lists (nq, nprobe) int32, bias ||q-c||^2 (nq, nprobe))."""
    idx, dists = _coarse_probe_jit(
        jnp.asarray(xq, jnp.float32), jnp.asarray(centroids, jnp.float32), nprobe
    )
    return np.asarray(idx), np.asarray(dists)


@jax.jit
def _build_luts_jit(xq, centroids, codebooks, probes):
    """LUT[m][k] = -2 (q - c_probe) . C_m[k] -> (nq, nprobe, M, 256)."""
    c = centroids[probes]  # (nq, nprobe, D)
    resid = xq[:, None, :] - c  # (nq, nprobe, D)
    # (nq, nprobe, D) x (M, 256, D) -> (nq, nprobe, M, 256)
    return -2.0 * jnp.einsum(
        "qpd,mkd->qpmk", resid, codebooks, preferred_element_type=jnp.float32
    )


def build_luts(xq, centroids, codebooks, probes):
    return np.asarray(
        _build_luts_jit(
            jnp.asarray(xq, jnp.float32),
            jnp.asarray(centroids, jnp.float32),
            jnp.asarray(codebooks, jnp.float32),
            jnp.asarray(probes),
        )
    )
