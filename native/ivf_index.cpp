// qinco-tpu native IVF index: packed inverted lists + AQ-LUT shortlist scan.
//
// Replaces the faiss C++ machinery the reference delegates to
// (reference: qinco/search/search_utils.py:121-163 pack_codes/invlists,
// search_tasks.py:419-424 search_and_return_codes): per-list packed
// uint8 code storage with int8-quantized reconstruction norms, and an
// OpenMP-parallel scan computing
//
//   d(q, y) = ||q - c_list||^2 + sum_m LUT[m][code_m] + ||r||^2
//
// where LUT[m][k] = -2 (q - c_list) . C_m[k] is computed by the caller
// (on TPU, batched over queries x probed lists) and ||r||^2 is the
// stored quantized norm.  The coarse quantizer is NOT here: top-nprobe
// list selection is a batched matmul that belongs on the TPU.
//
// Build: make -C native  (produces libqinco_ivf.so; ctypes binding in
// qinco_tpu/search/index.py)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct InvList {
  std::vector<int64_t> ids;
  std::vector<uint8_t> codes;  // n * M * code_bytes bytes
  std::vector<uint8_t> norms;  // n bytes (quantized ||r||^2)
};

struct IvfIndex {
  int nlist = 0;
  int M = 0;     // codes per entry
  int K = 256;   // codewords per step (LUT stride); K > 256 -> 2-byte codes
  int D = 0;     // vector dim (metadata only)
  int code_bytes = 1;  // 1 (K <= 256) or 2 (K <= 65536, paired codes)
  float norm_min = 0.f;
  float norm_scale = 1.f;  // norm = norm_min + q * norm_scale
  std::vector<InvList> lists;
  int64_t ntotal = 0;
};

// Per-entry code read: codes are stored little-endian host order, so the
// 2-byte case is a plain uint16 view.  The code_bytes branch is
// loop-invariant per list and fully predicted.
inline int code_at(const uint8_t* row, int m, int code_bytes) {
  return code_bytes == 1
             ? (int)row[m]
             : (int)reinterpret_cast<const uint16_t*>(row)[m];
}

inline float decode_norm(const IvfIndex* idx, uint8_t q) {
  return idx->norm_min + q * idx->norm_scale;
}

struct HeapEntry {
  float dist;
  int64_t id;
  int list_no;
  const uint8_t* code;
};

struct HeapCmp {
  bool operator()(const HeapEntry& a, const HeapEntry& b) const {
    return a.dist < b.dist;  // max-heap on dist: top() = worst kept
  }
};

}  // namespace

extern "C" {

IvfIndex* qivf_new(int nlist, int M, int K, int D) {
  if (K > 65536) return nullptr;
  auto* idx = new IvfIndex();
  idx->nlist = nlist;
  idx->M = M;
  idx->K = K;
  idx->D = D;
  idx->code_bytes = (K > 256) ? 2 : 1;
  idx->lists.resize(nlist);
  return idx;
}

void qivf_free(IvfIndex* idx) { delete idx; }

int qivf_nlist(const IvfIndex* idx) { return idx->nlist; }
int qivf_code_m(const IvfIndex* idx) { return idx->M; }
int qivf_code_k(const IvfIndex* idx) { return idx->K; }
int qivf_dim(const IvfIndex* idx) { return idx->D; }
int qivf_code_bytes(const IvfIndex* idx) { return idx->code_bytes; }
int64_t qivf_ntotal(const IvfIndex* idx) { return idx->ntotal; }
int64_t qivf_list_size(const IvfIndex* idx, int list_no) {
  return (int64_t)idx->lists[list_no].ids.size();
}

void qivf_set_norm_quant(IvfIndex* idx, float norm_min, float norm_scale) {
  idx->norm_min = norm_min;
  idx->norm_scale = norm_scale;
}

// Train the int8 norm quantizer from a sample of norms (min/max range).
void qivf_train_norm(IvfIndex* idx, const float* norms, int64_t n) {
  float lo = norms[0], hi = norms[0];
  for (int64_t i = 1; i < n; i++) {
    lo = std::min(lo, norms[i]);
    hi = std::max(hi, norms[i]);
  }
  idx->norm_min = lo;
  idx->norm_scale = (hi > lo) ? (hi - lo) / 255.f : 1.f;
}

// Add n entries to one inverted list.  codes: (n, M) raw bytes at the
// index's code width (uint8 when K <= 256, uint16 otherwise); norms: (n,) f32.
void qivf_add_entries(IvfIndex* idx, int list_no, int64_t n,
                      const int64_t* ids, const uint8_t* codes,
                      const float* norms) {
  InvList& lst = idx->lists[list_no];
  size_t old = lst.ids.size();
  lst.ids.insert(lst.ids.end(), ids, ids + n);
  lst.codes.insert(lst.codes.end(), codes,
                   codes + n * idx->M * idx->code_bytes);
  lst.norms.resize(old + n);
  for (int64_t i = 0; i < n; i++) {
    float q = (norms[i] - idx->norm_min) / idx->norm_scale;
    q = std::max(0.f, std::min(255.f, q));
    lst.norms[old + i] = (uint8_t)(q + 0.5f);
  }
  idx->ntotal += n;
}

// Scan probed lists for nq queries; keep the nshort best per query.
//   probe_lists: (nq, nprobe) int32 (-1 = skip)
//   luts:        (nq, nprobe, M, K) f32
//   bias:        (nq, nprobe) f32  = ||q - c_list||^2
//   out_ids:     (nq, nshort) int64 (-1 padded)
//   out_codes:   (nq, nshort, M+1) int32 [ivf_code, code_0..code_{M-1}]
//   out_dists:   (nq, nshort) f32 (+inf padded)
void qivf_search(const IvfIndex* idx, int64_t nq, const int* probe_lists,
                 const float* luts, const float* bias, int nprobe, int nshort,
                 int64_t* out_ids, int* out_codes, float* out_dists,
                 int nthreads) {
  const int M = idx->M;
  const int K = idx->K;
  const int CB = idx->code_bytes;
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(dynamic, 1)
#endif
  for (int64_t q = 0; q < nq; q++) {
    std::priority_queue<HeapEntry, std::vector<HeapEntry>, HeapCmp> heap;
    for (int p = 0; p < nprobe; p++) {
      int list_no = probe_lists[q * nprobe + p];
      if (list_no < 0 || list_no >= idx->nlist) continue;
      const InvList& lst = idx->lists[list_no];
      const float* lut = luts + ((q * nprobe + p) * (int64_t)M) * K;
      const float b = bias[q * nprobe + p];
      const size_t n = lst.ids.size();
      const uint8_t* codes = lst.codes.data();
      for (size_t i = 0; i < n; i++) {
        const uint8_t* c = codes + i * M * CB;
        float d = b + decode_norm(idx, lst.norms[i]);
        for (int m = 0; m < M; m++) d += lut[m * K + code_at(c, m, CB)];
        if ((int)heap.size() < nshort) {
          heap.push({d, lst.ids[i], list_no, c});
        } else if (d < heap.top().dist) {
          heap.pop();
          heap.push({d, lst.ids[i], list_no, c});
        }
      }
    }
    // Drain heap (worst first) into sorted-ascending output.
    int n_found = (int)heap.size();
    for (int r = n_found - 1; r >= 0; r--) {
      const HeapEntry& e = heap.top();
      out_ids[q * nshort + r] = e.id;
      out_dists[q * nshort + r] = e.dist;
      int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
      oc[0] = e.list_no;
      for (int m = 0; m < M; m++) oc[m + 1] = code_at(e.code, m, CB);
      heap.pop();
    }
    for (int r = n_found; r < nshort; r++) {
      out_ids[q * nshort + r] = -1;
      out_dists[q * nshort + r] = HUGE_VALF;
      int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
      for (int m = 0; m <= M; m++) oc[m] = 0;
    }
  }
}

// Split-LUT scan (the faiss IVFPQ "precomputed tables" trick applied to
// the AQ LUT): the caller decomposes
//
//   LUT[q,p,m,k] = -2 (q - c_p) . C_m[k]
//               = qterm[q,m,k] + cterm[list(p),m,k]
//
// with qterm = -2 q . C (per query, nprobe-independent) and
// cterm = +2 c . C (per *centroid*, computed once per index).  The
// (nq, nprobe, M, K) tensor — 2 GB at nq=4096, nprobe=64 — never
// materializes; per (query, list) the two K-row tables are either
// combined into a stack-local LUT (long lists: the entry loop then runs
// exactly like qivf_search) or read directly (short lists, where the
// M*K combine would dominate the scan itself).
void qivf_search_split(const IvfIndex* idx, int64_t nq, const int* probe_lists,
                       const float* qterm, const float* cterm,
                       const float* bias, int nprobe, int nshort,
                       int64_t* out_ids, int* out_codes, float* out_dists,
                       int nthreads) {
  const int M = idx->M;
  const int K = idx->K;
  const int CB = idx->code_bytes;
  const int64_t MK = (int64_t)M * K;
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel
#endif
  {
    std::vector<float> lut_buf(MK);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1)
#endif
    for (int64_t q = 0; q < nq; q++) {
      std::priority_queue<HeapEntry, std::vector<HeapEntry>, HeapCmp> heap;
      const float* qt = qterm + q * MK;
      for (int p = 0; p < nprobe; p++) {
        int list_no = probe_lists[q * nprobe + p];
        if (list_no < 0 || list_no >= idx->nlist) continue;
        const InvList& lst = idx->lists[list_no];
        const size_t n = lst.ids.size();
        if (!n) continue;
        const float* ct = cterm + (int64_t)list_no * MK;
        const float b = bias[q * nprobe + p];
        const uint8_t* codes = lst.codes.data();
        if ((int64_t)n * 2 >= (int64_t)K) {
          // Long list: combine once (vectorizable contiguous add), then
          // scan with single lookups.
          float* lut = lut_buf.data();
          for (int64_t t = 0; t < MK; t++) lut[t] = qt[t] + ct[t];
          for (size_t i = 0; i < n; i++) {
            const uint8_t* c = codes + i * M * CB;
            float d = b + decode_norm(idx, lst.norms[i]);
            for (int m = 0; m < M; m++) d += lut[m * K + code_at(c, m, CB)];
            if ((int)heap.size() < nshort) {
              heap.push({d, lst.ids[i], list_no, c});
            } else if (d < heap.top().dist) {
              heap.pop();
              heap.push({d, lst.ids[i], list_no, c});
            }
          }
        } else {
          // Short list: two lookups per code beat an M*K combine.
          for (size_t i = 0; i < n; i++) {
            const uint8_t* c = codes + i * M * CB;
            float d = b + decode_norm(idx, lst.norms[i]);
            for (int m = 0; m < M; m++) {
              const int o = m * K + code_at(c, m, CB);
              d += qt[o] + ct[o];
            }
            if ((int)heap.size() < nshort) {
              heap.push({d, lst.ids[i], list_no, c});
            } else if (d < heap.top().dist) {
              heap.pop();
              heap.push({d, lst.ids[i], list_no, c});
            }
          }
        }
      }
      int n_found = (int)heap.size();
      for (int r = n_found - 1; r >= 0; r--) {
        const HeapEntry& e = heap.top();
        out_ids[q * nshort + r] = e.id;
        out_dists[q * nshort + r] = e.dist;
        int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
        oc[0] = e.list_no;
        for (int m = 0; m < M; m++) oc[m + 1] = code_at(e.code, m, CB);
        heap.pop();
      }
      for (int r = n_found; r < nshort; r++) {
        out_ids[q * nshort + r] = -1;
        out_dists[q * nshort + r] = HUGE_VALF;
        int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
        for (int m = 0; m <= M; m++) oc[m] = 0;
      }
    }
  }
}

// Query-only-LUT scan for full-reconstruction-norm indexes (the paired
// K² layout, where a per-(query, probe) or per-centroid LUT is
// intractable: cterm alone is nlist * M * K² * 4 bytes).  Exact
// decomposition with y = c_list + sum_m C_m[code_m]:
//
//   ||q - y||^2 = (||q||^2 - 2 q.c_list)  [bias, per (q, p)]
//               + sum_m qlut[m][code_m]   [qlut[m][k] = -2 q.C_m[k]]
//               + ||y||^2                 [stored int8-quantized norm]
//
// qlut is (nq, M, K): nprobe-independent, 2 MB/query at M=8, K=65536.
void qivf_search_qlut(const IvfIndex* idx, int64_t nq, const int* probe_lists,
                      const float* qlut, const float* bias, int nprobe,
                      int nshort, int64_t* out_ids, int* out_codes,
                      float* out_dists, int nthreads) {
  const int M = idx->M;
  const int K = idx->K;
  const int CB = idx->code_bytes;
  const int64_t MK = (int64_t)M * K;
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(dynamic, 1)
#endif
  for (int64_t q = 0; q < nq; q++) {
    std::priority_queue<HeapEntry, std::vector<HeapEntry>, HeapCmp> heap;
    const float* qt = qlut + q * MK;
    for (int p = 0; p < nprobe; p++) {
      int list_no = probe_lists[q * nprobe + p];
      if (list_no < 0 || list_no >= idx->nlist) continue;
      const InvList& lst = idx->lists[list_no];
      const float b = bias[q * nprobe + p];
      const size_t n = lst.ids.size();
      const uint8_t* codes = lst.codes.data();
      for (size_t i = 0; i < n; i++) {
        const uint8_t* c = codes + i * M * CB;
        float d = b + decode_norm(idx, lst.norms[i]);
        for (int m = 0; m < M; m++) d += qt[m * K + code_at(c, m, CB)];
        if ((int)heap.size() < nshort) {
          heap.push({d, lst.ids[i], list_no, c});
        } else if (d < heap.top().dist) {
          heap.pop();
          heap.push({d, lst.ids[i], list_no, c});
        }
      }
    }
    int n_found = (int)heap.size();
    for (int r = n_found - 1; r >= 0; r--) {
      const HeapEntry& e = heap.top();
      out_ids[q * nshort + r] = e.id;
      out_dists[q * nshort + r] = e.dist;
      int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
      oc[0] = e.list_no;
      for (int m = 0; m < M; m++) oc[m + 1] = code_at(e.code, m, CB);
      heap.pop();
    }
    for (int r = n_found; r < nshort; r++) {
      out_ids[q * nshort + r] = -1;
      out_dists[q * nshort + r] = HUGE_VALF;
      int* oc = out_codes + (q * (int64_t)nshort + r) * (M + 1);
      for (int m = 0; m <= M; m++) oc[m] = 0;
    }
  }
}

// Pairwise-decoder table accumulation: out[i] = sum_t books[t][comb[t][i]]
// (reference: pairwise_decoder.py:88-93 — a torch JIT lookup loop).  The
// op is a pure gather-accumulate, memory-bound on the random table-row
// reads; one OpenMP row range per thread, accumulation in registers, no
// (B, D) intermediates per table (the XLA CPU scan materializes one per
// step — ~2x the traffic).
// Processed book-major over row *blocks*: a naive per-row loop touches
// all T tables (T * K2 * D * 4 bytes, hundreds of MB) per row and
// thrashes the cache; iterating books in the outer loop keeps one
// table's hot rows cached while the block accumulator (BLOCK * D f32,
// ~2 MB) stays L2-resident.  The combined code c = src0 * K_base + src1
// is formed inline from the source-code rows (building the (T, B)
// combined-code array in numpy costs more than the whole kernel).
// Source codes are resolved inline (building the (S, B) source matrix
// or the (T, B) combined-code matrix in numpy costs more than the whole
// kernel): source s < M_base reads the model-code row, s >= M_base
// reads column s - M_base of the per-IVF-code small-codes map.
//   codes_MB:     (M_base, B) int32 model codes
//   ivf_codes:    (B,) int32
//   ivf_code_map: (n_map, ivf_m) int32
//   pairs:        (2, T) int32 source indices per target book
void qpw_decode(const float* books, const int* codes_MB, const int* ivf_codes,
                const int* ivf_code_map, int ivf_m, int M_base, int K_base,
                const int* pairs, int T, int64_t B, int K2, int D,
                float* out, int nthreads) {
  constexpr int64_t BLOCK = 4096;
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(dynamic, 1)
#endif
  for (int64_t b0 = 0; b0 < B; b0 += BLOCK) {
    const int64_t n = std::min(BLOCK, B - b0);
    float* o0 = out + b0 * D;
    std::memset(o0, 0, sizeof(float) * n * D);
    for (int t = 0; t < T; t++) {
      const float* book = books + (int64_t)t * K2 * D;
      const int s0 = pairs[t], s1 = pairs[T + t];
      auto src = [&](int s, int64_t i) -> int {
        return s < M_base
                   ? codes_MB[(int64_t)s * B + b0 + i]
                   : ivf_code_map[(int64_t)ivf_codes[b0 + i] * ivf_m +
                                  (s - M_base)];
      };
      for (int64_t i = 0; i < n; i++) {
        const int c = src(s0, i) * K_base + src(s1, i);
        const float* row = book + (int64_t)c * D;
        float* o = o0 + i * D;
        for (int d = 0; d < D; d++) o[d] += row[d];
      }
    }
  }
}

// Fused mid-rerank scoring: for shortlist entry i of query q = i / nmid,
//
//   score[i] = || xq[q] - (cents[ivf_i] + sum_t books[t][pair-code_t]) ||^2
//
// The decoded vectors exist only inside a cache-blocked accumulator —
// the (B, D) shortlist (600 MB at nq=4096, nmid=300) never
// materializes; the mid-rerank only ever ranks on these scores
// (reference: search_tasks.py:448-471 decodes, adds the centroid, and
// computes distances in three full passes).
//   codes: (B, M_base + 1) int32, column 0 = IVF code (the native
//          scan's output layout, used zero-copy)
void qpw_score(const float* books, const int* codes, const int* ivf_code_map,
               int ivf_m, int M_base, int K_base, const int* pairs, int T,
               int K2, int D, const float* cents, const float* xq,
               int64_t nmid, int64_t B, float* out, int nthreads) {
  constexpr int64_t BLOCK = 2048;
  const int C = M_base + 1;
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel
#endif
  {
    std::vector<float> acc(BLOCK * D);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 1)
#endif
    for (int64_t b0 = 0; b0 < B; b0 += BLOCK) {
      const int64_t n = std::min(BLOCK, B - b0);
      // init with the coarse centroid of each entry's list
      for (int64_t i = 0; i < n; i++) {
        const int lv = codes[(b0 + i) * C];
        std::memcpy(acc.data() + i * D, cents + (int64_t)lv * D,
                    sizeof(float) * D);
      }
      for (int t = 0; t < T; t++) {
        const float* book = books + (int64_t)t * K2 * D;
        const int s0 = pairs[t], s1 = pairs[T + t];
        auto src = [&](int s, int64_t i) -> int {
          const int* row = codes + (b0 + i) * C;
          return s < M_base
                     ? row[1 + s]
                     : ivf_code_map[(int64_t)row[0] * ivf_m + (s - M_base)];
        };
        for (int64_t i = 0; i < n; i++) {
          const int c = src(s0, i) * K_base + src(s1, i);
          const float* brow = book + (int64_t)c * D;
          float* o = acc.data() + i * D;
          for (int d = 0; d < D; d++) o[d] += brow[d];
        }
      }
      for (int64_t i = 0; i < n; i++) {
        const float* q = xq + ((b0 + i) / nmid) * D;
        const float* o = acc.data() + i * D;
        float s = 0.f;
        for (int d = 0; d < D; d++) {
          const float t2 = q[d] - o[d];
          s += t2 * t2;
        }
        out[b0 + i] = s;
      }
    }
  }
}

// ---- serialization -------------------------------------------------------

static const uint32_t QIVF_MAGIC = 0x51495646;  // "QIVF"

int qivf_save(const IvfIndex* idx, const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t magic = QIVF_MAGIC, version = 3;
  fwrite(&magic, 4, 1, f);
  fwrite(&version, 4, 1, f);
  fwrite(&idx->nlist, 4, 1, f);
  fwrite(&idx->M, 4, 1, f);
  fwrite(&idx->K, 4, 1, f);
  fwrite(&idx->D, 4, 1, f);
  fwrite(&idx->code_bytes, 4, 1, f);
  fwrite(&idx->norm_min, 4, 1, f);
  fwrite(&idx->norm_scale, 4, 1, f);
  fwrite(&idx->ntotal, 8, 1, f);
  for (const auto& lst : idx->lists) {
    int64_t n = (int64_t)lst.ids.size();
    fwrite(&n, 8, 1, f);
    if (n) {
      fwrite(lst.ids.data(), 8, n, f);
      fwrite(lst.codes.data(), 1, n * idx->M * idx->code_bytes, f);
      fwrite(lst.norms.data(), 1, n, f);
    }
  }
  fclose(f);
  return 0;
}

IvfIndex* qivf_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, version = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic != QIVF_MAGIC) {
    fclose(f);
    return nullptr;
  }
  if (fread(&version, 4, 1, f) != 1) { fclose(f); return nullptr; }
  auto* idx = new IvfIndex();
  bool ok = fread(&idx->nlist, 4, 1, f) == 1 && fread(&idx->M, 4, 1, f) == 1 &&
            fread(&idx->K, 4, 1, f) == 1 &&
            fread(&idx->D, 4, 1, f) == 1;
  if (ok && version >= 3) ok = fread(&idx->code_bytes, 4, 1, f) == 1;
  if (version < 3) idx->code_bytes = 1;
  ok = ok && fread(&idx->norm_min, 4, 1, f) == 1 &&
       fread(&idx->norm_scale, 4, 1, f) == 1 &&
       fread(&idx->ntotal, 8, 1, f) == 1;
  if (!ok) { delete idx; fclose(f); return nullptr; }
  idx->lists.resize(idx->nlist);
  const int64_t row = (int64_t)idx->M * idx->code_bytes;
  for (auto& lst : idx->lists) {
    int64_t n = 0;
    if (fread(&n, 8, 1, f) != 1) { delete idx; fclose(f); return nullptr; }
    lst.ids.resize(n);
    lst.codes.resize(n * row);
    lst.norms.resize(n);
    if (n) {
      ok = fread(lst.ids.data(), 8, n, f) == (size_t)n &&
           fread(lst.codes.data(), 1, n * row, f) == (size_t)(n * row) &&
           fread(lst.norms.data(), 1, n, f) == (size_t)n;
      if (!ok) { delete idx; fclose(f); return nullptr; }
    }
  }
  fclose(f);
  return idx;
}

}  // extern "C"
