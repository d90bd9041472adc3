// Native HNSW graph for coarse quantization over the IVF centroids.
//
// Replaces the HNSW32 coarse quantizer of the reference's faiss factory
// string "IVF{K}_HNSW32,RQ{M}x8_Nqint8" (reference:
// config/qinco_cfg.yaml:132, search_tasks.py:199-205 sets
// efConstruction=20, :409-410 sets per-experiment efSearch).  Standard
// hierarchical navigable-small-world construction: exponential level
// assignment, greedy descent through upper layers, best-first (ef)
// search with heuristic (diversity-aware) neighbor selection
// at insertion.
//
// The TPU exact scan (qinco_tpu/search/index.py:coarse_probe) is the
// default coarse path; HNSW serves CPU-only deployments and the
// reference's timing methodology.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Hnsw {
  int n = 0;
  int dim = 0;
  int M = 32;             // neighbors per node per upper layer (2M at layer 0)
  int ef_construction = 20;
  int max_level = 0;
  int entry = -1;
  std::vector<float> data;          // (n, dim) — centroid vectors (owned)
  std::vector<int> levels;          // (n,)
  // neighbors[l] is a flat (n, width(l)) int32 array, -1 padded
  std::vector<std::vector<int>> neighbors;

  int width(int level) const { return level == 0 ? 2 * M : M; }
  const float* vec(int i) const { return data.data() + (size_t)i * dim; }
};

inline float l2(const float* a, const float* b, int d) {
  float acc = 0.f;
  for (int i = 0; i < d; i++) {
    float t = a[i] - b[i];
    acc += t * t;
  }
  return acc;
}

using PD = std::pair<float, int>;  // (dist, id)

// Best-first search at one layer; returns up to ef closest as a max-heap.
void search_layer(const Hnsw& h, const float* q, int entry, float entry_d,
                  int level, int ef, std::vector<PD>& out,
                  std::vector<uint32_t>& visited, uint32_t tag) {
  std::priority_queue<PD, std::vector<PD>, std::greater<PD>> cands;  // min
  std::priority_queue<PD> best;                                     // max
  cands.push({entry_d, entry});
  best.push({entry_d, entry});
  visited[entry] = tag;
  const auto& nbrs = h.neighbors[level];
  const int w = h.width(level);

  while (!cands.empty()) {
    auto [d, c] = cands.top();
    if (d > best.top().first && (int)best.size() >= ef) break;
    cands.pop();
    const int* nb = nbrs.data() + (size_t)c * w;
    for (int j = 0; j < w; j++) {
      int v = nb[j];
      if (v < 0) break;
      if (visited[v] == tag) continue;
      visited[v] = tag;
      float dv = l2(q, h.vec(v), h.dim);
      if ((int)best.size() < ef || dv < best.top().first) {
        cands.push({dv, v});
        best.push({dv, v});
        if ((int)best.size() > ef) best.pop();
      }
    }
  }
  out.clear();
  while (!best.empty()) {
    out.push_back(best.top());
    best.pop();
  }
  std::reverse(out.begin(), out.end());  // ascending distance
}

// Greedy descent through layers > target.
int greedy_descent(const Hnsw& h, const float* q, int start, int from_level,
                   int to_level, float* dist_out) {
  int cur = start;
  float cur_d = l2(q, h.vec(cur), h.dim);
  for (int l = from_level; l > to_level; l--) {
    bool changed = true;
    const auto& nbrs = h.neighbors[l];
    const int w = h.width(l);
    while (changed) {
      changed = false;
      const int* nb = nbrs.data() + (size_t)cur * w;
      for (int j = 0; j < w; j++) {
        int v = nb[j];
        if (v < 0) break;
        float dv = l2(q, h.vec(v), h.dim);
        if (dv < cur_d) {
          cur_d = dv;
          cur = v;
          changed = true;
        }
      }
    }
  }
  *dist_out = cur_d;
  return cur;
}

// Diversity-aware neighbor selection (Malkov & Yashunin, Algorithm 4).
// ``cand`` must be ascending by distance to the base point.  A candidate
// is kept only if it is closer to the base than to every already-kept
// neighbor — a kept neighbor otherwise already covers its direction.
// Naive closest-M pruning makes *larger* efConstruction pools produce
// clustered, poorly-connected graphs: measured on 2^16 IVF centroids,
// recall@16 (efSearch=64) fell from 0.52 at efC=20 to 0.19 at efC=80
// with closest-M, and rose to >0.8 with this heuristic.
void select_heuristic(const Hnsw& h, const std::vector<PD>& cand, int max_m,
                      std::vector<int>& out) {
  out.clear();
  for (const auto& c : cand) {
    if ((int)out.size() >= max_m) break;
    const float* cv = h.vec(c.second);
    bool keep = true;
    for (int s : out) {
      if (l2(cv, h.vec(s), h.dim) < c.first) {
        keep = false;
        break;
      }
    }
    if (keep) out.push_back(c.second);
  }
  // backfill with skipped candidates (keepPrunedConnections) so nodes
  // are not left under-connected in small or degenerate pools
  if ((int)out.size() < max_m) {
    for (const auto& c : cand) {
      if ((int)out.size() >= max_m) break;
      if (std::find(out.begin(), out.end(), c.second) == out.end())
        out.push_back(c.second);
    }
  }
}

// ``locks`` (one per node) serialize link-list writes during the
// parallel build; readers (search_layer) run lock-free and tolerate
// momentarily truncated lists — links are aligned int32 stores, so a
// racing reader only ever sees valid ids or -1, never torn values.
void connect(Hnsw& h, int node, int level, const std::vector<PD>& cand,
             std::mutex* locks) {
  const int w = h.width(level);
  int* nb = h.neighbors[level].data() + (size_t)node * w;
  std::vector<int> sel;
  select_heuristic(h, cand, w, sel);
  int count = (int)sel.size();
  {
    std::lock_guard<std::mutex> g(locks[node]);
    for (int i = 0; i < count; i++) nb[i] = sel[i];
    for (int i = count; i < w; i++) nb[i] = -1;
  }

  // back-links; when a peer's list is full, re-select its neighbors
  // (existing links + the new node) with the same heuristic
  std::vector<PD> pool;
  std::vector<int> psel;
  for (int i = 0; i < count; i++) {
    int peer = sel[i];
    int* pnb = h.neighbors[level].data() + (size_t)peer * w;
    std::lock_guard<std::mutex> g(locks[peer]);
    int slot = -1;
    for (int j = 0; j < w; j++) {
      if (pnb[j] < 0) {
        slot = j;
        break;
      }
    }
    if (slot >= 0) {
      pnb[slot] = node;
      continue;
    }
    // Full re-selection on overflow — no "farther than current worst"
    // shortcut: a newcomer farther than every existing link can still
    // be the diverse one worth keeping (it may cover a direction the
    // clustered near links don't), and skipping it re-creates exactly
    // the clustering the heuristic exists to break (measured: recall@16
    // at efC=80 collapses 0.73 -> 0.23 with the shortcut).
    pool.clear();
    pool.push_back({l2(h.vec(peer), h.vec(node), h.dim), node});
    for (int j = 0; j < w; j++)
      pool.push_back({l2(h.vec(peer), h.vec(pnb[j]), h.dim), pnb[j]});
    std::sort(pool.begin(), pool.end());
    select_heuristic(h, pool, w, psel);
    int pc = (int)psel.size();
    for (int j = 0; j < pc; j++) pnb[j] = psel[j];
    for (int j = pc; j < w; j++) pnb[j] = -1;
  }
}

}  // namespace

extern "C" {

Hnsw* qhnsw_build(const float* vectors, int n, int dim, int M,
                  int ef_construction, uint64_t seed) {
  auto* h = new Hnsw();
  h->n = n;
  h->dim = dim;
  h->M = M;
  h->ef_construction = ef_construction;
  h->data.assign(vectors, vectors + (size_t)n * dim);
  h->levels.resize(n);

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  const double mult = 1.0 / std::log((double)M);
  int max_level = 0;
  for (int i = 0; i < n; i++) {
    int l = (int)(-std::log(unif(rng) + 1e-12) * mult);
    h->levels[i] = l;
    max_level = std::max(max_level, l);
  }
  h->max_level = max_level;
  h->neighbors.resize(max_level + 1);
  for (int l = 0; l <= max_level; l++)
    h->neighbors[l].assign((size_t)n * h->width(l), -1);

  // Parallel insertion (the reference's faiss build is OpenMP-parallel
  // too): per-node mutexes serialize link writes, searches run
  // lock-free, and the entry point advances under a global mutex.
  // Level assignment stays seed-deterministic; link sets may vary
  // slightly run-to-run from insertion interleaving (quality-neutral).
  std::unique_ptr<std::mutex[]> locks(new std::mutex[n]);
  std::mutex top_mtx;
  h->entry = 0;
  int cur_top = h->levels[0];
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<uint32_t> visited(n, 0);
    uint32_t tag = 0;
    std::vector<PD> cand;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 64)
#endif
    for (int i = 1; i < n; i++) {
      int li = h->levels[i];
      int entry, top;
      {
        std::lock_guard<std::mutex> g(top_mtx);
        entry = h->entry;
        top = cur_top;
      }
      float d;
      int ep = greedy_descent(*h, h->vec(i), entry, top,
                              std::min(li, top), &d);
      for (int l = std::min(li, top); l >= 0; l--) {
        tag++;
        search_layer(*h, h->vec(i), ep, d, l, h->ef_construction, cand,
                     visited, tag);
        connect(*h, i, l, cand, locks.get());
        if (!cand.empty()) {
          ep = cand[0].second;
          d = cand[0].first;
        }
      }
      if (li > top) {
        std::lock_guard<std::mutex> g(top_mtx);
        if (li > cur_top) {
          h->entry = i;
          cur_top = li;
        }
      }
    }
  }
  return h;
}

void qhnsw_free(Hnsw* h) { delete h; }

// Search k nearest for nq queries with the given ef (>= k).
void qhnsw_search(const Hnsw* h, const float* queries, int64_t nq, int k,
                  int ef, int* out_idx, float* out_dist, int nthreads) {
  ef = std::max(ef, k);
#ifdef _OPENMP
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel
#endif
  {
    std::vector<uint32_t> visited(h->n, 0);
    uint32_t tag = 0;
    std::vector<PD> cand;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 8)
#endif
    for (int64_t q = 0; q < nq; q++) {
      const float* qv = queries + q * h->dim;
      float d;
      int ep = greedy_descent(*h, qv, h->entry, h->max_level, 0, &d);
      tag++;
      search_layer(*h, qv, ep, d, 0, ef, cand, visited, tag);
      int found = std::min((int)cand.size(), k);
      for (int i = 0; i < found; i++) {
        out_idx[q * k + i] = cand[i].second;
        out_dist[q * k + i] = cand[i].first;
      }
      for (int i = found; i < k; i++) {
        out_idx[q * k + i] = -1;
        out_dist[q * k + i] = HUGE_VALF;
      }
    }
  }
}

int qhnsw_save(const Hnsw* h, const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t magic = 0x51484E53;  // "QHNS"
  fwrite(&magic, 4, 1, f);
  fwrite(&h->n, 4, 1, f);
  fwrite(&h->dim, 4, 1, f);
  fwrite(&h->M, 4, 1, f);
  fwrite(&h->max_level, 4, 1, f);
  fwrite(&h->entry, 4, 1, f);
  fwrite(h->data.data(), 4, h->data.size(), f);
  fwrite(h->levels.data(), 4, h->levels.size(), f);
  for (int l = 0; l <= h->max_level; l++)
    fwrite(h->neighbors[l].data(), 4, h->neighbors[l].size(), f);
  fclose(f);
  return 0;
}

Hnsw* qhnsw_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic;
  if (fread(&magic, 4, 1, f) != 1 || magic != 0x51484E53) {
    fclose(f);
    return nullptr;
  }
  auto* h = new Hnsw();
  bool ok = fread(&h->n, 4, 1, f) == 1 && fread(&h->dim, 4, 1, f) == 1 &&
            fread(&h->M, 4, 1, f) == 1 && fread(&h->max_level, 4, 1, f) == 1 &&
            fread(&h->entry, 4, 1, f) == 1;
  if (!ok) { delete h; fclose(f); return nullptr; }
  h->data.resize((size_t)h->n * h->dim);
  h->levels.resize(h->n);
  ok = fread(h->data.data(), 4, h->data.size(), f) == h->data.size() &&
       fread(h->levels.data(), 4, h->levels.size(), f) == h->levels.size();
  h->neighbors.resize(h->max_level + 1);
  for (int l = 0; ok && l <= h->max_level; l++) {
    h->neighbors[l].resize((size_t)h->n * h->width(l));
    ok = fread(h->neighbors[l].data(), 4, h->neighbors[l].size(), f) ==
         h->neighbors[l].size();
  }
  fclose(f);
  if (!ok) { delete h; return nullptr; }
  return h;
}

}  // extern "C"
