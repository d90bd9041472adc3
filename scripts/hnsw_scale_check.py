#!/usr/bin/env python
"""HNSW coarse-quantizer recall at 2^20 centroids (CPU-only check).

The 10M scale regression measures HNSW-vs-exact coarse recall at
ivf_K=2^16 real k-means centroids; this script extends the measurement
to the reference's production scale (ivf_K=2^20,
config/qinco_cfg.yaml:132 "IVF1048576_HNSW32") without needing the
50M-vector k-means: it draws *pseudo-centroids* with the same cluster
structure the scale DB's true centroids have (super-centers at scale 3,
within-cluster spread 0.5 — matching scripts/scale_regression.py's
generator, whose k-means centroids land spread inside the clusters).

Reports recall@16 (fraction of the exact top-16 lists found) per
(efConstruction, efSearch) plus build/search wall times, as JSON.

Usage: python scripts/hnsw_scale_check.py [--n 1048576] [--d 128]
           [--nq 2048] [--efc 20 80] [--out hnsw_2pow20.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def gen_pseudo_centroids(n: int, d: int, nq: int, seed: int = 0):
    """Pseudo-centroids AND queries from the scale generator's
    distribution (super-centers at scale 3, within-cluster spread 0.5):
    both k-means centroids and query vectors of the 10M regression live
    in that point cloud, so HNSW sees comparable geometry."""
    rng = np.random.default_rng(seed)
    n_super = 8192
    supers = (rng.normal(size=(n_super, d)) * 3).astype(np.float32)

    def sample(m):
        return (
            supers[rng.integers(0, n_super, size=m)]
            + 0.5 * rng.normal(size=(m, d)).astype(np.float32)
        )

    out = np.empty((n, d), np.float32)
    chunk = 1 << 18
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        out[i : i + m] = sample(m)
    return out, sample(nq)


def exact_top16(xq: np.ndarray, cents: np.ndarray, chunk: int = 1 << 16):
    """Chunked exact top-16 with a running merge (host matmuls)."""
    nq = len(xq)
    best_d = np.full((nq, 16), np.inf, np.float32)
    best_i = np.full((nq, 16), -1, np.int64)
    cn2_all = (cents.astype(np.float32) ** 2).sum(-1)
    for i in range(0, len(cents), chunk):
        c = cents[i : i + chunk]
        d = cn2_all[i : i + len(c)][None, :] - 2.0 * (xq @ c.T)
        loc = np.argpartition(d, 16, axis=1)[:, :16]
        loc_d = np.take_along_axis(d, loc, axis=1)
        cat_d = np.concatenate([best_d, loc_d], axis=1)
        cat_i = np.concatenate([best_i, loc + i], axis=1)
        sel = np.argpartition(cat_d, 16, axis=1)[:, :16]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
    return best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--efc", type=int, nargs="+", default=[20, 80])
    ap.add_argument("--efs", type=int, nargs="+", default=[16, 64, 256])
    ap.add_argument("--out", type=str, default="hnsw_2pow20.json")
    ap.add_argument("--centroids", type=str, default=None,
                    help="real centroid .npy (overrides the synthetic set)")
    ap.add_argument("--queries", type=str, default=None)
    args = ap.parse_args()

    from qinco_tpu.search.index import HnswQuantizer

    if args.centroids:
        # NOTE: real k-means centroids are near-uniformly spread (k-means
        # repels them) — a much harder HNSW geometry than the synthetic
        # surrogate below, whose recalls are optimistic by ~0.2-0.4
        # absolute at ef=16 (measured at 2^16: real 0.33 vs pseudo 0.79).
        cents = np.load(args.centroids).astype(np.float32)
        args.n = len(cents)
        rng = np.random.default_rng(99)
        if args.queries:
            xq = np.load(args.queries).astype(np.float32)[: args.nq]
        else:
            _, xq = gen_pseudo_centroids(1, cents.shape[1], args.nq)
    else:
        cents, xq = gen_pseudo_centroids(args.n, args.d, args.nq)

    print("exact top-16 ...", flush=True)
    t0 = time.perf_counter()
    gt = exact_top16(xq, cents)
    t_gt = time.perf_counter() - t0
    print(f"  {t_gt:.1f}s", flush=True)

    report = {
        "n": args.n, "d": args.d, "nq": args.nq, "t_exact_gt_s": round(t_gt, 1),
        "builds": [],
    }
    for efc in args.efc:
        t0 = time.perf_counter()
        h = HnswQuantizer.build(cents, ef_construction=efc)
        t_build = time.perf_counter() - t0
        row = {"efConstruction": efc, "t_build_s": round(t_build, 1),
               "recall@16": {}, "t_search_s": {}}
        for ef in args.efs:
            t0 = time.perf_counter()
            idx, _ = h.search(xq, 16, ef=ef)
            ts = time.perf_counter() - t0
            hit = np.mean([
                len(set(idx[q]) & set(gt[q])) / 16 for q in range(args.nq)
            ])
            row["recall@16"][str(ef)] = round(float(hit), 4)
            row["t_search_s"][str(ef)] = round(ts, 2)
            print(f"efC={efc} ef={ef}: recall@16={hit:.4f} ({ts:.2f}s)",
                  flush=True)
        report["builds"].append(row)
        del h

    Path(args.out).write_text(json.dumps(report, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
