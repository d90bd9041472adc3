#!/usr/bin/env python
"""A/B the paired-K² index against the standard index on the 10M
artifacts (reference formulation: pair_codes_ivf, search_tasks.py:145-151,
hardcoded off at :641 — this measures the trade it implies).

Pairing halves the per-entry scan lookups (M -> M/2) at the cost of a
per-query K²-stride LUT build (-2q.C, nprobe-independent).  Reports, for
the same coarse probes: scan wall-clock, shortlist recall vs GT, and the
LUT-build share.

Run after scripts/scale_regression.py has produced /root/scale10m:
  python scripts/pair_codes_bench.py [--dir /root/scale10m] [--nprobe 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def shortlist_recall(ids, gt, r=100):
    hits = sum(gt[q, 0] in set(ids[q]) for q in range(len(gt)))
    return hits / len(gt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/scale10m")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--nshort", type=int, default=300)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--nthreads", type=int, default=0)
    ap.add_argument("--out", default="/tmp/pair_codes_bench.json")
    args = ap.parse_args()
    d = Path(args.dir)

    import run_qinco
    from qinco_tpu.search.index import IvfIndex

    def build(out_name, *extra):
        if (d / out_name).exists():
            return
        rc = run_qinco.main([
            "task=build_index", f"trainset={d}/train.npy",
            f"ivf_centroids={d}/ivf.npy",
            f"encoded_trainset={d}/codes_train.npz",
            f"encoded_db={d}/codes_db.npz",
            f"output={d}/{out_name}", "ds.valset=10000",
            "model_args=qinco2-S", "search.pair_codes=true", "verbose=true",
            *extra,
        ])
        assert rc in (0, None)

    build("index_paired.qivf")  # prior-centered backfit (default)
    build("index_paired_noprior.qivf", "search.pair_prior=false")

    xq = np.load(d / "queries.npy")[: args.nq].astype(np.float32)
    gt = np.load(d / "gt.npy")[: args.nq]

    report = {"nprobe": args.nprobe, "nshort": args.nshort, "nq": args.nq}
    for tag, path in (("standard", d / "index.qivf"),
                      ("paired", d / "index_paired.qivf"),
                      ("paired_noprior", d / "index_paired_noprior.qivf")):
        index = IvfIndex.load(str(path))
        if index.norm_mode == "resid":
            index.enable_split_lut()
        # warmup (jit compiles, list page-in, thread spin-up)
        index.search_and_return_codes(xq[:256], args.nshort,
                                      nprobe=args.nprobe,
                                      nthreads=args.nthreads)
        t0 = time.perf_counter()
        dists, ids, codes = index.search_and_return_codes(
            xq, args.nshort, nprobe=args.nprobe, nthreads=args.nthreads)
        dt = time.perf_counter() - t0
        report[tag] = {
            "M": index.M, "K": index.K, "code_bytes": index.code_bytes,
            "norm_mode": index.norm_mode,
            "t_total_s": round(dt, 3),
            "shortlist_R@1_in_top%d" % args.nshort: round(
                shortlist_recall(ids, gt), 4),
        }
        print(json.dumps({tag: report[tag]}), flush=True)

    Path(args.out).write_text(json.dumps(report, indent=1))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
