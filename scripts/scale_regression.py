#!/usr/bin/env python
"""Scale regression: the full billion-scale-style pipeline on a synthetic
clustered DB, one command (VERDICT r1 #3).

Default scale: 10M vectors × D=128, ivf_K=2^16 — the reference's own
smoke anchor is 10M/IVF65k (reference: qinco_v1/docs/IVF_search.md:61,
README.md:376-382).  Runs:

  gen data -> ivf_centroids (TPU k-means) -> train -> encode trainset+db
  -> build_index -> search sweep -> validations

and records a JSON report with per-phase wall-clock, recall/time
operating points, HNSW-vs-exact coarse recall, int8-norm quantization
error, and a Pareto-prior-ordering check (VERDICT r1 #4: do the first-k
explored points hit the measured frontier?).

Usage:
  python scripts/scale_regression.py --out /tmp/scale [--db-size 10000000]
      [--ivf-k 65536] [--epochs 2] [--cpu-search]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def log(*a):
    print("[scale]", *a, flush=True)


def gen_data(out: Path, db_size: int, train_size: int, nq: int, d: int,
             seed=0, query_noise=1.0):
    """Clustered synthetic data + exact GT (TPU brute force)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n_centers = 8192
    # Geometry tuned with scripts/frontier_tune.py so coarse recall
    # climbs GRADUALLY with nprobe (0.48 @ nprobe=1 -> 0.98 @ 64, the
    # faiss-realistic regime) instead of saturating: center spread 1.0,
    # cluster noise 1.5, query noise 1.0.  Separated clusters (the
    # original *3 spread, noise 0.5) made coarse assignment trivially
    # correct at nprobe=2-4 and collapsed the measured Pareto frontier
    # to 2-4 points on the nshort axis alone.
    centers = (rng.normal(size=(n_centers, d)) * 1.0).astype(np.float32)

    def sample(n, s, chunk=1_000_000):
        r = np.random.default_rng(s)
        parts = []
        for i in range(0, n, chunk):
            m = min(chunk, n - i)
            parts.append(
                centers[r.integers(0, n_centers, size=m)]
                + 1.5 * r.normal(size=(m, d)).astype(np.float32)
            )
        return np.concatenate(parts).astype(np.float32)

    log(f"generating train {train_size}, db {db_size}, queries {nq}")
    if not (out / "train.npy").exists():
        train = sample(train_size, 1)
        np.save(out / "train.npy", train)
        del train
    if not (out / "db.npy").exists():
        db = sample(db_size, 2)
        np.save(out / "db.npy", db)
    else:
        db = np.load(out / "db.npy", mmap_mode="r")
    if not (out / "queries.npy").exists():
        # query_noise ~ cluster radius (0.5): queries land between
        # centroids, so coarse recall actually depends on nprobe and the
        # measured Pareto frontier is non-degenerate.  The original
        # 0.05 made queries near-duplicates of DB rows — recall saturated
        # at nprobe=2 and the frontier collapsed to 3 trivial points.
        queries = np.asarray(db[
            np.sort(rng.integers(0, db_size, size=nq))
        ]) + query_noise * rng.normal(size=(nq, d)).astype(np.float32)
        np.save(out / "queries.npy", queries.astype(np.float32))
    else:
        queries = np.load(out / "queries.npy")

    if (out / "gt.npy").exists():
        return np.load(out / "gt.npy")

    # exact GT: chunked top-100 on device (running merge)
    log("computing exact ground truth on device")
    qd = jnp.asarray(queries.astype(np.float32))

    @jax.jit
    def chunk_top(qd, db_chunk, base, best_d, best_i):
        from qinco_tpu.ops.distances import pairwise_sqdist_partial

        dloc = pairwise_sqdist_partial(qd, db_chunk)  # (nq, c)
        ids = jnp.arange(db_chunk.shape[0], dtype=jnp.int32) + base
        cand_d = jnp.concatenate([best_d, dloc], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(ids[None], dloc.shape)], axis=1
        )
        neg, sel = jax.lax.top_k(-cand_d, 100)
        return -neg, jnp.take_along_axis(cand_i, sel, axis=1)

    best_d = jnp.full((nq, 100), 3.4e38, jnp.float32)
    best_i = jnp.zeros((nq, 100), jnp.int32)
    # chunk bounds the (nq, chunk) distance matrix: 4096 x 131072 f32 = 2GB
    # (a 1M chunk OOMs the 16GB HBM).
    chunk = 131_072
    for i in range(0, db_size, chunk):
        part = np.asarray(db[i : i + chunk], np.float32)
        if len(part) < chunk:  # keep one compiled shape for the tail
            part = np.concatenate(
                [part, np.full((chunk - len(part), part.shape[1]), 1e30,
                               np.float32)]
            )
        best_d, best_i = chunk_top(
            qd, jnp.asarray(part), i, best_d, best_i
        )
    gt = np.asarray(best_i)
    np.save(out / "gt.npy", gt)
    del db
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/scale_regression"))
    ap.add_argument("--db-size", type=int, default=10_000_000)
    ap.add_argument("--train-size", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=4096)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--ivf-k", type=int, default=65536)
    ap.add_argument("--kmeans-iters", type=int, default=100,
                    help="IVF coarse k-means iterations (reduce for the "
                         "ivf_K=2^20 exercise where 100 full iterations "
                         "cost more TPU-hours than the run needs)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--cpu-search", action="store_true",
                    help="also run the search sweep with cpu=true "
                         "(the reference's timing protocol)")
    ap.add_argument("--cpu-only-sweep", action="store_true",
                    help="skip the TPU-pipeline sweep (for TPU-outage "
                         "windows); implies --cpu-search")
    ap.add_argument("--query-noise", type=float, default=1.0,
                    help="query displacement scale (x cluster noise 1.5): "
                         "1.0 keeps the NN gap >> reconstruction error so "
                         "recall reduces to shortlist membership; ~2.0 "
                         "makes rank-within-shortlist and nshort matter "
                         "(non-degenerate Pareto frontier)")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--dense-sweep", action="store_true",
                    help="96-point grid with the Pareto skip disabled: "
                         "measures the full frontier so the generated "
                         "exploration prior can be validated against it "
                         "(VERDICT r2 #5)")
    ap.add_argument("--tiny-model", action="store_true",
                    help="small explicit model args + no Pallas (CPU smoke)")
    args = ap.parse_args()
    out = args.out
    out.mkdir(parents=True, exist_ok=True)
    report: dict = {"config": vars(args) | {"out": str(out)}, "phases": {}}

    import run_qinco

    if args.tiny_model:
        model_args = ["M=2", "K=16", "L=1", "de=8", "dh=12", "A=4", "B=2"]
        profile = []
    else:
        model_args = ["model_args=qinco2-S"]
        # parity-numerics fast profile (encode_profile=parity): exact
        # in-kernel top-A + the numerics-neutral fused select/rebuild —
        # DB encode quality feeds recall, so the binned profile stays
        # out of the pipeline by default
        profile = ["encode_profile=parity"]

    def phase(name, fn):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        report["phases"][name] = round(dt, 2)
        log(f"phase {name}: {dt:.1f}s")
        return r

    if not args.skip_gen or not (out / "gt.npy").exists():
        phase("gen_data", lambda: gen_data(
            out, args.db_size, args.train_size, args.nq, args.d,
            query_noise=args.query_noise,
        ))

    # 1. IVF centroids (TPU k-means, device-side streaming M-step)
    if not (out / "ivf.npy").exists():
        phase("ivf_centroids", lambda: run_qinco.main([
            "task=ivf_centroids", f"trainset={out}/train.npy",
            f"output={out}/ivf.npy", f"ivf_K={args.ivf_k}",
            f"kmeans_iters={args.kmeans_iters}",
            "ds.valset=10000", "verbose=true",
        ]))
        # k-means quality proxy: quantization MSE of a sample
        import jax.numpy as jnp

        from qinco_tpu.ops.distances import chunked_argmin

        cents = np.load(out / "ivf.npy")
        sample = np.asarray(
            np.load(out / "train.npy", mmap_mode="r")[:65_536], np.float32
        )
        cents_dev = jnp.asarray(cents)
        codes = np.concatenate([
            np.asarray(chunked_argmin(
                jnp.asarray(sample[i : i + 4096]), cents_dev, chunk=16384
            )[0])
            for i in range(0, len(sample), 4096)
        ])
        mse = float(((sample - cents[codes]) ** 2).sum(1).mean())
        report["kmeans_sample_mse"] = mse
        log(f"k-means sample quantization MSE/vector: {mse:g}")

    # 2. Train the IVF model (qinco2-S shapes)
    if not (out / "model.npz").exists():
        phase("train", lambda: run_qinco.main([
            "task=train", f"trainset={out}/train.npy",
            f"output={out}/model.npz", f"ivf_centroids={out}/ivf.npy",
        ] + model_args + [
            "ds.valset=10000", "ds.loop=500000", f"epochs={args.epochs}",
            "scheduler.stop_patience=0",
        ] + profile))

    # 3. Encode trainset + DB
    if not (out / "codes_train.npz").exists():
        phase("encode_trainset", lambda: run_qinco.main([
            "task=encode", f"trainset={out}/train.npy",
            f"model={out}/model.npz", f"ivf_centroids={out}/ivf.npy",
            f"output={out}/codes_train.npz", "encode_trainset=true",
            "ds.valset=10000", "verbose=false",
        ] + profile))
    if not (out / "codes_db.npz").exists():
        phase("encode_db", lambda: run_qinco.main([
            "task=encode", f"db={out}/db.npy",
            f"model={out}/model.npz", f"ivf_centroids={out}/ivf.npy",
            f"output={out}/codes_db.npz", "verbose=false",
        ] + profile))
        codes = np.load(out / "codes_db.part_0.npz")["codes"]
        report["encode_db_vecs_per_s"] = round(
            args.db_size / report["phases"]["encode_db"], 1
        )

    # 4. Build index
    if not (out / "index.qivf").exists():
        phase("build_index", lambda: run_qinco.main([
            "task=build_index", f"trainset={out}/train.npy",
            f"ivf_centroids={out}/ivf.npy",
            f"encoded_trainset={out}/codes_train.npz",
            f"encoded_db={out}/codes_db.npz",
            f"output={out}/index.qivf", "ds.valset=10000", "verbose=true",
        ]))

    # 5. Validations: HNSW-vs-exact coarse recall + int8 norm error
    def validations():
        import jax.numpy as jnp

        from qinco_tpu.search.index import HnswQuantizer, coarse_probe

        cents = np.load(out / "ivf.npy")
        queries = np.load(out / "queries.npy")[:1024]
        exact_idx, _ = coarse_probe(queries, cents, 16)
        t0 = time.perf_counter()
        hnsw = HnswQuantizer.build(cents)
        report["hnsw_build_s"] = round(time.perf_counter() - t0, 2)
        hnsw_rec = {}
        for ef in (16, 64, 256):
            hidx, _ = hnsw.search(queries, 16, ef=ef)
            # fraction of exact top-16 lists found by HNSW
            hit = np.mean([
                len(set(a) & set(b)) / 16.0
                for a, b in zip(exact_idx, hidx)
            ])
            hnsw_rec[str(ef)] = round(float(hit), 4)
        report["hnsw_vs_exact_coarse_recall@16"] = hnsw_rec
        log(f"HNSW coarse recall@16 by efSearch: {hnsw_rec}")

        # int8 norm-quantization error, simulated with the native
        # quantizer's affine contract (native/ivf_index.cpp train_norm:
        # 255 levels over the [min, max] training range)
        codes = np.load(out / "codes_db.part_0.npz")["codes"][:200_000]
        from qinco_tpu.search.index import IvfIndex
        from qinco_tpu.ops.aq import reconstruct_from_codebooks

        index = IvfIndex.load(str(out / "index.qivf"))
        recons = reconstruct_from_codebooks(codes[:, 1:], index.codebooks)
        norms = (recons ** 2).sum(-1)
        lo, hi = norms.min(), norms.max()
        q = np.round((norms - lo) / max(hi - lo, 1e-20) * 255.0)
        deq = q / 255.0 * (hi - lo) + lo
        rel = np.abs(deq - norms) / np.maximum(norms.mean(), 1e-9)
        report["int8_norm_rel_err"] = {
            "mean": float(rel.mean()), "p99": float(np.quantile(rel, 0.99))
        }
        log(f"int8 norm relative error: mean={rel.mean():.2e} "
            f"p99={np.quantile(rel, 0.99):.2e}")

    phase("validations", validations)

    # 5.5 Pairwise additive mid-rerank decoder (reference:
    # TrainPairwiseDecoderTask, search_tasks.py:735-832) — the scale sweep
    # exercises it through nmid_short > 1 operating points.
    if not (out / "pairwise.npz").exists():
        phase("train_pairwise_decoder", lambda: run_qinco.main([
            "task=train_pairwise_decoder", f"trainset={out}/train.npy",
            f"ivf_centroids={out}/ivf.npy",
            f"encoded_trainset={out}/codes_train.npz",
            f"output={out}/pairwise.npz", "ds.valset=10000", "verbose=true",
        ]))

    # 6. Search sweep (TPU coarse + native scan)
    def search_sweep(cpu: bool):
        suffix = "_cpu" if cpu else ""
        if args.dense_sweep:
            # 96 points; nshort=3 adds the shortlist-limited regime and
            # nprobe up to 256 the coarse-recall tail, so the measured
            # frontier has extent on both axes
            grid = [
                "search.nprobe=[2,4,8,16,32,64,128,256]",
                "search.nshort=[3,10,30,100]",
                "search.nmid_short=[1,2,3]",
                "search.explore_all=true",
            ]
        else:
            grid = [
                "search.nprobe=[4,16,64]", "search.nshort=[10,100]",
                "search.nmid_short=[1,3]",
            ]
        cmd = [
            "task=search", f"model={out}/model.npz",
            f"ivf_centroids={out}/ivf.npy", f"index={out}/index.qivf",
            f"queries={out}/queries.npy", f"queries_gt={out}/gt.npy",
            f"pairwise_decoder={out}/pairwise.npz",
            f"output={out}/results{suffix}.json",
        ] + grid + [
            "search.quantizer_efSearch=[]",
            # nthreads=0 -> one OMP thread per core.  The config default
            # (32, the reference's protocol) oversubscribes small hosts
            # 8x and inflates scan times ~4x.
            "search.nthreads=0",
            "verbose=true", "resume=true",
        ]
        if cpu:
            cmd += ["cpu=true"]
        run_qinco.main(cmd)
        res = json.loads((out / f"results{suffix}.json").read_text())
        report[f"operating_points{suffix}"] = [
            {"parameters": r["parameters"], "R@1": r["recalls"]["1"],
             "R@10": r["recalls"]["10"], "R@100": r["recalls"]["100"],
             "t_total": r["t_total"]}
            for r in res["ivf_real_res"]
        ]
        return res

    res = None
    if not args.cpu_only_sweep:
        res = phase("search_sweep", lambda: search_sweep(False))
    res_cpu = None
    if args.cpu_search or args.cpu_only_sweep:
        res_cpu = phase("search_sweep_cpu", lambda: search_sweep(True))

    # 7. Pareto-prior ordering check: do the first-k explored points hit
    # the measured recall/time frontier? (VERDICT r1 #4)
    def pareto_check(res, tag):
        """Validate the exploration ordering against the measured
        (recall, time) frontier (VERDICT r2 #5): replay AdaptiveExplorer
        deterministically over the measured points (every pick's update
        uses the real measurement, exactly as a live run would see it)
        and report what fraction of the true frontier the first-k
        explored points hit/cover.  Replaying decouples the validation
        from the order the results file happened to be written in."""
        from qinco_tpu.search.operating_points import OperatingPoints
        from qinco_tpu.search.optim_order import AdaptiveExplorer

        results = res["ivf_real_res"]
        by = {
            (r["parameters"]["nprobe"], r["parameters"]["nshort"],
             r["parameters"]["nmid_short"]): (r["recalls"]["1"], r["t_total"])
            for r in results
        }
        op2 = OperatingPoints()
        op2.add_range("nprobe", sorted({k[0] for k in by}))
        op2.add_range("nshort", sorted({k[1] for k in by}))
        op2.add_range("nmid_short", sorted({k[2] for k in by}))
        def run_order(order_pts):
            """Coverage stats for one exploration order over the same
            measured set.  Frontier membership among near-tied points is
            a lottery under this box's timing noise (re-measuring one
            point moves t by +-15-60%% on the tunnel), so the headline
            metric is tolerant COVERAGE: a frontier point counts as
            found once an early point is within recall -0.002 and time
            x1.15 of it."""
            pts = order_pts
            frontier = [
                i for i, (rec, t) in enumerate(pts)
                if not any(r2 >= rec and t2 <= t and (r2 > rec or t2 < t)
                           for r2, t2 in pts)
            ]
            nf = max(len(frontier), 1)
            stats = {"frontier_size": len(frontier)}
            for mult in (1, 2):
                k = min(mult * nf, len(pts))
                stats[f"first_{mult}x_hit"] = round(
                    len(set(frontier) & set(range(k))) / nf, 3)
                cov = sum(
                    any(r2 >= rec - 0.002 and t2 <= t * 1.15
                        for r2, t2 in pts[:k])
                    for rec, t in (pts[i] for i in frontier)
                ) / nf
                stats[f"first_{mult}x_coverage"] = round(cov, 3)
            return frontier, stats

        # adaptive explorer replay (each update uses the real measurement)
        ex = AdaptiveExplorer(op2, op2.all_keys())
        pts_adaptive = []
        while True:
            key = ex.next()
            if key is None:
                break
            p = op2.get_parameters(key)
            m = by.get((p["nprobe"], p["nshort"], p["nmid_short"]))
            if m is None:
                continue  # grid point not measured (shouldn't happen)
            ex.update(p, *m)
            pts_adaptive.append(m)
        frontier, stats_adaptive = run_order(pts_adaptive)

        # static prior ordering, for comparison
        from qinco_tpu.search.optim_order import sort_experiments_by_prior
        static_keys = sort_experiments_by_prior(op2, op2.all_keys())
        pts_static = []
        for key in static_keys:
            p = op2.get_parameters(key)
            m = by.get((p["nprobe"], p["nshort"], p["nmid_short"]))
            if m is not None:
                pts_static.append(m)
        _, stats_static = run_order(pts_static)

        report[f"pareto_prior{tag}"] = {
            "n_measured": len(pts_adaptive),
            "frontier_indices_in_explore_order": sorted(frontier),
            "adaptive_explorer": stats_adaptive,
            "static_prior": stats_static,
        }
        log(f"[{tag or 'tpu'}] frontier {sorted(frontier)} of "
            f"{len(pts_adaptive)}; adaptive {stats_adaptive} | "
            f"static {stats_static}")

    if res is not None:
        pareto_check(res, "")
    if res_cpu is not None:
        pareto_check(res_cpu, "_cpu")

    (out / "scale_report.json").write_text(json.dumps(report, indent=2))
    log(f"report written to {out}/scale_report.json")
    print(json.dumps({k: v for k, v in report.items() if k != "config"},
                     indent=2))


if __name__ == "__main__":
    main()
