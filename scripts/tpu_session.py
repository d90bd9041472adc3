#!/usr/bin/env python
"""One-dial TPU measurement session.

The axon relay dial costs 30s-4min per interpreter, so this script
batches everything a perf session needs into one process:

  1. bench           : QINCo2-S encode throughput (bench.py protocol)
  2. mse             : production-shape MSE deltas exact vs fused
  4. profile         : per-component timings (kernel / topk / recompute)

Usage: python scripts/tpu_session.py [--steps bench,ab,mse,profile]
Writes JSON lines to stdout and a summary to --out (default
/tmp/tpu_session.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

RESULTS = {}
OUT_PATH = "/tmp/tpu_session.json"


def log(k, v):
    RESULTS[k] = v
    print(json.dumps({k: v}), flush=True)
    # incremental write: a hung/killed later step keeps earlier results
    try:
        Path(OUT_PATH).write_text(json.dumps(RESULTS, indent=1))
    except OSError:
        pass


def safe(k, fn):
    """Record fn() under key k; a failure records the error and moves on
    (one Mosaic compile failure must not kill the whole session —
    learned 2026-08-18 when a bf16-accumulator VerificationError aborted
    the remaining 7 steps)."""
    try:
        log(k, fn())
    except Exception as e:
        log(k, f"failed: {type(e).__name__}: {str(e)[:200]}")


def _throughput(spec, batch=4096, n_iter=8, seed=0):
    """vec/s with the scan-readback protocol (bench.py)."""
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode as encode_n

    params = init_params(jax.random.PRNGKey(0), spec)

    @jax.jit
    def encode_many(params, xs):
        def body(_, x):
            codes, _, _ = encode_n(params, spec, x)
            return None, codes.sum()

        _, sums = jax.lax.scan(body, None, xs)
        return sums.sum()

    xs = jnp.asarray(
        np.random.default_rng(seed)
        .normal(size=(n_iter, batch, spec.D))
        .astype(np.float32)
    )
    float(encode_many(params, xs))  # compile + warm
    t0 = time.perf_counter()
    float(encode_many(params, xs))
    dt = time.perf_counter() - t0
    return batch * n_iter / dt


def _mse(spec, batch=4096, seed=1):
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode

    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(batch, spec.D)).astype(np.float32)
    )
    _, xhat, _ = encode(params, spec, x)
    return float(jnp.mean(jnp.sum((x - xhat) ** 2, -1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=str, default="bench,ab,mse")
    ap.add_argument("--out", type=str, default="/tmp/tpu_session.json")
    args = ap.parse_args()
    steps = set(args.steps.split(","))
    global OUT_PATH
    OUT_PATH = args.out

    import jax

    from qinco_tpu.models.spec import QincoSpec

    log("backend", jax.default_backend())
    base = QincoSpec(
        D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
        fast=True, pallas=True, fused_substep=True,
        compute_dtype="bfloat16",
    )

    sel = base.with_(fused_substep=False)  # exact-selection kernel route

    if "bench" in steps:
        safe("sel_vec_per_s", lambda: round(_throughput(sel), 1))
        safe("fused_vec_per_s", lambda: round(_throughput(base), 1))

    if "batch" in steps:
        # batch-size sweep on the fastest (perbin) profile: fixed per-
        # dispatch costs (topk setup, backtrace, scan glue) amortize with
        # rows — is 4096 leaving throughput on the table?
        pb = base.with_(perbin=True)
        for b in (2048, 4096, 8192, 16384):
            n_it = max(2, 32768 // b)
            safe(f"perbin_b{b}_vec_per_s",
                 lambda b=b, n=n_it: round(_throughput(pb, batch=b,
                                                       n_iter=n), 1))
        # and the exact-selection kernel at the best large batch
        safe("sel_b8192_vec_per_s",
             lambda: round(_throughput(sel, batch=8192, n_iter=4), 1))

    if "sel" in steps:
        # exact-selection kernel: throughput at the default row tile and
        # MSE delta (should be ~0: selection exact, winners recomputed)
        safe("sel_vec_per_s", lambda: round(_throughput(sel), 1))
        safe("sel_approxbeam_vec_per_s",
             lambda: round(_throughput(sel.with_(approx_beam=True)), 1))
        exact = base.with_(fast=False, pallas=False, fused_substep=False,
                           compute_dtype="float32")
        m_exact = _mse(exact)
        safe("mse_sel_delta_pct",
             lambda: round(100 * (_mse(sel) / m_exact - 1), 3))
        safe("mse_sel_approxbeam_delta_pct",
             lambda: round(
                 100 * (_mse(sel.with_(approx_beam=True)) / m_exact - 1), 3))

    if "ab" in steps:
        # second sample of the baseline to bound session noise
        safe("fused_vec_per_s_2", lambda: round(_throughput(base, seed=2), 1))

    if "mse" in steps:
        exact = base.with_(fast=False, pallas=False, fused_substep=False,
                           compute_dtype="float32")
        m_exact = _mse(exact)
        log("mse_exact", m_exact)
        def _fused_delta():
            m_fused = _mse(base)
            log("mse_fused", m_fused)
            return round(100 * (m_fused / m_exact - 1), 3)
        safe("mse_fused_delta_pct", _fused_delta)

    if "train" in steps:
        # jitted train-step device time at batch 1024 (arch doc anchor)
        import jax.numpy as jnp
        import optax

        from qinco_tpu.models import init_params
        from qinco_tpu.models.params import init_model_state
        from qinco_tpu.train.train_step import make_train_step

        for tag, sp in (("exact", base.with_(
                fast=False, pallas=False, fused_substep=False,
                compute_dtype="float32")),
                        ("fused", base), ("perbin", base.with_(perbin=True)),
                        ("perbin_fsel",
                         base.with_(perbin=True, fused_select=True))):
            try:
                params = init_params(jax.random.PRNGKey(0), sp)
                mstate = init_model_state(sp)
                tx = optax.adamw(8e-4, weight_decay=0.1)
                opt_state = tx.init(params)
                tstep = make_train_step(sp, tx, 0.1)
                xs = jnp.asarray(
                    np.random.default_rng(1)
                    .normal(size=(8, 1024, sp.D)).astype(np.float32))
                w = jnp.ones((1024,), jnp.float32)

                @jax.jit
                def steps_scan(params, opt_state, mstate, xs):
                    def body(carry, x):
                        params, opt_state, mstate = carry
                        params, opt_state, mstate, out = tstep(
                            params, opt_state, mstate, x, w)
                        return (params, opt_state, mstate), out.total_loss

                    carry, losses = jax.lax.scan(
                        body, (params, opt_state, mstate), xs)
                    return losses.sum()

                float(steps_scan(params, opt_state, mstate, xs))
                t0 = time.perf_counter()
                float(steps_scan(params, opt_state, mstate, xs))
                log(f"train_step_ms_{tag}",
                    round((time.perf_counter() - t0) / 8 * 1e3, 2))
            except Exception as e:
                log(f"train_step_ms_{tag}", f"failed: {type(e).__name__}: {e}")

    if "kmeans20" in steps:
        # one Lloyd E+M accumulation at K=2^20, D=128 over 4M device rows:
        # projected niter=100 wall-clock for the VERDICT scale anchor
        import jax.numpy as jnp

        # NB: `ops/__init__` re-exports the `kmeans` *function*, which
        # shadows the module on attribute access — go via sys.modules.
        import qinco_tpu.ops.kmeans  # noqa: F401

        km = sys.modules["qinco_tpu.ops.kmeans"]

        try:
            K20 = 1 << 20
            D = 128
            rows = 1 << 22
            chunk = 1 << 17
            rng = np.random.default_rng(0)
            cent = jnp.asarray(rng.normal(size=(K20, D)).astype(np.float32))
            x3 = jnp.asarray(
                rng.normal(size=(rows // chunk, chunk, D)).astype(np.float32))
            w3 = jnp.ones((rows // chunk, chunk), jnp.float32)
            sums = jnp.zeros((K20 + 1, D), jnp.float32)
            counts = jnp.zeros((K20 + 1,), jnp.float32)
            s, c = km._accumulate_megabatch(
                x3, w3, cent, sums, counts, K=K20, chunk=chunk)
            float(np.asarray(c[:1])[0])  # compile + warm
            t0 = time.perf_counter()
            s, c = km._accumulate_megabatch(
                x3, w3, cent, sums, counts, K=K20, chunk=chunk)
            float(np.asarray(c[:1])[0])
            dt = time.perf_counter() - t0
            log("kmeans20_EM_s_per_4Mrows", round(dt, 2))
            log("kmeans20_projected_100iter_10M_min",
                round(dt * (10_000_000 / rows) * 100 / 60, 1))
        except Exception as e:
            log("kmeans20", f"failed: {type(e).__name__}: {e}")

    if "approx" in steps:
        safe("approx_beam_vec_per_s",
             lambda: round(_throughput(base.with_(approx_beam=True)), 1))
        safe("approx_perbin_vec_per_s",
             lambda: round(
                 _throughput(base.with_(approx_beam=True, perbin=True)), 1))
        exact = base.with_(fast=False, pallas=False, fused_substep=False,
                           compute_dtype="float32")
        m_exact = _mse(exact)
        safe("mse_approx_beam_delta_pct",
             lambda: round(
                 100 * (_mse(base.with_(approx_beam=True)) / m_exact - 1), 3))

    if "perbin" in steps:
        # end-to-end encode throughput with the per-bin kernel chain
        safe("perbin_vec_per_s",
             lambda: round(_throughput(base.with_(perbin=True)), 1))
        # baseline re-sample to bound session noise
        safe("fused_vec_per_s_b", lambda: round(_throughput(base, seed=3), 1))
        # direct kernel timing at several row tiles
        import jax.numpy as jnp

        from qinco_tpu.models import init_params
        from qinco_tpu.ops.pallas_kernels import fused_substep_scores_pallas

        params = init_params(jax.random.PRNGKey(0), base)
        p = jax.tree.map(lambda a: a[1], params.steps)
        N, B, A, D = 4096, base.B, base.A, base.D
        NF = N * B
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
        xh0 = jnp.asarray(rng.normal(size=(NF, D)).astype(np.float32) * 0.1)
        for pb in (False, True):
            tiles = (256, 512) if not pb else (256, 512, 1024, 2048)
            for rt in tiles:
                sp = base.with_(perbin=pb)

                def call(xh, _sp=sp, _rt=rt):
                    return fused_substep_scores_pallas(
                        _sp, x, xh, p.sub_codebook, p.codebook, p.in_proj,
                        p.concat_w, p.concat_w2, p.concat_b, p.ffn_up,
                        p.ffn_down, p.out_proj, n_codes=A, beams=B,
                        row_tile=_rt,
                    ).sum()

                @jax.jit
                def run(xh):
                    def body(acc, i):
                        return acc + call(
                            xh * (1.0 + i.astype(jnp.float32) * 1e-6)), None

                    acc, _ = jax.lax.scan(
                        body, jnp.zeros((), jnp.float32), jnp.arange(10))
                    return acc

                try:
                    float(np.asarray(run(xh0)))
                    t0 = time.perf_counter()
                    float(np.asarray(run(xh0)))
                    dt = (time.perf_counter() - t0) / 10
                    log(f"kernel_{'perbin' if pb else 'blocked'}_rt{rt}_ms",
                        round(dt * 1e3, 3))
                except Exception as e:
                    log(f"kernel_{'perbin' if pb else 'blocked'}_rt{rt}_ms",
                        f"failed: {type(e).__name__}")

    if "rt" in steps:
        # full-encode row-tile sweep at the production batch (1024):
        # spec.row_tile overrides the VMEM-budget auto tile in
        # _beam_step_fused — grid-pipelining depth vs per-tile VMEM.
        pb = base.with_(perbin=True)
        for rt in (128, 256, 512):
            safe(f"perbin_b1024_rt{rt}_vec_per_s",
                 lambda rt=rt: round(_throughput(
                     pb.with_(row_tile=rt), batch=1024, n_iter=32), 1))
        for rt in (256, 512):
            safe(f"sel_b1024_rt{rt}_vec_per_s",
                 lambda rt=rt: round(_throughput(
                     sel.with_(row_tile=rt), batch=1024, n_iter=32), 1))

    if "sg" in steps:
        # supergroup block-diagonal fetch variants (see kernel_variants)
        from scripts.kernel_variants import run_perbin, run_sgfetch

        try:
            log("sg8_256_ms", round(run_sgfetch("sg8@256", 10, S=8) * 1e3, 3))
            log("sg4_256_ms", round(run_sgfetch("sg4@256", 10, S=4) * 1e3, 3))
            log("perbin_512_ms",
                round(run_perbin("perbin@512", 10, row_tile=512) * 1e3, 3))
        except Exception as e:
            log("sg", f"failed: {type(e).__name__}: {e}")

    if "tpusearch" in steps:
        # TPU-path search sweep on the 10M scale artifacts (split-LUT
        # native scan + fused mid-rerank landed after the last TPU-path
        # measurement; re-measure for the docs table).
        out = "/root/scale10m"
        if not Path(f"{out}/index.qivf").exists():
            log("tpusearch", "skipped: no scale artifacts")
        else:
            import run_qinco

            try:
                run_qinco.main([
                    "task=search", f"model={out}/model.npz",
                    f"ivf_centroids={out}/ivf.npy", f"index={out}/index.qivf",
                    f"queries={out}/queries.npy", f"queries_gt={out}/gt.npy",
                    f"pairwise_decoder={out}/pairwise_shrunk.npz",
                    f"output={out}/results_tpu_split.json",
                    "search.nprobe=[4,16,64]", "search.nshort=[10,100]",
                    "search.nmid_short=[1,3]", "search.quantizer_efSearch=[]",
                    "search.nthreads=0", "verbose=true", "resume=true",
                ])
                res = json.loads(
                    Path(f"{out}/results_tpu_split.json").read_text())
                log("tpusearch_points", [
                    {"p": r["parameters"], "R@1": r["recalls"]["1"],
                     "t": r["t_total"]}
                    for r in res["ivf_real_res"]])
            except Exception as e:
                log("tpusearch", f"failed: {type(e).__name__}: {e}")

    if "profile" in steps:
        import subprocess

        r = subprocess.run(
            [sys.executable, "scripts/profile_encode.py", "--iters", "10"],
            capture_output=True, text=True, cwd=Path(__file__).parent.parent,
        )
        log("profile_stdout", r.stdout.strip().splitlines()[-12:])

    Path(args.out).write_text(json.dumps(RESULTS, indent=1))
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
