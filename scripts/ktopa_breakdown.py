#!/usr/bin/env python
"""Phase breakdown of the in-kernel exact top-A (ktopa) scoring kernel.

VERDICT r4 #4 targets >=80k vec/s at exact-topA numerics; the production
`ktopa_fsel` rung measures 68.4k.  FLOP accounting (QINCo2-S, D=de=128,
dh=256, L=2, A=16, B=32, no in/out proj):

  per candidate row: fetch (R,K)@(K,D) 65.5k + wfold 32.7k + 2xFFN 262k
                     = 360k FLOPs  (binned kernel: 213k via G-wide fetch
                     + fold_up, which exactness cannot use)
  per vector       : 512 rows x 8 steps = 1.47 GFLOP  ->  at 68k vec/s
                     this is ~51% of 197T bf16 peak, ABOVE the binned
                     kernel's 47%.

So the gap to the binned rung is FLOP-structural, and the road to 80k is
either a FLOP cut (none found: every fold trick multiplies the full-K
fetch by more than it saves) or pushing MFU toward 60%.  This experiment
isolates where the non-MXU time goes:

  full       : production selected_scores_pallas(sub_codebook=...) route
  noextract  : extraction loop replaced by a data-dependent but
               reduction-free winner pick (mask = tile == row_a broadcast)
               -- isolates the A-round min/removal chain's cost
  deferred   : rounds do min+removal only; fetch masks rebuilt from the
               ORIGINAL packed tile after the loop (packed values are
               pairwise distinct per column, so tile==m_a is still the
               winner's exact one-hot) -- tests VPU/MXU scheduling
  tournament : extraction over (A, R) bin minima with per-round refold
               (fewer reduction ops per round, same full-tile removal)

Timing protocol: scan-readback (scripts/kernel_variants.py) — iters
dispatches ride one jitted lax.scan with per-step input variation, host
readback forces completion on the axon transport.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qinco_tpu.models.spec import QincoSpec
from qinco_tpu.ops.pallas_kernels import (
    _pack_ids_f32,
    _round_up,
    selected_scores_pallas,
)

SPEC = QincoSpec(
    D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32,
    fast=True, pallas=True, fused_topa=True, compute_dtype="bfloat16",
)
N = 1024  # production bench batch


def make_inputs(seed):
    rng = np.random.default_rng(seed)
    spec = SPEC
    NF = N * spec.B
    D, K, De, Dh, L = spec.D, spec.K, spec.De, spec.dh, spec.L
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    return dict(
        x=f(N, D), xh=f(NF, D), sub_codebook=f(K, D), codebook=f(K, D),
        concat_w=f(De + D, De), concat_b=f(De),
        ffn_up=f(L, De, Dh), ffn_down=f(L, Dh, De),
    )


def timeit(fn, kw0, iters):
    @jax.jit
    def run(kw):
        def body(acc, i):
            kw_i = dict(kw)
            kw_i["x"] = kw["x"] * (1.0 + i.astype(jnp.float32) * 1e-6)
            return acc + fn(**kw_i), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters)
        )
        return acc

    float(np.asarray(run(kw0)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(kw0)))
    return (time.perf_counter() - t0) / iters


# --------------------------------------------------------------------------
# variant kernel: the production lean-fetch ktopa body with a mode switch
# --------------------------------------------------------------------------


def ktopa_kernel(spec, A, beams, mode, x_ref, xh_ref, sc_ref, tab_ref,
                 wfold_ref, w2_ref, cb_ref, fu_ref, fd_ref, dist_ref):
    R = xh_ref.shape[0]
    K = sc_ref.shape[0]
    D = spec.D
    dt = jnp.dtype(spec.compute_dtype)

    xv = x_ref[:].astype(jnp.float32)
    xv = jnp.broadcast_to(xv[:, None, :], (R // beams, beams, D)).reshape(R, D)
    xh = xh_ref[:].astype(jnp.float32)
    r = xv - xh
    C = sc_ref[:]
    cn2 = jnp.sum(C * C, axis=1)[:, None]
    d_sub = cn2 - 2.0 * jax.lax.dot_general(
        C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, R)
    rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
    cur0 = _pack_ids_f32(d_sub, rowk)
    tab0 = tab_ref[:].astype(dt)
    INF = jnp.float32(jnp.inf)

    rows, fetches = [], []
    if mode == "noextract":
        # data-dependent (not constant-foldable) winner pick with ZERO
        # reduction work: slot a's "winner" is whatever value sits in
        # tile row a (packed values are pairwise distinct per column, so
        # the equality mask has exactly one hit) — fetch + MLP unchanged.
        for a in range(A):
            m = cur0[a:a + 1]  # (1, R)
            rows.append(m)
            mask = cur0 == m
            fetches.append(jax.lax.dot_general(
                mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
    elif mode == "full":
        cur = cur0
        for _ in range(A):
            m = jnp.min(cur, axis=0, keepdims=True)
            rows.append(m)
            mask = cur == m
            fetches.append(jax.lax.dot_general(
                mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
            cur = jnp.where(mask, INF, cur)
    elif mode == "deferred":
        cur = cur0
        for _ in range(A):
            m = jnp.min(cur, axis=0, keepdims=True)
            rows.append(m)
            cur = jnp.where(cur == m, INF, cur)
        for a in range(A):
            mask = cur0 == rows[a]  # winner one-hot in the ORIGINAL tile
            fetches.append(jax.lax.dot_general(
                mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
    elif mode in ("mlponly", "nodist", "shell"):
        # winner values taken straight from tile rows (reduction-free, as
        # noextract) and the fetch replaced by a data-dependent but
        # matmul-free broadcast of A codebook rows: isolates the one-hot
        # fetch matmuls' cost (mlponly) and additionally the final
        # distance reduction's cost (nodist).  shell = nodist minus the
        # MLP chain too (everything but the matmul work).
        for a in range(A):
            rows.append(cur0[a:a + 1])
        # ONE real one-hot fetch (slot 0), broadcast to all A slots:
        # data-dependent (not constant-foldable) with 1/16 the fetch cost
        mask = cur0 == rows[0]
        f0 = jax.lax.dot_general(
            mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # (R, D)
        fetches.append(
            jnp.broadcast_to(f0[None], (A, R, D)).reshape(A * R, D))
    elif mode == "perslot":
        # Exact extraction, but each round's fetch immediately runs its
        # OWN MLP + distance on (R, .) slabs — the `perbin` rung's
        # restructure (qinco_tpu/ops/pallas_kernels.py perbin branch)
        # applied to the exact path: the (A*R, D) cond/xv broadcasts and
        # the sublane concat of 16 (R, D) fetch blocks all disappear;
        # only A (1, R) distance rows concatenate at the end.
        cc_cond = jnp.dot(
            xh.astype(dt), w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )
        ccb_s = cc_cond + cb_ref[0, :]  # (R, De)
        ccb_dt = ccb_s.astype(dt)
        cur = cur0
        d_rows = []
        for _ in range(A):
            m = jnp.min(cur, axis=0, keepdims=True)
            rows.append(m)
            mask = cur == m
            fet = jax.lax.dot_general(
                mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, D) f32
            cur = jnp.where(mask, INF, cur)
            cand_a = fet
            h_a = (jnp.dot(fet.astype(dt), wfold_ref[:].astype(dt),
                           preferred_element_type=jnp.float32)
                   + ccb_s).astype(dt)
            for l in range(spec.L):
                up = jnp.dot(h_a, fu_ref[l].astype(dt),
                             preferred_element_type=jnp.float32)
                up = jnp.maximum(up, 0.0).astype(dt)
                down = jnp.dot(up, fd_ref[l].astype(dt),
                               preferred_element_type=jnp.float32)
                h_a = h_a + down.astype(dt)
            diff = r - h_a.astype(jnp.float32) - cand_a
            d_rows.append(jnp.sum(diff * diff, axis=-1)[None, :])  # (1, R)
        vals = jnp.concatenate(rows, axis=0)
        ids = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(vals, jnp.int32), jnp.int32(0xFF)
        )
        d = jnp.concatenate(d_rows, axis=0)  # (A, R)
        dist_ref[:] = _pack_ids_f32(d, ids).T
        return
    elif mode == "catfetch":
        # extraction as in full, but ALL fetch masks concatenated along
        # sublanes and contracted in ONE (A*R, K) @ (K, D) matmul
        cur = cur0
        masks = []
        for _ in range(A):
            m = jnp.min(cur, axis=0, keepdims=True)
            rows.append(m)
            mask = cur == m
            masks.append(mask)
            cur = jnp.where(mask, INF, cur)
        big = jnp.concatenate(
            [mk.T.astype(dt) for mk in masks], axis=0)  # (A*R, K)
        fetches.append(jnp.dot(
            big, tab0, preferred_element_type=jnp.float32).astype(dt))
    elif mode == "tournament":
        G = K // A
        ds3 = cur0.reshape(A, G, R)
        binm = ds3[:, 0]
        for g in range(1, G):
            binm = jnp.minimum(binm, ds3[:, g])  # (A, R)
        for _ in range(A):
            m = jnp.min(binm, axis=0, keepdims=True)  # (1, R)
            rows.append(m)
            mask3 = ds3 == m[None]  # (A, G, R)
            fetches.append(jax.lax.dot_general(
                mask3.reshape(K, R).astype(dt), tab0,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
            ds3 = jnp.where(mask3, INF, ds3)
            binm = ds3[:, 0]
            for g in range(1, G):
                binm = jnp.minimum(binm, ds3[:, g])
    else:
        raise ValueError(mode)

    vals = jnp.concatenate(rows, axis=0)  # (A, R)
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(vals, jnp.int32), jnp.int32(0xFF)
    )

    cc_cond = jnp.dot(
        xh.astype(dt), w2_ref[:].astype(dt),
        preferred_element_type=jnp.float32,
    )
    ccb = cc_cond + cb_ref[0, :]
    ext = jnp.concatenate(fetches, axis=0) if len(fetches) > 1 else fetches[0]
    cand = ext.astype(jnp.float32)
    De = ccb.shape[1]
    if mode == "shell":
        # everything except the matmul work: winner values, casts,
        # broadcasts, distance reduction on the raw candidate block
        out = cand
    else:
        h_cand = jnp.dot(
            ext, wfold_ref[:].astype(dt), preferred_element_type=jnp.float32
        )
        h = (h_cand
             + jnp.broadcast_to(ccb[None], (A, R, De)).reshape(A * R, De)
             ).astype(dt)
        for l in range(spec.L):
            up = jnp.dot(h, fu_ref[l].astype(dt),
                         preferred_element_type=jnp.float32)
            up = jnp.maximum(up, 0.0).astype(dt)
            down = jnp.dot(up, fd_ref[l].astype(dt),
                           preferred_element_type=jnp.float32)
            h = h + down.astype(dt)
        out = h.astype(jnp.float32) + cand
    if mode == "nodist":
        d = jnp.sum(out, axis=-1).reshape(A, R)  # cheap lane reduce, no
        # diff/square chain or xv/cond broadcasts
        dist_ref[:] = _pack_ids_f32(jnp.abs(d) + 1.0, ids).T
        return
    cond = jnp.broadcast_to(xh[None], (A, R, D)).reshape(A * R, D)
    diff = jnp.broadcast_to(xv[None], (A, R, D)).reshape(A * R, D) - out - cond
    d = jnp.sum(diff * diff, axis=-1).reshape(A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T


def run_variant(mode, iters, row_tile):
    spec = SPEC
    A, B, D, De = spec.A, spec.B, spec.D, spec.De
    NF = N * B
    kw0 = make_inputs(0)

    def call(**kw):
        dt = jnp.dtype(spec.compute_dtype)
        beams = B
        pad = _round_up(NF, row_tile) - NF
        n_tiles = (NF + pad) // row_tile
        eye = jnp.eye(D, dtype=jnp.float32)
        w1 = kw["concat_w"][:De]
        wfold = (eye + w1).astype(dt)
        w2 = kw["concat_w"][De:].astype(dt)
        ops = [kw["x"], kw["xh"], kw["sub_codebook"],
               kw["codebook"].astype(dt), wfold, w2,
               kw["concat_b"].reshape(1, -1),
               kw["ffn_up"].astype(dt), kw["ffn_down"].astype(dt)]
        full = lambda a: pl.BlockSpec(
            a.shape, lambda i: tuple(0 for _ in a.shape),
            memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((row_tile // beams, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(ops[2]), full(ops[3]), full(ops[4]), full(ops[5]),
            full(ops[6]), full(ops[7]), full(ops[8]),
        ]
        out = pl.pallas_call(
            lambda *refs: ktopa_kernel(spec, A, beams, mode, *refs[:-1],
                                       refs[-1]),
            out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((row_tile, A), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(*ops)
        return out.sum()

    jitted = jax.jit(call)
    dt_s = timeit(lambda **kw: jitted(**kw), kw0, iters)
    name = f"{mode}@rt{row_tile}"
    print(f"{name:22s}: {dt_s*1e3:8.3f} ms/step "
          f"({N/dt_s/1e3:.1f}k row-steps/s)", flush=True)
    return dt_s


def run_production(iters, row_tile):
    spec = SPEC.with_(row_tile=row_tile)
    kw0 = make_inputs(0)

    def call(**kw):
        return selected_scores_pallas(
            spec, kw["x"], kw["xh"], None, kw["codebook"], None,
            kw["concat_w"], kw["concat_b"], kw["ffn_up"], kw["ffn_down"],
            None,
            n_codes=spec.A, beams=spec.B, row_tile=row_tile,
            sub_codebook=kw["sub_codebook"],
        ).sum()

    jitted = jax.jit(call)
    dt_s = timeit(lambda **kw: jitted(**kw), kw0, iters)
    print(f"{'production@rt%d' % row_tile:22s}: {dt_s*1e3:8.3f} ms/step",
          flush=True)
    return dt_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--variants", type=str,
        default="production,full,noextract,deferred,tournament")
    ap.add_argument("--row-tiles", type=str, default="512")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    results = {}
    for rt in [int(r) for r in args.row_tiles.split(",")]:
        for v in args.variants.split(","):
            t0 = time.perf_counter()
            try:
                if v == "production":
                    dt_s = run_production(args.iters, rt)
                else:
                    dt_s = run_variant(v, args.iters, rt)
                results[f"{v}@rt{rt}"] = round(dt_s * 1e3, 4)
            except Exception as e:  # noqa: BLE001 - record and continue
                msg = str(e).splitlines()[0][:160]
                print(f"{v}@rt{rt}: ERROR {msg}", flush=True)
                results[f"{v}@rt{rt}"] = f"error: {msg}"
            print(f"  (wall {time.perf_counter()-t0:.1f}s)", flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(
            {"utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
             "batch": N, "ms_per_step": results}, indent=1))


if __name__ == "__main__":
    main()
