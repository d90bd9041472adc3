#!/usr/bin/env python
"""Benchmark: QINCo2-S beam-search encode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "profile": ..., "mse_delta_pct": ..., "numerics": ...,
   ["parity_profile": ..., "parity_vec_per_s": ...]}

Baseline: the only end-to-end encode throughput figure published inside
the reference repo — 1M x 256-d vectors in 349.6 s ~= 2,860 vec/s on one
GPU (reference: qinco_v1/docs/PQ_QINCo.md:62; see BASELINE.md).  Our
metric is the QINCo2-S full pipeline (substep pre-selection A=16, beam
B=32, M=8 steps, K=256, D=128) which does strictly more work per vector
than that baseline's PQ variant.

Quality qualifier (round-3 advisor finding): profiles differ in code-
selection numerics.  Each rung carries its measured reconstruction-MSE
delta vs the exact f32 profile on a *trained* checkpoint
(bench_artifacts/trained_mse_2026-08-18.log, scripts/trained_mse_check.py),
and the emitted JSON line names the headline's numerics + MSE delta so
round-over-round and vs_baseline numbers are interpretable.  When the
headline rung uses binned (non-parity) selection and budget remains, the
best parity-numerics rung is ALSO measured and reported alongside.

Outage resilience (rounds 2 and 4 both lost their number to silent axon
pool outages — BENCH_r02.json rc=124, BENCH_r04.json rc=3):
- the run STARTS with a cheap liveness probe (tiny non-Pallas op in a
  subprocess, ~10s when healthy): round 4 showed the outage presents as
  a silent indefinite hang on ANY device op, with no error marker — so
  probing before the ladder is the only way to tell "pool dead" from
  "slow Mosaic compile".  A dead pool enters a sleep/retry loop for the
  whole remaining budget (a pool that recovers mid-window still yields
  a number) instead of burning 690s on doomed Pallas rungs;
- each profile runs in its OWN subprocess with a hard wall-clock budget,
  so one hung dial / Mosaic compile cannot eat the whole run;
- rungs are ordered fastest-measured-first; unproven kernels are probed
  only with leftover budget; when the post-probe budget is short the
  ladder is trimmed to cache-warm + cheap rungs;
- children share a persistent compile cache (~/.jax_cache) seeded by
  scripts/kernel_smoke.py; each child reports its compile time so
  cache hit/miss is visible in stderr;
- every run writes a structured record (probe timings, per-rung
  outcomes) to bench_artifacts/bench_last_run.json; a zero run
  additionally writes BENCH_OUTAGE.json at the repo root so a zero
  round is distinguishable from broken kernels;
- the final JSON line is emitted from the best profile that completed,
  even if later rungs died.

Usage:
  python bench.py                 # orchestrate (the driver runs this)
  python bench.py --profile NAME  # child mode: measure one profile
  python bench.py --probe         # child mode: liveness probe
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Profile ladder, ordered measured-good-first (every rung's throughput is
# a real-v5e measurement; mse_delta_pct is vs the exact f32 profile on a
# trained checkpoint, measured ON TPU in round 5
# (bench_artifacts/trained_mse_tpu_2026-08-20.log — VERDICT r4 #2).
# The binned-selection delta depends on the checkpoint's training
# state: +0.433% on the 2026-08-18 10M-run checkpoint, +0.072% on the
# longer-trained regeneration (TPU-measured) — the ladder carries the
# conservative (worst-observed) figure.
PROFILES = [
    # per-bin kernel + fused select/rebuild kernel (select_rebuild_pallas
    # replaces the XLA beam top_k + selected-beam recompute tail; beam
    # selection itself is EXACT, so numerics match the perbin rung):
    # 105.7k vec/s measured (b1024, select_tile 64, v5e 2026-08-20)
    dict(name="perbin_fsel", pallas=True, mse_delta_pct=0.433,
         numerics="binned", batch=1024,
         overrides=dict(fast=True, pallas=True, fused_substep=True,
                        compute_dtype="bfloat16", perbin=True,
                        fused_select=True)),
    # per-bin G-hot batched-matmul kernel: 99.4k vec/s measured (b1024)
    dict(name="perbin", pallas=True, mse_delta_pct=0.433, numerics="binned",
         batch=1024,
         overrides=dict(fast=True, pallas=True, fused_substep=True,
                        compute_dtype="bfloat16", perbin=True)),
    # Exact substep top-A IN-KERNEL (spec.fused_topa — exact iterative
    # extraction over the on-chip (K, R) packed-distance tile).  Deletes
    # the XLA (NF, K) HBM round-trip + top_k tail the selected rungs
    # paid, AND upgrades their numerics: the old rungs' fast profile
    # used approx_max_k, so their "exact-topA" label was approximate on
    # TPU (VERDICT r4 weak #2); here selection is exact by construction.
    # Round-5 per-slot restructure (each extraction round's fetch runs
    # its own (R, ·) MLP slab — no (A·R, D) broadcasts, the same
    # transformation that took the binned kernel 69.6k -> 99.1k) lifted
    # this rung 68.4k -> 95.7k vec/s (b1024, row_tile 512, v5e
    # 2026-08-20, bench_artifacts/ktopa_breakdown_r5d.json).
    dict(name="ktopa_fsel", pallas=True, mse_delta_pct=0.001,
         numerics="exact-topA", batch=1024,
         overrides=dict(fast=True, pallas=True, compute_dtype="bfloat16",
                        fused_topa=True, fused_select=True, row_tile=512)),
    # 90.3k vec/s measured (b1024, row_tile 512, per-slot; was 64.9k)
    dict(name="ktopa", pallas=True, mse_delta_pct=0.001,
         numerics="exact-topA", batch=1024,
         overrides=dict(fast=True, pallas=True, compute_dtype="bfloat16",
                        fused_topa=True, row_tile=512)),
    # exact top-A scoring + fused select/rebuild, external top-A via
    # XLA approx_max_k under fast=True: 83.5k vec/s measured (b1024,
    # per-slot kernel; was 59.4k blocked).  approx-topA numerics on TPU
    # (approx_max_k recall ~0.95; CPU lowers it to exact top-k — VERDICT
    # r4 weak #2); TPU-measured delta +0.001% on the 10M-run checkpoint
    # (bench_artifacts/trained_mse_tpu_2026-08-20.log).
    dict(name="selected_fsel", pallas=True, mse_delta_pct=0.001,
         numerics="approx-topA", batch=1024,
         overrides=dict(fast=True, pallas=True, compute_dtype="bfloat16",
                        fused_topa=False, fused_select=True)),
    # external-top-A selection kernel: 79.8k vec/s measured (b1024,
    # per-slot; was 58.0k blocked)
    dict(name="selected", pallas=True, mse_delta_pct=0.001,
         numerics="approx-topA", batch=1024,
         overrides=dict(fast=True, pallas=True, compute_dtype="bfloat16",
                        fused_topa=False)),
    # fused binned kernel (blocked (A·R, ·) form): 69.8k vec/s (b1024)
    dict(name="fused", pallas=True, mse_delta_pct=0.433, numerics="binned",
         batch=1024,
         overrides=dict(fast=True, pallas=True, fused_substep=True,
                        compute_dtype="bfloat16")),
    # fused without the folded-up table (narrower VMEM footprint)
    dict(name="fused_nofold", pallas=True, mse_delta_pct=0.433,
         numerics="binned", batch=1024,
         overrides=dict(fast=True, pallas=True, fused_substep=True,
                        compute_dtype="bfloat16", fold_up=False)),
    # XLA-only approximate-top-k pre-selection (no Pallas): fast compile.
    # 26.0k vec/s measured (b1024); TPU-measured delta +0.001%
    # (bench_artifacts/trained_mse_tpu_2026-08-20.log).
    dict(name="xla_fast", pallas=False, mse_delta_pct=0.001,
         numerics="approx-topA", batch=1024,
         overrides=dict(fast=True, compute_dtype="bfloat16")),
    # exact f32 — the MSE-delta reference point itself.  HIGHEST-
    # precision matmuls are ~6-pass-emulated on TPU and the gather-based
    # candidate path is slow, so the rung times a reduced vector count
    # (throughput is not its job; completing inside the smoke/bench
    # budget is — it blew the 420s budget at 32768 vectors, VERDICT r4
    # weak #3).
    dict(name="exact", pallas=False, mse_delta_pct=0.0, numerics="exact",
         batch=1024, n_total=4096,
         overrides=dict()),
]
# Numerics classes considered reference-parity for reporting purposes
# (selection differs from exact f32 only at floating-point ties).
PARITY_NUMERICS = ("exact", "exact-topA")

# The axon outage presents as either an instant RuntimeError mentioning
# UNAVAILABLE / failed-to-connect, or a silent multi-minute dial hang
# (the hang is handled by the per-profile timeout).
OUTAGE_MARKERS = ("UNAVAILABLE", "failed to connect", "Connection reset",
                  "DEADLINE_EXCEEDED", "Socket closed")

TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 840))
FIRST_RUNG_BUDGET_S = float(os.environ.get("BENCH_PROFILE_BUDGET_S", 420))
# Wall-clock held back from the Pallas ladder so the cheap non-Pallas
# rungs always get a real attempt (2026-08-19 rehearsal: three slow
# Mosaic compiles consumed the whole budget and the fallback loop was
# entered with 0s left).
FALLBACK_RESERVE_S = float(os.environ.get("BENCH_FALLBACK_RESERVE_S", 150))
# Liveness probe: a healthy pool answers in ~10s (device dial + one
# trivial compile); 75s of silence means the transport is down.
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_BUDGET_S", 75))
PROBE_RETRY_SLEEP_S = float(os.environ.get("BENCH_PROBE_RETRY_SLEEP_S", 45))
# Children share a persistent compilation cache: on slow-compile pool
# days a rung that timed out may still have seeded the cache, letting
# the retry (or the next session) skip the compile entirely.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.jax_cache"))


def measure_profile(overrides: dict, batch: int = 4096,
                    n_total: int = 32768):
    """Child mode: compile + time one profile.

    Returns ``(vec_per_s, compile_s)``.  ``batch`` is per-profile
    (measured-best): the per-bin kernel peaks at ~1024 rows — larger
    batches inflate the (N·F, ·) intermediates past cache residency
    and LOSE ~15% throughput (batch sweep 2026-08-19,
    bench_artifacts/tpu_session_r4_batch.json) — while the blocked
    kernels prefer 4096.  ``n_total`` sets the timed vector count
    (default 32768; the slow `exact` rung times 4096).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode as encode_n
    from qinco_tpu.models.spec import QincoSpec

    # QINCo2-S shapes by default; overrides may also change the model
    # shape (the kernel-smoke probe runs the M/L preset shapes too).
    kw = dict(D=128, K=256, M=8, L=2, de=128, dh=256, A=16, B=32)
    kw.update(overrides)
    spec = QincoSpec(**kw)
    params = init_params(jax.random.PRNGKey(0), spec)
    n_iter = max(1, n_total // batch)

    # One dispatch runs all batches (scan) and reduces to a scalar that
    # we materialize on the host: on the remote-TPU transport,
    # block_until_ready alone does NOT guarantee completion — only host
    # readback does.
    @jax.jit
    def encode_many(params, xs):
        def body(_, x):
            codes, _, _ = encode_n(params, spec, x)
            return None, codes.sum()

        _, sums = jax.lax.scan(body, None, xs)
        return sums.sum()

    xs = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(n_iter, batch, spec.D)).astype(np.float32))
    tc0 = time.perf_counter()
    float(encode_many(params, xs))  # compile + warm-up
    compile_s = time.perf_counter() - tc0
    t0 = time.perf_counter()
    float(encode_many(params, xs))  # host readback forces completion
    dt = time.perf_counter() - t0
    return batch * n_iter / dt, compile_s


def probe_device() -> None:
    """Child mode: one tiny non-Pallas device op + host readback.

    When the pool is healthy this completes in seconds (device dial +
    one trivial compile); during an axon outage it hangs silently —
    the parent's timeout is the detector."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.float32)
    s = float((x @ x).sum())
    print(json.dumps({
        "probe_ok": True, "sum": s,
        "backend": jax.default_backend(),
        "probe_s": round(time.perf_counter() - t0, 2),
    }), flush=True)


RUN_LOG = {"utc_start": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "probe_attempts": [], "rungs": [], "outcome": None}


def _write_run_log():
    RUN_LOG["utc_last_write"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    here = os.path.dirname(os.path.abspath(__file__))
    art = os.path.join(here, "bench_artifacts")
    try:
        os.makedirs(art, exist_ok=True)
        with open(os.path.join(art, "bench_last_run.json"), "w") as f:
            json.dump(RUN_LOG, f, indent=1)
        outage_path = os.path.join(here, "BENCH_OUTAGE.json")
        if RUN_LOG["outcome"] and RUN_LOG["outcome"].startswith("outage"):
            with open(outage_path, "w") as f:
                json.dump(RUN_LOG, f, indent=1)
        elif os.path.exists(outage_path):
            os.remove(outage_path)  # stale sidecar from an earlier outage
    except OSError:
        pass


def run_probe(budget_s: float) -> bool:
    """Liveness probe in a subprocess.  True = device transport is live."""
    t0 = time.perf_counter()
    rec = {"budget_s": round(budget_s, 1)}
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            capture_output=True, text=True, timeout=budget_s,
        )
        rec["rc"] = r.returncode
        rec["stderr_tail"] = (r.stderr or "")[-300:]
        for line in reversed(r.stdout.strip().splitlines() or [""]):
            try:
                d = json.loads(line)
                if d.get("probe_ok"):
                    rec.update(d)
            except (json.JSONDecodeError, TypeError, ValueError):
                continue
    except subprocess.TimeoutExpired:
        rec["rc"] = "timeout"
    rec["wall_s"] = round(time.perf_counter() - t0, 1)
    RUN_LOG["probe_attempts"].append(rec)
    # incremental write: an externally killed run still leaves a record
    # of everything up to the kill (round-2's rc=124 outer-timeout mode)
    _write_run_log()
    ok = bool(rec.get("probe_ok"))
    print(f"probe: {'ALIVE' if ok else 'DEAD'} "
          f"({rec.get('backend', '?')}, {rec['wall_s']}s)",
          file=sys.stderr, flush=True)
    return ok


def run_child(name: str, budget_s: float):
    """Run one profile in a subprocess.

    Returns (vec_per_s | None, outage_marker_seen, timed_out).
    """
    rec = {"name": name, "budget_s": round(budget_s, 1)}
    RUN_LOG["rungs"].append(rec)
    _write_run_log()  # incremental: record the attempt before it runs
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--profile", name],
            capture_output=True, text=True, timeout=budget_s,
        )
    except subprocess.TimeoutExpired:
        rec["result"] = f"timeout>{budget_s:.0f}s"
        _write_run_log()
        print(f"profile {name}: timeout after {budget_s:.0f}s",
              file=sys.stderr, flush=True)
        return None, False, True
    for line in reversed(r.stdout.strip().splitlines() or [""]):
        try:
            d = json.loads(line)
            if "vec_per_s" in d:
                rec["result"] = "ok"
                rec["vec_per_s"] = d["vec_per_s"]
                rec["compile_s"] = d.get("compile_s")
                _write_run_log()
                cs = d.get("compile_s")
                hit = "cache hit" if (cs is not None and cs < 15) else (
                    "cold compile" if cs is not None else "compile n/a")
                print(f"profile {name}: {d['vec_per_s']:.0f} vec/s "
                      f"(compile {cs}s — {hit})",
                      file=sys.stderr, flush=True)
                return float(d["vec_per_s"]), False, False
        except (json.JSONDecodeError, TypeError, ValueError):
            continue
    err_tail = (r.stderr or "")[-2000:]
    outage = any(m in err_tail for m in OUTAGE_MARKERS)
    last = err_tail.strip().splitlines()[-1] if err_tail.strip() else "?"
    rec["result"] = f"rc={r.returncode} outage={outage}"
    rec["stderr_tail"] = err_tail[-300:]
    _write_run_log()
    print(f"profile {name}: rc={r.returncode} outage={outage} | {last}",
          file=sys.stderr, flush=True)
    return None, outage, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", type=str, default=None)
    ap.add_argument("--probe", action="store_true")
    args = ap.parse_args()

    if args.probe:
        probe_device()
        return

    by_name = {p["name"]: p for p in PROFILES}
    if args.profile is not None:
        prof = by_name[args.profile]
        vps, compile_s = measure_profile(prof["overrides"],
                                         batch=prof.get("batch", 4096),
                                         n_total=prof.get("n_total", 32768))
        print(json.dumps({"vec_per_s": round(vps, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return

    # Consult the kernel smoke artifact (scripts/kernel_smoke.py) if one
    # exists: variants that failed their hardware probe go to the back
    # of the ladder rather than burning the budget up front.
    ladder = list(PROFILES)
    smoke_path = os.environ.get(
        "BENCH_SMOKE_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "KERNEL_SMOKE.json"))
    try:
        smoke = json.loads(open(smoke_path).read())["results"]
        ladder.sort(
            key=lambda p: smoke.get(p["name"], "ok").startswith("error"))
    except (OSError, ValueError, KeyError):
        pass

    t_start = time.perf_counter()

    def remaining():
        return TOTAL_BUDGET_S - (time.perf_counter() - t_start)

    # ---- liveness gate (round-4 lesson): a dead axon pool hangs every
    # device op silently, so the ladder would burn its whole budget on
    # doomed rungs.  Probe first; if dead, sleep/retry for as long as
    # the budget allows — a pool that recovers mid-window still yields
    # a number.
    alive = run_probe(min(PROBE_BUDGET_S, max(30.0, remaining() - 30)))
    while not alive and remaining() > PROBE_BUDGET_S + 45:
        time.sleep(min(PROBE_RETRY_SLEEP_S, max(5.0, remaining() - PROBE_BUDGET_S - 10)))
        alive = run_probe(min(PROBE_BUDGET_S, max(30.0, remaining() - 10)))
    if not alive:
        RUN_LOG["outcome"] = "outage: device transport never came up"
        _write_run_log()
        print("bench: device transport dead for the whole budget "
              "(see BENCH_OUTAGE.json)", file=sys.stderr)
        sys.exit(3)

    # Post-probe budget shapes the ladder: plenty left -> full ladder;
    # short (late pool recovery) -> cache-warm headline rung with a
    # tight budget, then the cheap non-Pallas rungs.
    best = None  # (vec_per_s, profile-dict)
    outage_strikes = 0
    attempted = set()
    for i, prof in enumerate(ladder):
        # hold back the fallback reserve from Pallas rungs so the cheap
        # non-Pallas rungs below always get a real attempt
        reserve = FALLBACK_RESERVE_S if prof["pallas"] else 0.0
        if remaining() - reserve < 60:
            # short window (late pool recovery): the headline rung still
            # gets one cache-warm shot — with the compile cache seeded by
            # the kernel smoke it completes in well under 90s — before
            # we fall back to the cheap rungs.
            if i == 0 and prof["pallas"] and remaining() > 180:
                budget = remaining() - 110
            else:
                continue
        else:
            budget = min(FIRST_RUNG_BUDGET_S if i == 0 else 300.0,
                         remaining() - reserve)
        attempted.add(prof["name"])
        vps, outage, timed_out = run_child(prof["name"], budget)
        if vps is not None:
            best = (vps, prof)
            # the ladder is ordered fastest-measured-first, so the first
            # rung that completes is the best available — stop there.
            break
        if outage:
            # explicit transport-outage signature: bounded retry, then
            # fall through to the cheap non-Pallas rungs below.
            outage_strikes += 1
            if outage_strikes >= 2:
                break
            time.sleep(20)
        # a bare timeout on a Pallas rung is NOT an outage signal (it can
        # be a slow Mosaic compile); just move on to the next rung.

    # No number yet: always give the cheap non-Pallas rungs (seconds of
    # compile time) one shot each before giving up — two slow Mosaic
    # compiles must not zero out the round (round-3 advisor finding).
    if best is None:
        for prof in ladder:
            if prof["pallas"] or prof["name"] in attempted:
                continue
            if remaining() < 45:
                break
            vps, _, _ = run_child(prof["name"], min(180.0, remaining()))
            if vps is not None:
                best = (vps, prof)
                break

    if best is None:
        RUN_LOG["outcome"] = ("outage: transport live but no profile "
                              "completed within budget")
        _write_run_log()
        print("bench: no profile completed within budget", file=sys.stderr)
        sys.exit(3)

    vec_per_s, prof = best
    baseline = 2860.0  # vec/s, reference PQ-QINCo encode on 1 GPU
    out = {
        "metric": "qinco2-S_encode_throughput_1chip",
        "value": round(vec_per_s, 1),
        "unit": "vectors/s",
        "vs_baseline": round(vec_per_s / baseline, 2),
        "profile": prof["name"],
        # quality qualifier: reconstruction-MSE delta vs exact f32 on a
        # trained checkpoint (scripts/trained_mse_check.py)
        "mse_delta_pct": prof["mse_delta_pct"],
        "numerics": prof["numerics"],
    }

    # If the headline is non-parity numerics, also measure the fastest
    # parity-numerics rung so a like-for-like number rides the record.
    if prof["numerics"] not in PARITY_NUMERICS and remaining() > 150:
        for pprof in ladder:
            if pprof["numerics"] in PARITY_NUMERICS:
                vps2, _, _ = run_child(
                    pprof["name"], min(300.0, remaining() - 20))
                if vps2 is not None:
                    out["parity_profile"] = pprof["name"]
                    out["parity_vec_per_s"] = round(vps2, 1)
                    out["parity_mse_delta_pct"] = pprof["mse_delta_pct"]
                break  # one attempt at the fastest parity rung only

    RUN_LOG["outcome"] = f"ok: {prof['name']} {out['value']} vec/s"
    _write_run_log()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
