"""Functional QINCo2 core: decode, beam-search encode, training forward.

One pure-functional implementation replaces the reference's three torch
module families sharing the same weights (training model
qinco/model/qinco_base.py:204-549, inference encoder/decoder
qinco/model/qinco_inference.py:19-354, TorchScript wrapper :257-354) —
``jax.jit`` specializes each entry point, so no separate "inference
optimized" model is needed.

TPU-first design decisions:
- **lax.scan over stacked step parameters**: every MLP step after the
  first runs identical static shapes ``(N, B, A', D)``, so the chain of M
  steps is a single compiled scan body instead of M unrolled modules.
- **Static shapes throughout**: beam width B, candidate count A', and the
  batch are compile-time constants; the final "take beam 0" replaces the
  reference's per-step F_out switch (qinco_base.py:310) because top-k
  returns candidates sorted ascending by distance — beam 0 of the last
  step *is* the argmin the reference computes.
- **f32 accumulation** on every matmul (``preferred_element_type``), with
  optional bf16 activations for the MLP (spec.compute_dtype).
- The code-history "repeat_interleave + gather" of the reference
  (qinco_inference.py:207-210) disappears entirely: each step records
  (codes, parent beam) and one O(M·N) reverse backtrace after the scan
  recovers the winning beam's history.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.distances import (
    batch_sqdist_partial,
    chunked_argmin,
    pairwise_sqdist_partial,
    sqdist_topk,
    topk_smallest,
)
from .params import QincoParams, StepParams
from .spec import QincoSpec


class EncodeStats(NamedTuple):
    """Per-MLP-step residual statistics feeding the EMA buffers
    (reference: qinco_base.py:292-304)."""

    xtarget_mean: jnp.ndarray  # (Ms, D)
    xtarget_std: jnp.ndarray  # (Ms, D)


# ---------------------------------------------------------------------------
# The per-step MLP ("implicit neural codebook" predictor)
# ---------------------------------------------------------------------------


def step_predict(
    spec: QincoSpec, p: StepParams, cand: jnp.ndarray, cond: jnp.ndarray
) -> jnp.ndarray:
    """Map raw codewords ``cand (..., A, D)`` conditioned on the current
    reconstruction ``cond (..., D)`` to predicted codewords (..., A, D).

    Mirrors QINCoStep.forward (reference: qinco_base.py:262-280):
    in_proj -> residual concat-MLP -> L residual FFN blocks -> out_proj
    [-> + raw codeword in QINCo2 mode].  Output is float32.
    """
    dt = jnp.dtype(spec.compute_dtype)
    h = cand.astype(dt)
    cond_b = jnp.broadcast_to(cond[..., None, :], cand.shape).astype(dt)

    if p.in_proj is not None:
        h = jnp.dot(h, p.in_proj.astype(dt), preferred_element_type=jnp.float32)
        h = h.astype(dt)

    cc = jnp.concatenate([h, cond_b], axis=-1)
    cc = jnp.dot(cc, p.concat_w.astype(dt), preferred_element_type=jnp.float32)
    if p.concat_w2 is not None:  # QINCo-LR low-rank factor
        cc = jnp.dot(
            cc.astype(dt), p.concat_w2.astype(dt),
            preferred_element_type=jnp.float32,
        )
    cc = cc + p.concat_b
    h = h + cc.astype(dt)

    for l in range(spec.L):
        up = jnp.dot(h, p.ffn_up[l].astype(dt), preferred_element_type=jnp.float32)
        up = jax.nn.relu(up).astype(dt)
        down = jnp.dot(up, p.ffn_down[l].astype(dt), preferred_element_type=jnp.float32)
        h = h + down.astype(dt)

    if p.out_proj is not None:
        out = jnp.dot(h, p.out_proj.astype(dt), preferred_element_type=jnp.float32)
    else:
        out = h.astype(jnp.float32)

    if spec.res_codeword_coeff:
        out = out + cand.astype(jnp.float32)
    return out


def step_decode(
    spec: QincoSpec, p: StepParams, codes: jnp.ndarray, xhat: jnp.ndarray
) -> jnp.ndarray:
    """Decode one step: predicted codeword for ``codes (N,)`` given
    ``xhat (N, D)`` (reference: qinco_base.py:282-290)."""
    cw = p.codebook[codes]  # (N, D)
    return step_predict(spec, p, cw[:, None, :], xhat)[:, 0]


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("spec",))
def decode(params: QincoParams, spec: QincoSpec, codes: jnp.ndarray) -> jnp.ndarray:
    """Additive decode of ``codes (M_ivf, N) -> xhat (N, D)`` in normalized
    space (reference: qinco_base.py:447-452, qinco_inference.py:66-75)."""
    assert codes.shape[0] == spec.M_ivf
    xhat = params.codebook0[codes[0]]

    def body(xhat, xs):
        p, c = xs
        return xhat + step_decode(spec, p, c, xhat), None

    xhat, _ = jax.lax.scan(body, xhat, (params.steps, codes[1:]))
    return xhat


def decode_raw(params: QincoParams, spec: QincoSpec, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode to raw data space (denormalized)."""
    return decode(params, spec, codes) * params.data_std + params.data_mean


# ---------------------------------------------------------------------------
# Beam-search encode
# ---------------------------------------------------------------------------


def _target_stats(x_target: jnp.ndarray, w: Optional[jnp.ndarray]):
    """Per-dim mean/std of the residual target, optionally weighted by the
    padding mask ``w (N,)`` so zero-padded rows don't skew the EMA buffers
    (reference computes them over real rows only: qinco_base.py:296-304)."""
    if w is None:
        return (
            jnp.mean(x_target, axis=(0, 1)),
            jnp.std(x_target, axis=(0, 1), ddof=1),
        )
    F_in = x_target.shape[1]
    n = w.sum() * F_in
    wf = w[:, None, None]
    # mean over the real rows; only the Bessel divisor needs a floor
    # (a single-row batch must not halve the mean fed into the EMA)
    t_mean = jnp.sum(x_target * wf, axis=(0, 1)) / jnp.maximum(n, 1.0)
    var = jnp.sum((x_target - t_mean) ** 2 * wf, axis=(0, 1)) / jnp.maximum(
        n - 1.0, 1.0
    )
    return t_mean, jnp.sqrt(var)


def _beam_step(
    spec: QincoSpec,
    p: StepParams,
    x: jnp.ndarray,  # (N, D) target
    xhat: jnp.ndarray,  # (N, F_in, D)
    F_out: int,
    n_codes: int,
    w: Optional[jnp.ndarray] = None,  # (N,) padding mask for the EMA stats
    want_stats: bool = True,
):
    """One beam-search step (reference: qinco_base.py:292-374).

    Returns ``(xhat_next, real, f_in_idx, (t_mean, t_std))`` where
    ``real (N, F_out)`` are the selected codebook ids and ``f_in_idx
    (N, F_out)`` the parent beam of each selection — the caller
    backtraces the code history once at the end instead of permuting a
    full (M, N, F) buffer every step (that gather was ~1.3 ms/step)."""
    if spec.has_substep() and _fused_substep_ok(spec, n_codes):
        # Selection fused into the scoring kernel (binned argmin); no
        # (NF, K) distance matrix or (NF, A) id array ever materializes
        # in HBM.
        return _beam_step_fused(
            spec, p, x, xhat, F_out, n_codes, None, w, want_stats
        )

    N, F_in, D = xhat.shape
    NF = N * F_in
    xh = xhat.reshape(NF, D)
    x_f = jnp.broadcast_to(x[:, None, :], (N, F_in, D)).reshape(NF, D)

    if spec.has_substep():
        if (
            spec.fused_topa
            and spec.fast
            and spec.pallas
            and spec.K <= 256
            and n_codes <= spec.K
            and p.concat_w2 is None
        ):
            # Exact in-kernel top-A (spec.fused_topa): the substep
            # distances AND their exact top-A extraction run inside the
            # selected-scores kernel — no (NF, K) HBM round-trip, no XLA
            # top_k/approx_max_k (which made the fast profile's
            # selection approximate; round-4 verdict weak #2).  Gated on
            # spec.fast: the in-kernel substep matmul runs at the
            # compute dtype (DEFAULT precision), which is the fast
            # profile's precision class — the non-fast parity route
            # keeps its HIGHEST-precision external distances + exact
            # top_k below.
            return _beam_step_fused(
                spec, p, x, xhat, F_out, n_codes, None, w, want_stats,
                exact_sub=True,
            )
        # Substep pre-selection: top n_codes fixed-codebook candidates for
        # the residual (reference: qinco_base.py:114-121).  Under the
        # opt-in fast profile the selection matmul runs at DEFAULT
        # precision (bf16-rounded inputs on TPU) — selection already
        # tolerates approx_max_k's ~0.95 recall there; the default
        # profile stays XLA-exact (HIGHEST).
        prec = (
            jax.lax.Precision.DEFAULT if spec.fast
            else jax.lax.Precision.HIGHEST
        )
        sub_d = pairwise_sqdist_partial(
            x_f - xh, p.sub_codebook, precision=prec
        )  # (NF, K)
        if spec.pallas and spec.K <= 256 and p.concat_w2 is None:
            # Exact-selection kernel route: pack each candidate's id into
            # its distance's low mantissa bits and select top-A *values* —
            # the scoring kernel unpacks ids itself, so no (NF, A) int32
            # array (sublane-padded 8x, ~2.5 ms/step) ever crosses HBM.
            from ..ops.pallas_kernels import _pack_ids_f32

            d_pk = _pack_ids_f32(
                sub_d, jnp.arange(spec.K, dtype=jnp.int32)[None, :]
            )
            if spec.fast:
                nvals, _ = jax.lax.approx_max_k(-d_pk, n_codes)
                vals = -nvals  # negation flips only the sign bit
            else:
                _, vals = topk_smallest(d_pk, n_codes)  # (NF, n)
            return _beam_step_fused(
                spec, p, x, xhat, F_out, n_codes, None, w, want_stats,
                sel_vals=vals.T,
            )
        if spec.fast:
            _, top_idx = jax.lax.approx_max_k(-sub_d, n_codes)
        else:
            top_idx, _ = topk_smallest(sub_d, n_codes)  # (NF, n)
        if spec.pallas:
            return _beam_step_fused(
                spec, p, x, xhat, F_out, n_codes, top_idx, w, want_stats
            )
        if spec.fast:
            # One-hot matmul rides the MXU; the gather unit is ~2x slower
            # for this (NF, A, D) materialization on TPU.
            oh = jax.nn.one_hot(top_idx, spec.K, dtype=jnp.bfloat16)
            cand = jnp.einsum(
                "nak,kd->nad",
                oh,
                p.codebook.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            cand = p.codebook[top_idx]  # (NF, n, D)
        A_eff = n_codes
    else:
        A_eff = spec.K
        cand = jnp.broadcast_to(p.codebook[None], (NF, spec.K, D))
        top_idx = None

    pred = step_predict(spec, p, cand, xh)  # (NF, A_eff, D) f32
    cand_abs = pred + xh[:, None, :]

    flat = cand_abs.reshape(N, F_in * A_eff, D)
    dists = batch_sqdist_partial(x[:, None, :], flat)[:, 0]  # (N, F_in*A_eff)
    sel, _ = _beam_topk(spec, dists, F_out)  # (N, F_out) ascending

    f_in_idx = sel // A_eff
    if top_idx is not None:
        real = jnp.take_along_axis(top_idx.reshape(N, F_in * A_eff), sel, axis=1)
    else:
        real = sel % spec.K

    xhat_next = jnp.take_along_axis(flat, sel[..., None], axis=1)  # (N, F_out, D)

    t_mean, t_std = _maybe_target_stats(spec, x, xhat, w, want_stats)
    return (xhat_next, real.astype(jnp.int32), f_in_idx.astype(jnp.int32),
            (t_mean, t_std))


def _beam_topk(spec: QincoSpec, dists: jnp.ndarray, k: int):
    """Smallest-k beam selection -> (indices, values) ascending.

    With spec.approx_beam, uses the TPU-native approximate top-k
    (jax.lax.approx_max_k on the negated tile, ~3x faster at (N, 512)).
    Negation flips only the sign bit, so distances that carry packed
    candidate ids in their low mantissa bits survive the round trip."""
    if spec.approx_beam and k < dists.shape[-1]:
        nvals, sel = jax.lax.approx_max_k(-dists, k)
        return sel, -nvals
    return topk_smallest(dists, k)


def _maybe_target_stats(spec, x, xhat, w, want_stats):
    """EncodeStats are a training-only product (they feed the EMA buffers
    for dead-code resets); inference encodes skip the (N, F, D) residual
    reduction entirely."""
    if not want_stats:
        z = jnp.zeros((x.shape[-1],), jnp.float32)
        return z, z
    x_target = x[:, None, :] - xhat  # (N, F_in, D)
    return _target_stats(x_target, w)


def _fused_substep_ok(spec: QincoSpec, n_codes: int) -> bool:
    return (
        spec.pallas
        and spec.fused_substep
        and 0 < n_codes <= spec.K <= 256
        and spec.K % n_codes == 0
        and spec.K & (spec.K - 1) == 0
        and n_codes & (n_codes - 1) == 0
    )


def _beam_step_fused(
    spec: QincoSpec,
    p: StepParams,
    x: jnp.ndarray,  # (N, D)
    xhat: jnp.ndarray,  # (N, F_in, D)
    F_out: int,
    n_codes: int,
    top_idx,  # (NF, n_codes) substep pre-selection | None
    w: Optional[jnp.ndarray] = None,
    want_stats: bool = True,
    sel_vals=None,  # (n_codes, NF) packed pre-selection values | None
    exact_sub: bool = False,  # exact in-kernel substep top-A
):
    """Pallas-kernel beam step: score all F·A candidates on-chip, then
    recompute reconstructions for only the F_out selected beams."""
    from ..ops.pallas_kernels import (
        _selected_perslot as _sel_perslot,
        candidate_scores_pallas,
        fused_substep_scores_pallas,
        select_rebuild_pallas,
        selected_scores_pallas,
    )

    N, F_in, D = xhat.shape
    NF = N * F_in
    xh = xhat.reshape(NF, D)
    x_f = jnp.broadcast_to(x[:, None, :], (N, F_in, D)).reshape(NF, D)
    interpret = jax.default_backend() != "tpu"

    # VMEM budget: the kernel's activations scale with row_tile * n_codes
    # (the fused MLP runs on R*A rows).  The fused-substep kernel keeps
    # its fetched candidate block in the compute dtype, which fits
    # R*A = 8192 under the 16MB scoped-vmem limit; the plain scoring
    # kernel's f32 activations overflow there, so it stays at 4096.
    if top_idx is None and sel_vals is None and not exact_sub:
        budget = 8192  # binned kernel: compute-dtype candidate block
        row_tile = spec.row_tile or max(
            8, min(512, budget // n_codes, _round_up_pow2(NF))
        )
    elif (sel_vals is not None or exact_sub) and _sel_perslot(spec):
        # Per-slot selected kernel: activations are (R, ·) per slot, so
        # VMEM no longer scales with n_codes — 512 is the measured-best
        # tile at the S shapes (1024 loses ~9%, 256 loses ~15%;
        # bench_artifacts/ktopa_breakdown_r5d.json).
        row_tile = spec.row_tile or max(8, min(512, _round_up_pow2(NF)))
    else:
        # The blocked selected/candidate kernels' f32 activations scale
        # with the MLP width; 4096 is calibrated at the S shapes
        # (de+dh = 384).  qinco2-M/L (de=dh=384) overflowed the 16MB
        # scoped-vmem limit by 1.9MB at that budget
        # (KERNEL_SMOKE 2026-08-20).
        budget = max(1024, 4096 * 384 // max(384, spec.De + spec.dh))
        row_tile = spec.row_tile or max(
            8, min(512, budget // n_codes, _round_up_pow2(NF))
        )
    if top_idx is None:
        pack_ids = True
        # Pass per-vector targets when the beam count divides the row
        # tile (the kernel broadcasts in VMEM); the (NF, D) broadcast
        # never reaches HBM.  The per-vector x block has row_tile/beams
        # rows and must respect the 8-sublane block minimum.
        beams = (
            F_in if row_tile % F_in == 0 and row_tile // F_in >= 8 else 1
        )
        if sel_vals is not None or exact_sub:
            dists_fa = selected_scores_pallas(
                spec, x if beams > 1 else x_f, xh, sel_vals, p.codebook,
                p.in_proj, p.concat_w, p.concat_b, p.ffn_up, p.ffn_down,
                p.out_proj,
                n_codes=n_codes,
                beams=beams,
                row_tile=row_tile,
                interpret=interpret,
                sub_codebook=p.sub_codebook if exact_sub else None,
            )
        else:
            dists_fa = fused_substep_scores_pallas(
                spec, x if beams > 1 else x_f, xh, p.sub_codebook, p.codebook,
                p.in_proj, p.concat_w, p.concat_w2, p.concat_b, p.ffn_up,
                p.ffn_down, p.out_proj,
                n_codes=n_codes,
                beams=beams,
                row_tile=row_tile,
                interpret=interpret,
            )
    else:
        pack_ids = spec.K <= 256
        dists_fa = candidate_scores_pallas(
            spec, x_f, xh, top_idx, p.codebook, p.in_proj, p.concat_w,
            p.concat_w2, p.concat_b, p.ffn_up, p.ffn_down, p.out_proj,
            row_tile=row_tile,
            interpret=interpret,
            pack_ids=pack_ids,
        )  # (NF, A) full squared distances

    A_eff = n_codes
    # Measured fallback bound (bench_artifacts/fsel_scaling.json, v5e
    # 2026-08-20): the select kernel wins +5-7% at F_out <= 32 and is
    # noise-level (speedup 0.98-1.03) through B=64-128 as the auto
    # vec_tile shrinks 64 -> 32 -> 16 — so it stays active across the
    # measured range and falls back only beyond it, where the auto
    # vec_tile would drop below 16 (F_out*F_in > 128*128) and the
    # quadratic one-hot parent gather is untested.  K > 256 (pack_ids
    # False) already falls back here.
    if (
        spec.fused_select
        and pack_ids
        and F_out <= F_in * A_eff
        and F_out * F_in <= 16384
    ):
        # Selection + rebuild fused on-chip: exact top-F_out extraction
        # over the packed distances, parent/codeword one-hot gathers and
        # the rebuild MLP all in VMEM — the XLA top_k + gather/recompute
        # tail below costs as much as the scoring kernel at production
        # shapes (bench_artifacts/profile_encode_2026-08-19.log).
        xhat_next, real, f_in_idx = select_rebuild_pallas(
            spec, dists_fa.reshape(N, F_in * A_eff), xh, p.codebook,
            p.in_proj, p.concat_w, p.concat_w2, p.concat_b, p.ffn_up,
            p.ffn_down, p.out_proj,
            A_eff=A_eff, F_out=F_out,
            vec_tile=spec.select_tile,
            interpret=interpret,
        )
        t_mean, t_std = _maybe_target_stats(spec, x, xhat, w, want_stats)
        return xhat_next, real, f_in_idx, (t_mean, t_std)

    dists = dists_fa.reshape(N, F_in * A_eff)
    sel, vals = _beam_topk(spec, dists, F_out)  # (N, F_out)

    f_in_idx = sel // A_eff
    if pack_ids:
        # The kernel packed each candidate's codebook id into the low 8
        # mantissa bits of its distance — read the winners' ids straight
        # out of the top-k values (the (NF, A) id gather it replaces was
        # a padded-lane relayout costing ~2.5 ms/step).
        real = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(vals, jnp.int32), jnp.int32(0xFF)
        )
    else:
        real = jnp.take_along_axis(
            top_idx.reshape(N, F_in * A_eff), sel, axis=1
        )

    # Recompute reconstructions for the selected beams only (F_out << F·A).
    xh_sel = jnp.take_along_axis(xhat, f_in_idx[..., None], axis=1)  # (N,F_out,D)
    cand_sel = p.codebook[real]  # (N, F_out, D)
    NB = N * F_out
    pred = step_predict(
        spec, p, cand_sel.reshape(NB, 1, D), xh_sel.reshape(NB, D)
    )  # (NB, 1, D)
    xhat_next = (pred[:, 0] + xh_sel.reshape(NB, D)).reshape(N, F_out, D)

    t_mean, t_std = _maybe_target_stats(spec, x, xhat, w, want_stats)
    return (xhat_next, real.astype(jnp.int32), f_in_idx.astype(jnp.int32),
            (t_mean, t_std))


def _round_up_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("spec", "ivf_chunk", "want_stats"))
def encode(
    params: QincoParams,
    spec: QincoSpec,
    x: jnp.ndarray,
    ivf_chunk: int = 65536,
    weights: Optional[jnp.ndarray] = None,
    want_stats: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, EncodeStats]:
    """Beam-search encode ``x (N, D)`` (normalized space).

    ``weights (N,)`` optionally masks zero-padded rows out of the
    EncodeStats (training passes its padding mask; eval leaves it None).
    ``want_stats=False`` (inference) skips the EncodeStats reductions and
    returns zeros in their place.
    Returns (codes (M_ivf, N) int32, xhat (N, D), EncodeStats).
    """
    # ---- step 0: plain codebook assignment --------------------------------
    if spec.ivf_in_use:
        # fast=spec.fast: the DEFAULT-precision (bf16-rounded) assignment is
        # part of the opt-in fast profile only; the default profile stays
        # XLA-exact (HIGHEST).
        codes0, _ = chunked_argmin(
            x, params.codebook0, chunk=ivf_chunk, fast=spec.fast
        )
        codes0 = codes0[:, None]  # (N, 1): beam enters the MLP chain at 1
    else:
        codes0, _ = sqdist_topk(x, params.codebook0, spec.beam0)  # (N, beam0)
    xhat = params.codebook0[codes0].astype(jnp.float32)  # (N, F0, D)
    return encode_from_coarse(
        params, spec, x, codes0, xhat, weights, want_stats=want_stats
    )


def encode_from_coarse(
    params: QincoParams,
    spec: QincoSpec,
    x: jnp.ndarray,
    codes0: jnp.ndarray,  # (N, F0) step-0 assignment
    xhat: jnp.ndarray,  # (N, F0, D) step-0 reconstruction
    weights: Optional[jnp.ndarray] = None,
    want_stats: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, EncodeStats]:
    """The MLP beam-search phases given an externally computed step-0
    assignment — entry point for custom coarse quantizers (e.g. the
    model-axis-sharded IVF book, parallel/sharded_ops.py)."""
    N, D = x.shape
    Ms = spec.n_mlp_steps

    if Ms == 0:
        return codes0[:, 0][None].astype(jnp.int32), xhat[:, 0], EncodeStats(
            jnp.zeros((0, D)), jnp.ones((0, D))
        )

    # ---- first MLP step: expands the beam F0 -> B (specialized shapes) ----
    p0 = jax.tree.map(lambda a: a[0], params.steps)
    xhat, real1, par1, (m0, s0) = _beam_step(
        spec, p0, x, xhat, F_out=spec.B, n_codes=spec.n_codes_at(0),
        w=weights, want_stats=want_stats,
    )

    # ---- remaining MLP steps: uniform scan at beam B ----------------------
    if Ms > 1:
        rest = jax.tree.map(lambda a: a[1:], params.steps)
        n_codes = spec.n_codes_at(1)

        def body(xhat, p):
            xhat, real, par, stats = _beam_step(
                spec, p, x, xhat, F_out=spec.B, n_codes=n_codes,
                w=weights, want_stats=want_stats,
            )
            return xhat, (real, par, stats)

        xhat, (reals, pars, (means, stds)) = jax.lax.scan(body, xhat, rest)
        means = jnp.concatenate([m0[None], means])
        stds = jnp.concatenate([s0[None], stds])
    else:
        reals = pars = None
        means, stds = m0[None], s0[None]

    # ---- backtrace the winning beam's code history ------------------------
    # Beams are sorted ascending by distance: beam 0 of the last step is
    # the argmin the reference materializes via F_out=1 on the last step.
    # Each step recorded (real codes, parent beam); one reverse walk
    # recovers beam 0's full history — O(M·N) gathers instead of the
    # O(M·N·F) history permute the reference does per step
    # (qinco_inference.py:207-210).
    if spec.approx_beam:
        # The per-step approximate top-k may mis-rank its survivors:
        # re-select the final beam by an exact argmin over the B
        # survivors' true distances (cheap: one (N, F) reduction), then
        # collapse xhat to that beam so the return below stays beam 0.
        d_fin = jnp.sum((x[:, None, :] - xhat) ** 2, axis=-1)  # (N, F)
        beam = jnp.argmin(d_fin, axis=1).astype(jnp.int32)
        xhat = jnp.take_along_axis(xhat, beam[:, None, None], axis=1)
    else:
        beam = jnp.zeros((N,), jnp.int32)

    def bt(beam, rp):
        real, par = rp
        code = jnp.take_along_axis(real, beam[:, None], axis=1)[:, 0]
        prev = jnp.take_along_axis(par, beam[:, None], axis=1)[:, 0]
        return prev, code

    if reals is not None:
        beam, codes_rest = jax.lax.scan(bt, beam, (reals, pars), reverse=True)
    else:
        codes_rest = None
    beam, code1 = bt(beam, (real1, par1))
    code0 = jnp.take_along_axis(
        codes0.astype(jnp.int32), beam[:, None], axis=1
    )[:, 0]
    rows = [code0[None], code1[None]]
    if codes_rest is not None:
        rows.append(codes_rest)
    codes = jnp.concatenate(rows, axis=0)  # (M_ivf, N)

    return codes, xhat[:, 0], EncodeStats(means, stds)


@functools.lru_cache(maxsize=1)
def _get_encode_ivf_sharded_jit():
    """Module-level jitted wrapper: wrapping per call would create a
    fresh PjitFunction with an empty trace cache for every chunk of a
    sharded billion-scale encode (round-5 review finding)."""
    from ..parallel.sharded_ops import encode_ivf_sharded

    return jax.jit(encode_ivf_sharded, static_argnames=("mesh", "spec"))


def _encode_ivf_sharded_jit(mesh, params, spec, x_n):
    return _get_encode_ivf_sharded_jit()(mesh, params, spec, x_n)


def encode_raw(
    params: QincoParams, spec: QincoSpec, x: jnp.ndarray, *, mesh=None, **kw
) -> jnp.ndarray:
    """Encode raw-space vectors; returns codes only (reference model(x,
    step='encode'), qinco_base.py:532-534).

    With ``mesh`` (model axis > 1) the IVF codebook is expected sharded
    and step 0 runs via the shard_map path (parallel/sharded_ops.py).
    """
    x_n = (x - params.data_mean) / params.data_std
    if mesh is not None and spec.ivf_in_use and mesh.shape.get("model", 1) > 1:
        codes, _, _ = _encode_ivf_sharded_jit(mesh, params, spec, x_n)
        return codes
    codes, _, _ = encode(params, spec, x_n, **kw)
    return codes


def default_encode_batch(spec: QincoSpec, enc_max_bs: int = 65536) -> int:
    """Vector micro-batch under the candidate-tensor memory budget
    (reference: qinco_base.py:454-472)."""
    return max(1, enc_max_bs // (spec.B * (spec.A or 1)))


@functools.partial(jax.jit, static_argnames=("spec",))
def _encode_raw_scan(params, spec, xs):
    """Scan encode_raw over stacked chunks ``xs (G, bs, D)`` in ONE
    dispatch -> codes (G, M_ivf, bs).  On the remote-TPU transport each
    dispatch costs tens of ms of round-trip latency; at the billion-scale
    encode's chunk sizes that overhead dominated device time (measured
    17k vec/s task throughput vs 62k kernel throughput on the 10M run;
    36k task-level after round 5's fused select + jit hoist,
    bench_artifacts/scale_report_v4_2026-08-20.json), so chunks are
    grouped G at a time."""

    def body(_, x):
        return None, encode_raw(params, spec, x)

    _, codes = jax.lax.scan(body, None, xs)
    return codes


def encode_chunked(
    params: QincoParams,
    spec: QincoSpec,
    x,
    *,
    batch: int | None = None,
    enc_max_bs: int = 65536,
    pipeline_depth: int = 4,
    group: int = 8,
    mesh=None,
):
    """Host-side driver: encode any-length ``x`` in fixed-shape chunks
    (one compiled shape), zero-padding the tail.  Returns codes (M_ivf, N).

    Dispatch is pipelined ``pipeline_depth`` groups ahead so host<->device
    transfers overlap device compute (synchronous per-chunk readback
    serialized the billion-scale encode on remote transports), and chunks
    are grouped ``group`` at a time into one scan dispatch to amortize
    per-dispatch transport latency.  ``mesh`` routes step 0 through the
    sharded-IVF path (see encode_raw) and disables grouping (shard_map
    under scan is not exercised by the sharded-ops tests).
    """
    import collections

    import numpy as np

    n = len(x)
    bs = batch or default_encode_batch(spec, enc_max_bs)
    group = 1 if mesh is not None else max(1, group)
    out = np.empty((spec.M_ivf, n), dtype=np.int32)

    in_flight: collections.deque = collections.deque()

    def drain_one():
        slots, codes = in_flight.popleft()
        codes = np.asarray(codes)  # (G, M_ivf, bs) — one transfer per group
        for j, (i, n_valid) in enumerate(slots):
            out[:, i : i + n_valid] = codes[j][:, :n_valid]

    def pad(chunk):
        chunk = np.asarray(chunk, dtype=np.float32)
        if len(chunk) < bs:
            chunk = np.concatenate(
                [chunk, np.zeros((bs - len(chunk), chunk.shape[1]), np.float32)]
            )
        return chunk

    starts = list(range(0, n, bs))
    for g0 in range(0, len(starts), group):
        g = starts[g0 : g0 + group]
        slots = [(i, min(bs, n - i)) for i in g]
        if len(g) == group and group > 1:
            xs = np.stack([pad(x[i : i + bs]) for i in g])
            codes = _encode_raw_scan(params, spec, jnp.asarray(xs))
        elif mesh is not None:
            # sharded path: per-chunk dispatch (no scan)
            for i, n_valid in slots:
                c = encode_raw(params, spec, jnp.asarray(pad(x[i : i + bs])),
                               mesh=mesh)
                in_flight.append(([(i, n_valid)], c[None]))
                if len(in_flight) > pipeline_depth:
                    drain_one()
            continue
        else:
            # tail group smaller than `group`: one scan at its own shape
            xs = np.stack([pad(x[i : i + bs]) for i in g])
            codes = _encode_raw_scan(params, spec, jnp.asarray(xs))
        in_flight.append((slots, codes))
        if len(in_flight) > pipeline_depth:
            drain_one()
    while in_flight:
        drain_one()
    return out


# ---------------------------------------------------------------------------
# Training forward (losses)
# ---------------------------------------------------------------------------


def train_losses(
    params: QincoParams,
    spec: QincoSpec,
    x: jnp.ndarray,
    codes: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, dict]:
    """Per-step decode losses given fixed codes
    (reference: qinco_base.py:487-503, 376-383).

    ``x`` is in normalized space; ``codes`` come from a no-grad encode.
    ``weights (N,)`` optionally masks padded rows.
    Returns (total_loss, dict of scalar losses).
    """
    N = x.shape[0]
    if weights is None:
        weights = jnp.ones((N,), jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0) * spec.D

    def wmean(sq_err):  # sq_err (N, D)
        return jnp.sum(sq_err * weights[:, None]) / denom

    codebook0 = params.codebook0
    if spec.ivf_in_use:
        codebook0 = jax.lax.stop_gradient(codebook0)  # frozen IVF book
    xhat = codebook0[codes[0]]

    losses = {}
    if not spec.ivf_in_use:
        losses["mse_loss_step0"] = wmean((xhat - x) ** 2)

    def body(xhat, xs):
        p, c = xs
        xhat_prev = xhat
        xhat = xhat + step_decode(spec, p, c, xhat)
        mse = wmean((xhat - x) ** 2)
        if spec.has_substep():
            # Substep loss trains the fixed pre-selection codebook to chase
            # the residual (reference: qinco_base.py:123-125, 376-383).
            sub_rec = jax.lax.stop_gradient(xhat_prev) + p.sub_codebook[c]
            sub = wmean((sub_rec - x) ** 2)
        else:
            sub = jnp.float32(0.0)
        return xhat, (mse, sub)

    xhat, (mses, subs) = jax.lax.scan(body, xhat, (params.steps, codes[1:]))

    losses["mse_loss"] = jnp.sum(mses) + losses.pop("mse_loss_step0", 0.0)
    if spec.has_substep():
        losses["loss_substep"] = jnp.sum(subs)
    total = sum(losses.values())
    return total, {**losses, "xhat": xhat}


def train_forward(
    params: QincoParams, spec: QincoSpec, x_raw: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, dict, EncodeStats]:
    """Full training forward: normalize, no-grad encode, decode losses
    (reference: qinco_base.py:524-531)."""
    x = (x_raw - params.data_mean) / params.data_std
    codes, _, stats = encode(
        jax.lax.stop_gradient(params), spec, x, want_stats=True
    )
    total, aux = train_losses(params, spec, x, codes)
    return total, codes, aux, stats
