"""Pallas TPU kernels for the QINCo encode hot path.

Kernel K2 (SURVEY.md §7): the fused candidate-scoring kernel.  The XLA
path materializes, per step, the (N·F, A, D) candidate tensor and every
MLP intermediate in HBM — multi-GB of traffic per step at production
shapes.  This kernel keeps the step's weights and codebook resident in
VMEM, streams row tiles of (x, xhat, candidate indices), runs the whole
MLP chain (codebook lookup via one-hot MXU matmul -> in_proj -> residual
concat block -> L FFN blocks -> out_proj -> +codeword -> +xhat) on-chip,
and writes back only the (rows, A) candidate distances — the only thing
beam search actually ranks on.

The beam step then recomputes reconstructions for just the B selected
candidates (B << F·A) with the plain XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spec import QincoSpec


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _live_plumbing(pairs):
    """Shared pallas_call plumbing for optional operands.

    ``pairs`` is ``[(operand | None, BlockSpec | None), ...]`` in kernel
    argument order.  Returns ``(live_operands, live_specs, unpack)``
    where ``unpack(refs)`` re-expands the positional kernel refs to the
    full argument list with ``None`` at absent positions — replacing the
    hand-maintained ``has_* / next(it)`` bookkeeping each wrapper used
    to copy (round-5 review: that positional threading breaks silently
    when an operand is added to one list but not the other)."""
    present = [o is not None for o, _ in pairs]

    def unpack(refs):
        it = iter(refs)
        return [next(it) if p else None for p in present]

    return (
        [o for o, _ in pairs if o is not None],
        [s for (o, s) in pairs if o is not None],
        unpack,
    )


def _mlp_chain(
    spec: QincoSpec,
    cand,  # (RA, D) f32 raw codewords
    cond,  # (RA, D) f32 current reconstruction, repeated A times
    in_proj_ref,
    concat_w_ref,
    concat_w2_ref,
    concat_b_ref,
    ffn_up_ref,
    ffn_down_ref,
    out_proj_ref,
):
    """The per-candidate MLP (shared by both scoring kernels); returns the
    absolute candidate reconstructions ``cand_abs (RA, D)`` f32."""
    dt = jnp.dtype(spec.compute_dtype)

    h = cand.astype(dt)
    if in_proj_ref is not None:
        h = jnp.dot(
            h, in_proj_ref[:].astype(dt), preferred_element_type=jnp.float32
        ).astype(dt)

    cc = jnp.concatenate([h, cond.astype(dt)], axis=-1)
    cc = jnp.dot(
        cc, concat_w_ref[:].astype(dt), preferred_element_type=jnp.float32
    )
    if concat_w2_ref is not None:  # QINCo-LR low-rank factor
        cc = jnp.dot(
            cc.astype(dt), concat_w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )
    cc = cc + concat_b_ref[0, :]
    h = h + cc.astype(dt)

    for l in range(spec.L):
        up = jnp.dot(
            h, ffn_up_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        up = jnp.maximum(up, 0.0).astype(dt)
        down = jnp.dot(
            up, ffn_down_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        h = h + down.astype(dt)

    if out_proj_ref is not None:
        out = jnp.dot(
            h, out_proj_ref[:].astype(dt), preferred_element_type=jnp.float32
        )
    else:
        out = h.astype(jnp.float32)

    if spec.res_codeword_coeff:
        out = out + cand
    return out + cond  # (RA, D) f32


def _selected_perslot(spec: QincoSpec) -> bool:
    """Whether the selected-scores kernel uses the per-slot (R, ·) slab
    form (no (A·R, D) broadcasts — measured 3.26 -> 2.50 ms/step at
    QINCo2-S) instead of the blocked (A·R, ·) form.  Per-slot unrolls
    A·(2L+2) matmuls, so deep presets (qinco2-L, L=16) keep the blocked
    form — there the MLP FLOPs dominate and the broadcast overhead is a
    small fraction.  Callers size row tiles off this too: per-slot
    activations are (R, ·) per slot, so VMEM no longer scales with A."""
    return spec.L <= 4


def _pack_ids_f32(d, ids):
    """Steal the 8 low mantissa bits of distances ``d`` (>= 0) for the
    candidate ids (K <= 256): the beam step then reads the winning
    codebook ids straight out of the top-k *values* — no (NF, A) id
    gather / relayout (that padded-16-lane reshape+gather cost
    ~2.5 ms/step).  d >= 0, so float ordering == int-bit ordering;
    masking only perturbs ranking on ~2^-15-relative ties, and
    reconstructions are recomputed exactly for the selected beams.

    Values with |d| < 1e-30 are first pushed to ±1e-30 (a normal f32):
    an exactly-zero distance (e.g. a zeroed dead codebook row under the
    partial-distance form, which can also be negative) would pack to a
    *subnormal* (~1e-43), and TPU VPU flush-to-zero could then strip
    the id bits from a min result and break the pairwise-distinct
    invariant the equality-mask fetches rely on.  The push preserves
    ordering (negatives stay below positives) and such values tie at
    ±1e-30, distinct via the id bits."""
    tiny = jnp.float32(1e-30)
    d = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    di = jax.lax.bitcast_convert_type(d, jnp.int32)
    di = jnp.bitwise_or(jnp.bitwise_and(di, jnp.int32(~0xFF)), ids)
    return jax.lax.bitcast_convert_type(di, jnp.float32)


def _cand_scores_kernel(
    spec: QincoSpec,
    x_ref,  # (R, D) target rows
    xh_ref,  # (R, D) current reconstruction rows
    idx_ref,  # (R*A, 1) int32 candidate codebook ids (pre-flattened)
    codebook_ref,  # (K, D)
    in_proj_ref,  # (D, De) or None
    concat_w_ref,  # (De + D, De) or (De + D, rank)
    concat_w2_ref,  # (rank, De) or None
    concat_b_ref,  # (1, De)
    ffn_up_ref,  # (L, De, Dh)
    ffn_down_ref,  # (L, Dh, De)
    out_proj_ref,  # (De, D) or None
    dist_ref,  # (R, A) output: ||x - (MLP(cand|xh) + xh)||^2
    *,
    pack_ids: bool = False,
):
    R, A = dist_ref.shape
    K = codebook_ref.shape[0]
    D = spec.D
    dt = jnp.dtype(spec.compute_dtype)

    # One-hot candidate materialization on the MXU (RA, K) @ (K, D).
    # The candidate ids arrive pre-flattened as (R·A, 1) so the one-hot
    # builds as one clean 2D lane-dim iota compare — the earlier
    # (R, A, K) rank-3 build + reshape was the kernel's VPU bottleneck
    # (bad (A, K) tiling, ~60% of kernel time).
    idx = idx_ref[:]  # (RA, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R * A, K), dimension=1)
    onehot = (col == idx).astype(dt)  # (RA, K)
    cand = jnp.dot(
        onehot, codebook_ref[:].astype(dt), preferred_element_type=jnp.float32
    )  # (RA, D) f32

    # Condition rows repeated A times: (R, D) -> (R, A, D) -> (RA, D).
    xh = xh_ref[:].astype(jnp.float32)
    cond = jnp.broadcast_to(xh[:, None, :], (R, A, D)).reshape(R * A, D)

    cand_abs = _mlp_chain(
        spec, cand, cond, in_proj_ref, concat_w_ref, concat_w2_ref,
        concat_b_ref, ffn_up_ref, ffn_down_ref, out_proj_ref,
    )
    diff = jnp.broadcast_to(
        x_ref[:].astype(jnp.float32)[:, None, :], (R, A, D)
    ).reshape(R * A, D) - cand_abs
    d = jnp.sum(diff * diff, axis=-1, keepdims=True)  # (RA, 1) >= 0
    if pack_ids:
        d = _pack_ids_f32(d, idx)
    dist_ref[:] = d.reshape(R, A)


def _fused_substep_kernel(
    spec: QincoSpec,
    A: int,  # candidate count = bin count (n_codes)
    beams: int,  # beam rows per vector (x_ref holds R/beams vector rows)
    off_h: int,  # lane offset of the h-init slice in the fused table
    off_w1: int,  # lane offset of the W1·h slice (== table width when the
    #               W1 product is folded into the h slice, see below)
    off_up: int,  # lane offset of the first-FFN-up slice (0 = not folded)
    x_ref,  # (R/beams, D) per-vector targets
    xh_ref,  # (R, D)
    sub_codebook_ref,  # (K, D)
    table_ref,  # (K, Wt) fused per-codeword table [C | C·P | C·P·W1]
    w2_ref,  # (D, cw_out) condition half of the concat weight
    concat_w2_ref,
    concat_b_ref,
    ffn_up_ref,
    ffn_down_ref,
    out_proj_ref,
    dist_ref,  # (R, A) packed distances
):
    """Substep pre-selection fused into candidate scoring.

    Replaces the XLA chain residual -> (NF, K) partial distances ->
    top-A (reference: qinco_base.py:114-121) with an in-kernel *binned*
    argmin: the K codewords split into A contiguous bins of G = K/A and
    each bin contributes its best candidate.  Nothing (no (NF, K)
    distance matrix, no (NF, A) id array) ever leaves VMEM.

    Mosaic has no lane-dim-changing reshapes, so the selection runs
    TRANSPOSED: partial distances come out of ``dot_general`` as
    (K, R) with the codeword index on the *sublane* axis; the K axis
    then splits into (A, G, R) — a leading-dim reshape, which is legal —
    and an unrolled min over the G slabs yields the per-bin minima
    (A, R).  Ids ride the low 8 mantissa bits (``_pack_ids_f32``), so
    the min value *is* the argmin (distinct ids => distinct bit
    patterns, exact deterministic tie-break).  MLP rows run bin-major
    (A·R, D) and only the final (A, R) distance tile is transposed back
    to the (R, A) output block.

    Candidate materialization exploits two structural redundancies the
    reference's per-row MLP (qinco_inference.py:178-188) cannot:

    * The concat layer splits as ``cc = W1·h + W2·cond + b`` and the
      candidate half ``W1·h`` has only K distinct values per step — so
      ``[C | C·P | C·P·W1]`` is precomputed once per step (P = in_proj
      or identity) and fetched per candidate, and the condition half
      ``W2·cond`` is computed on the R condition rows instead of A·R
      candidate rows.  The concat matmul vanishes from the per-row cost.
    * The fetch itself contracts over the G-wide bin, not all K: the
      per-bin selection mask (``ds3 == m``, exactly one hit per bin —
      packed ids make values pairwise distinct) is already laid out
      (A, G, R), so each bin's slab multiplies straight into its G rows
      of the table — 16x fewer one-hot FLOPs than the previous
      (A·R, K) @ (K, D) one-hot, and no (A, R, K) VPU iota compare.

    (A lane-local masked ``pltpu.roll`` min-tree formulation of the same
    selection blew past the 16MB scoped-VMEM limit at compile time —
    58MB of temporaries — and an iterative masked-argmin hung the
    compiler outright; this formulation compiles in normal time.)

    Note this changes the pre-selection semantics vs exact top-A (best
    per bin instead of global top-A) — it is the opt-in
    ``fused_substep`` profile.
    """
    R = xh_ref.shape[0]
    K = sub_codebook_ref.shape[0]
    D = spec.D
    G = K // A  # bin width
    dt = jnp.dtype(spec.compute_dtype)

    # ---- substep partial distances (K, R) on the MXU ----------------------
    # The target rows arrive one per *vector* and broadcast to the beam
    # rows in VMEM — the XLA path materialized the (NF, D) broadcast in
    # HBM (~67 MB write + read per step at production shapes).
    xv = x_ref[:].astype(jnp.float32)  # (R/beams, D)
    xv = jnp.broadcast_to(
        xv[:, None, :], (R // beams, beams, D)
    ).reshape(R, D)
    xh = xh_ref[:].astype(jnp.float32)
    r = xv - xh  # residual target (R, D)
    C = sub_codebook_ref[:]
    cn2 = jnp.sum(C * C, axis=1)[:, None]  # (K, 1)
    d_sub = cn2 - 2.0 * jax.lax.dot_general(
        C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, R) partial: ranking-equivalent to true sqdist per row

    # Pack ids into the low bits => per-bin values pairwise distinct.
    rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
    ds_p = _pack_ids_f32(d_sub, rowk)

    # ---- per-bin argmin as an unrolled min over G leading-dim slabs -------
    ds3 = ds_p.reshape(A, G, R)
    m = ds3[:, 0]
    for g in range(1, G):
        m = jnp.minimum(m, ds3[:, g])  # (A, R) packed bin minima
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(m, jnp.int32), jnp.int32(0xFF)
    )  # (A, R) absolute codeword ids

    # ---- per-bin fused-table fetch, bin-major rows (a*R + r) --------------
    # The winner mask is exact (packed values are pairwise distinct inside
    # a bin); slab a contracts over its own G table rows.
    mask3 = ds3 == m[:, None, :]  # (A, G, R), one hit per (a, ., r)
    tab = table_ref[:].astype(dt).reshape(A, G, -1)

    if spec.perbin and off_up:
        # Per-bin post-selection chain (spec.perbin): fetch -> MLP ->
        # distance runs bin-by-bin on (R, .) slabs.  Exact reformulation
        # of the blocked form below — every bin shares the same R
        # condition rows, so the (A*R, Wt) ext concat and all (A, R, .)
        # broadcasts disappear; only A (1, R) distance rows concatenate
        # at the end.  Costs A-way unrolled (smaller) matmuls instead.
        # (r above is the residual target: ||x - (out + cand + xh)||^2
        # == ||r - out - cand||^2.)
        cc_cond = jnp.dot(
            xh.astype(dt), w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, De)
        ccb = cc_cond + concat_b_ref[0, :]  # (R, De) f32
        up_cond = jnp.dot(
            ccb.astype(dt), ffn_up_ref[0].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, Dh)
        outs = []
        for a in range(A):
            fetch = jax.lax.dot_general(
                mask3[a].astype(dt), tab[a], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, Wt) f32
            cand = fetch[:, :D]
            h = (fetch[:, off_h:off_up] + ccb).astype(dt)
            up1 = jnp.maximum(fetch[:, off_up:] + up_cond, 0.0).astype(dt)
            down = jnp.dot(
                up1, ffn_down_ref[0].astype(dt), preferred_element_type=jnp.float32
            )
            h = h + down.astype(dt)
            for l in range(1, spec.L):
                up = jnp.dot(
                    h, ffn_up_ref[l].astype(dt), preferred_element_type=jnp.float32
                )
                up = jnp.maximum(up, 0.0).astype(dt)
                down = jnp.dot(
                    up, ffn_down_ref[l].astype(dt), preferred_element_type=jnp.float32
                )
                h = h + down.astype(dt)
            if out_proj_ref is not None:
                out = jnp.dot(
                    h, out_proj_ref[:].astype(dt),
                    preferred_element_type=jnp.float32,
                )
            else:
                out = h.astype(jnp.float32)
            diff = r - out
            if spec.res_codeword_coeff:
                diff = diff - cand
            outs.append(jnp.sum(diff * diff, axis=-1)[None, :])  # (1, R)
        d = jnp.concatenate(outs, axis=0)  # (A, R)
        dist_ref[:] = _pack_ids_f32(d, ids).T
        return
    # Slab outputs cast to the compute dtype before the concat: the fetch
    # is exact row selection of an already-dt-rounded table (one-hot
    # contraction), so nothing is lost, and the bf16 ext halves both the
    # concat copy and ~4MB of scoped VMEM — which is what lets the row
    # tile reach 512 without overflowing the 16MB limit.
    ext = jnp.concatenate(
        [
            jax.lax.dot_general(
                mask3[a].astype(dt), tab[a], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            for a in range(A)
        ],
        axis=0,
    )  # (A·R, Wt) dt: [cand | h-init | W1·h]
    cand = ext[:, :D]
    Wt = ext.shape[1]
    start_l = 0
    if off_up:
        # Materialize the codeword slice in f32 now so the wide ext
        # buffer's last use is up1 below and its VMEM can be reclaimed
        # through the FFN chain.
        cand = cand.astype(jnp.float32)
        # Folded-W1 + folded-first-up table
        # [C | C·P·(I+W1) | C·P·(I+W1)·W_up0]: the first FFN block's
        # up-projection splits linearly over h = h_cand + h_cond, and
        # h_cand has only K distinct values per step — so its up product
        # rides the fetch (G-wide contraction, 16x cheaper than the
        # (A·R, De)@(De, Dh) matmul it deletes, ~24% of the kernel's MXU
        # work) while the condition half runs on the R condition rows.
        cc_cond = jnp.dot(
            xh.astype(dt), w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, De)
        ccb = cc_cond + concat_b_ref[0, :]  # (R, De) f32
        cw = ccb.shape[1]
        h_in = (
            ext[:, off_h:off_up]
            + jnp.broadcast_to(ccb[None], (A, R, cw)).reshape(A * R, cw)
        ).astype(dt)
        up_cond = jnp.dot(
            ccb.astype(dt), ffn_up_ref[0].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, Dh)
        dh = up_cond.shape[1]
        up1 = jnp.maximum(
            ext[:, off_up:]
            + jnp.broadcast_to(up_cond[None], (A, R, dh)).reshape(A * R, dh),
            0.0,
        ).astype(dt)
        down = jnp.dot(
            up1, ffn_down_ref[0].astype(dt), preferred_element_type=jnp.float32
        )
        h = h_in + down.astype(dt)
        start_l = 1
    elif off_w1 >= Wt:
        # Folded-W1 table [C | C·P·(I+W1)] (built by the wrapper when
        # there is no low-rank factor): the candidate half of the concat
        # layer collapsed into the h slice, since
        #   h = h0 + h0·W1 + cond·W2 + b = h0·(I+W1) + cond·W2 + b.
        # One 128-lane fetch column replaces the CP and CP·W1 columns —
        # a third fewer fetch-matmul passes and a third less ext VMEM.
        cc_cond = jnp.dot(
            xh.astype(dt), w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, De)
        cw = cc_cond.shape[1]
        h = (
            ext[:, off_h:]
            + jnp.broadcast_to(
                (cc_cond + concat_b_ref[0, :])[None], (A, R, cw)
            ).reshape(A * R, cw)
        ).astype(dt)
    else:
        h = ext[:, off_h:off_w1].astype(dt) if off_h else cand.astype(dt)
        w1h = ext[:, off_w1:]  # (A·R, cw_out)

        # Condition half of the concat layer on the R condition rows only.
        cw = w1h.shape[1]
        cc_cond = jnp.dot(
            xh.astype(dt), w2_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        )  # (R, cw_out)
        cc = w1h + jnp.broadcast_to(
            cc_cond[None], (A, R, cw)
        ).reshape(A * R, cw)
        if concat_w2_ref is not None:  # QINCo-LR low-rank factor
            cc = jnp.dot(
                cc.astype(dt), concat_w2_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )
        h = h + (cc + concat_b_ref[0, :]).astype(dt)

    # FFN matmuls accumulate f32 (Mosaic requires 32-bit matmul
    # accumulators on TPU) and cast back to the compute dtype.
    for l in range(start_l, spec.L):
        up = jnp.dot(
            h, ffn_up_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        up = jnp.maximum(up, 0.0).astype(dt)
        down = jnp.dot(
            up, ffn_down_ref[l].astype(dt), preferred_element_type=jnp.float32
        )
        h = h + down.astype(dt)

    if out_proj_ref is not None:
        out = jnp.dot(
            h, out_proj_ref[:].astype(dt), preferred_element_type=jnp.float32
        )
    else:
        out = h.astype(jnp.float32)
    if spec.res_codeword_coeff:
        out = out + cand

    cond = jnp.broadcast_to(xh[None], (A, R, D)).reshape(A * R, D)
    cand_abs = out + cond
    diff = jnp.broadcast_to(xv[None], (A, R, D)).reshape(A * R, D) - cand_abs
    d = jnp.sum(diff * diff, axis=-1).reshape(A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T  # (R, A)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "n_codes", "beams", "row_tile", "interpret"),
)
def fused_substep_scores_pallas(
    spec: QincoSpec,
    x: jnp.ndarray,  # (NF/beams, D) per-vector targets
    xh: jnp.ndarray,  # (NF, D)
    sub_codebook: jnp.ndarray,  # (K, D)
    codebook: jnp.ndarray,  # (K, D)
    in_proj,
    concat_w,
    concat_w2,
    concat_b,
    ffn_up,
    ffn_down,
    out_proj,
    n_codes: int,
    beams: int = 1,
    row_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused substep-selection + candidate scoring.

    ``x`` holds one row per vector; each covers ``beams`` consecutive
    rows of ``xh`` (requires beams | row_tile).  Returns (NF, n_codes)
    distances with the candidate codebook id packed in the low 8
    mantissa bits (always; requires K <= 256 and K % n_codes == 0, both
    powers of two)."""
    NF, D = xh.shape
    K = codebook.shape[0]
    A = n_codes
    if K > 256 or K % A or (K & (K - 1)) or (A & (A - 1)):
        raise ValueError("fused substep requires power-of-2 K <= 256, A | K")
    if row_tile % beams or x.shape[0] * beams != NF:
        raise ValueError("beams must divide row_tile and x rows * beams == NF")
    pad = _round_up(NF, row_tile) - NF
    if pad:
        x = jnp.pad(x, ((0, pad // beams), (0, 0)))
        xh = jnp.pad(xh, ((0, pad), (0, 0)))
    n_tiles = (NF + pad) // row_tile

    # Fused per-codeword table [C | C·P | C·P·W1] (see kernel docstring):
    # the concat layer's candidate half has only K distinct values per
    # step, so it is precomputed here (tiny (K, ·) matmuls, hoisted as a
    # constant subgraph by XLA) and fetched per candidate in-kernel.
    dt = jnp.dtype(spec.compute_dtype)
    h_w = in_proj.shape[1] if in_proj is not None else D
    w1 = concat_w[:h_w]
    w2 = concat_w[h_w:]  # condition half, passed separately
    if in_proj is not None:
        cp = jnp.dot(codebook.astype(dt), in_proj.astype(dt),
                     preferred_element_type=jnp.float32)
    else:
        cp = codebook
    cpw1 = jnp.dot(cp.astype(dt), w1.astype(dt),
                   preferred_element_type=jnp.float32)
    off_up = 0
    if concat_w2 is None:
        # Fold W1 into the h column: h = h0·(I+W1) + cond·W2 + b (see the
        # kernel docstring) — table [C | C·P·(I+W1)], off_w1 == width
        # signals the folded layout.  (With the low-rank factor the W1
        # product must stay separate: it passes through concat_w2 before
        # joining the residual stream.)
        h_cand = cp + cpw1
        pieces = [codebook, h_cand]
        off_h = D
        off_w1 = D + h_w
        if spec.L >= 1 and spec.fold_up:
            # Fold the first FFN up-projection of the candidate half too
            # (see the kernel's off_up branch): K distinct values ride
            # the fetch instead of an (A·R, De)@(De, Dh) matmul.
            up_cand = jnp.dot(
                h_cand.astype(dt), ffn_up[0].astype(dt),
                preferred_element_type=jnp.float32,
            )
            off_up = off_w1
            pieces.append(up_cand)
    else:
        pieces = [codebook] + ([cp] if in_proj is not None else []) + [cpw1]
        off_h = D if in_proj is not None else 0
        off_w1 = D + (h_w if in_proj is not None else 0)
    table = jnp.concatenate(pieces, axis=1)  # (K, Wt)

    # Pre-cast the weight operands to the compute dtype OUTSIDE the
    # kernel: the kernel rounds every weight to ``dt`` before use anyway
    # (``.astype(dt)`` of an already-dt block is a no-op), so this is
    # bit-identical — but it halves the weights' VMEM blocks and removes
    # the per-grid-tile convert ops (the full-block converts re-run on
    # every row tile otherwise).  The bias stays f32 (added to f32
    # accumulations) and the sub-codebook stays f32 (its squared norms
    # feed the packed selection distances directly).
    table = table.astype(dt)
    w2 = w2.astype(dt)
    if concat_w2 is not None:
        concat_w2 = concat_w2.astype(dt)
    ffn_up = ffn_up.astype(dt)
    ffn_down = ffn_down.astype(dt)
    if out_proj is not None:
        out_proj = out_proj.astype(dt)

    def row_spec(width, rows=row_tile):
        return pl.BlockSpec(
            (rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    operands = [x, xh, sub_codebook, table, w2, concat_w2,
                concat_b.reshape(1, -1), ffn_up, ffn_down, out_proj]
    in_specs = [
        row_spec(D, row_tile // beams),
        row_spec(D),
        full(sub_codebook),
        full(table),
        full(w2),
        None if concat_w2 is None else full(concat_w2),
        full(concat_b.reshape(1, -1)),
        full(ffn_up),
        full(ffn_down),
        None if out_proj is None else full(out_proj),
    ]
    live_ops, live_specs, unpack = _live_plumbing(
        list(zip(operands, in_specs))
    )

    def kernel_dispatch(*refs):
        ins = unpack(refs[:-1])
        _fused_substep_kernel(
            spec, A, beams, off_h, off_w1, off_up, *ins, refs[-1],
        )

    dists = pl.pallas_call(
        kernel_dispatch,
        out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
        grid=(n_tiles,),
        in_specs=live_specs,
        out_specs=pl.BlockSpec(
            (row_tile, A), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*live_ops)
    return dists[:NF]


def _selected_scores_kernel(
    spec: QincoSpec,
    A: int,  # candidate slots per row
    beams: int,  # beam rows per vector
    x_ref,  # (R/beams, D) per-vector targets
    xh_ref,  # (R, D)
    vals_ref,  # (A, R) packed pre-selection values | None (in-kernel topA)
    sub_codebook_ref,  # (K, D) substep codebook | None (external selection)
    table_ref,  # (K, D + De) folded table [C | C·P·(I+W1)], or (K, D) lean
    wfold_ref,  # (D, De) folded weight P·(I+W1) | None (lean fetch)
    w2_ref,  # (D, De) condition half of the concat weight
    concat_b_ref,  # (1, De)
    ffn_up_ref,
    ffn_down_ref,
    out_proj_ref,
    dist_ref,  # (R, A) packed distances
):
    """Candidate scoring for an EXTERNALLY pre-selected top-A.

    The exact-selection sibling of ``_fused_substep_kernel``: the substep
    top-A runs outside (exact ``top_k`` or ``approx_max_k`` over packed
    partial distances), and only the winners' packed *values* enter the
    kernel — (A, R) f32, clean lane layout — where the candidate ids are
    unpacked from the low mantissa bits.  No (NF, A) int32 id array ever
    crosses HBM (its (R·A, 1) kernel block was sublane-padded 8x and cost
    ~2.5 ms/step at production shapes).

    The fused-table tricks carry over from the binned kernel:
    * folded concat table [C | C·P·(I+W1)] — the concat layer's candidate
      half rides the fetch, the condition half runs on the R condition
      rows instead of A·R candidate rows;
    * per-slot one-hot fetch on the MXU: slot a's mask is a 2D lane-iota
      compare against its id, contracted (R, K) @ (K, D+De) — arbitrary
      winners need the full-K contraction (the binned kernel's G-wide
      slabs rely on selection *structure*), which is the FLOP price of
      exactness.

    (``fold_up`` does not pay here: widening the fetch table multiplies
    the full-K contraction, unlike the G-wide binned fetch.)

    With ``sub_codebook_ref`` (spec.fused_topa), the pre-selection itself
    moves in-kernel: substep partial distances come off the MXU as
    (K, R) — codeword index on the sublane axis — ids ride the packed
    low mantissa bits, and an EXACT top-A extracts iteratively: A rounds
    of (sublane-min, mask-the-winner) over the tile, ascending.  Packed
    ids make per-column values pairwise distinct, so each round removes
    exactly one entry and tie-break order matches ``topk_smallest`` over
    the same packed distances.  This deletes the XLA tail the external
    path pays per step — the (NF, K) HBM round-trip plus
    ``lax.top_k``/``approx_max_k`` — and upgrades the selected rungs'
    numerics from approx-topA (fast profile) to exact-topA
    (reference semantics: qinco_base.py:114-121).
    """
    R = xh_ref.shape[0]
    K = table_ref.shape[0]
    D = spec.D
    dt = jnp.dtype(spec.compute_dtype)

    xv = x_ref[:].astype(jnp.float32)  # (R/beams, D)
    xv = jnp.broadcast_to(
        xv[:, None, :], (R // beams, beams, D)
    ).reshape(R, D)
    xh = xh_ref[:].astype(jnp.float32)
    r = xv - xh  # residual target (R, D): substep selection ranks on it
    # AND the final distance is ||r - out - cand||^2, so the (A·R, D)
    # xv/cond broadcasts of the blocked form are never needed

    tab0 = table_ref[:].astype(dt)

    # Condition half of the concat layer on the R condition rows only.
    cc_cond = jnp.dot(
        xh.astype(dt), w2_ref[:].astype(dt),
        preferred_element_type=jnp.float32,
    )  # (R, De)
    ccb = cc_cond + concat_b_ref[0, :]  # (R, De) f32

    def mask_rounds():
        """Yield per-slot (packed_val (1, R) | None, fetch_mask) pairs.

        exact_sub route: A rounds of (sublane-min, mask-the-winner) over
        the packed (K, R) distance tile — EXACT top-A, ascending (packed
        ids make per-column values pairwise distinct, so each round
        removes exactly one entry and tie-break order matches
        ``topk_smallest``); the equality mask is both the removal mask
        AND the winner's fetch one-hot.  External-vals route: the slot's
        one-hot is a lane-iota compare against its unpacked id."""
        if sub_codebook_ref is not None:
            # ---- in-kernel exact substep top-A --------------------------
            C = sub_codebook_ref[:]
            cn2 = jnp.sum(C * C, axis=1)[:, None]  # (K, 1)
            d_sub = cn2 - 2.0 * jax.lax.dot_general(
                C.astype(dt), r.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K, R) partial: ranking-equivalent to true sqdist per row
            rowk = jax.lax.broadcasted_iota(jnp.int32, (K, R), dimension=0)
            cur = _pack_ids_f32(d_sub, rowk)
            INF = jnp.float32(jnp.inf)
            for _ in range(A):
                m = jnp.min(cur, axis=0, keepdims=True)  # (1, R)
                mask = cur == m  # (K, R) exact one-hot per column
                yield m, mask
                cur = jnp.where(mask, INF, cur)
        else:
            vals = vals_ref[:]  # (A, R) packed
            ids_all = jnp.bitwise_and(
                jax.lax.bitcast_convert_type(vals, jnp.int32),
                jnp.int32(0xFF),
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (R, K), dimension=1)
            for a in range(A):
                yield vals[a:a + 1], col == ids_all[a][:, None]  # (R, K)

    if not _selected_perslot(spec):
        # Blocked tail for deep presets (L > 4): collect the A fetch
        # slabs and run ONE shared MLP over (A·R, ·) rows — the per-slot
        # form below would unroll A·(2L+2) matmuls (≈550 at qinco2-L),
        # and at L=16 the MLP FLOPs dominate so the broadcast overhead
        # the per-slot form deletes is a small fraction anyway.
        val_rows, fetches = [], []
        for m, mask in mask_rounds():
            val_rows.append(m)
            if sub_codebook_ref is not None:
                fet = jax.lax.dot_general(
                    mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                fet = jnp.dot(
                    mask.astype(dt), tab0,
                    preferred_element_type=jnp.float32,
                )
            fetches.append(fet.astype(dt))
        vals = jnp.concatenate(val_rows, axis=0)  # (A, R) packed
        ids = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(vals, jnp.int32), jnp.int32(0xFF)
        )
        ext = jnp.concatenate(fetches, axis=0)  # (A·R, Wt) dt
        cand = ext[:, :D].astype(jnp.float32)
        De = ccb.shape[1]
        if wfold_ref is not None:  # lean fetch
            h_cand = jnp.dot(
                ext[:, :D], wfold_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )
        else:
            h_cand = ext[:, D:]
        h = (
            h_cand
            + jnp.broadcast_to(ccb[None], (A, R, De)).reshape(A * R, De)
        ).astype(dt)
        for l in range(spec.L):
            up = jnp.dot(
                h, ffn_up_ref[l].astype(dt),
                preferred_element_type=jnp.float32,
            )
            up = jnp.maximum(up, 0.0).astype(dt)
            down = jnp.dot(
                up, ffn_down_ref[l].astype(dt),
                preferred_element_type=jnp.float32,
            )
            h = h + down.astype(dt)
        if out_proj_ref is not None:
            out = jnp.dot(
                h, out_proj_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )
        else:
            out = h.astype(jnp.float32)
        if spec.res_codeword_coeff:
            out = out + cand
        diff = jnp.broadcast_to(r[None], (A, R, D)).reshape(A * R, D) - out
        d = jnp.sum(diff * diff, axis=-1).reshape(A, R)
        dist_ref[:] = _pack_ids_f32(d, ids).T  # (R, A)
        return

    # Per-slot fetch + MLP + distance on (R, ·) slabs: every slot shares
    # the same R condition rows, so the (A·R, D) cond/xv broadcasts and
    # the sublane concat of A (R, Wt) fetch blocks of the earlier blocked
    # form all disappear — only A (1, R) distance rows concatenate at the
    # end (the restructure that took the binned kernel's `perbin` profile
    # from 69.6k to 99.1k vec/s, here applied to the exact path: measured
    # 3.26 -> 2.50 ms/step at QINCo2-S b1024,
    # bench_artifacts/ktopa_breakdown_r5d.json).  Costs A-way unrolled
    # (smaller) matmuls — callers keep the blocked sibling for deep
    # presets (see _selected_perslot).
    #
    # Fetch note: with the LEAN table (spec.fast + wfold_ref) only the D
    # codeword columns pass through the one-hot contraction — the h-init
    # column is rank-D ([C | C·P·(I+W1)] = C·[I | P(I+W1)]), so the
    # fetched codeword multiplies into the folded weight densely:
    # (R, D) @ (D, De) costs D/K-th of fetching the De-wide column
    # through the full-K contraction.  Precision: P·(I+W1) is
    # pre-multiplied outside, so f32 association differs in low bits
    # from the table route — same precision class as the fast profile's
    # DEFAULT-precision matmuls (which is why it rides spec.fast), far
    # below the bf16 rounding the profile already accepts.
    val_rows, d_rows = [], []
    for m, mask in mask_rounds():
        val_rows.append(m)
        if sub_codebook_ref is not None:
            fet = jax.lax.dot_general(
                mask.astype(dt), tab0, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, Wt) f32 — exact row selection of dt table values
        else:
            fet = jnp.dot(
                mask.astype(dt), tab0, preferred_element_type=jnp.float32
            )  # (R, Wt)
        cand = fet[:, :D]
        if wfold_ref is not None:  # lean fetch
            h_cand = jnp.dot(
                fet[:, :D].astype(dt), wfold_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )
        else:
            h_cand = fet[:, D:]
        h = (h_cand + ccb).astype(dt)

        for l in range(spec.L):
            up = jnp.dot(
                h, ffn_up_ref[l].astype(dt),
                preferred_element_type=jnp.float32,
            )
            up = jnp.maximum(up, 0.0).astype(dt)
            down = jnp.dot(
                up, ffn_down_ref[l].astype(dt),
                preferred_element_type=jnp.float32,
            )
            h = h + down.astype(dt)

        if out_proj_ref is not None:
            out = jnp.dot(
                h, out_proj_ref[:].astype(dt),
                preferred_element_type=jnp.float32,
            )
        else:
            out = h.astype(jnp.float32)

        diff = r - out
        if spec.res_codeword_coeff:
            diff = diff - cand
        d_rows.append(jnp.sum(diff * diff, axis=-1)[None, :])  # (1, R)

    vals = jnp.concatenate(val_rows, axis=0)  # (A, R) packed
    ids = jnp.bitwise_and(
        jax.lax.bitcast_convert_type(vals, jnp.int32), jnp.int32(0xFF)
    )  # (A, R)
    d = jnp.concatenate(d_rows, axis=0)  # (A, R)
    dist_ref[:] = _pack_ids_f32(d, ids).T  # (R, A)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "n_codes", "beams", "row_tile", "interpret"),
)
def selected_scores_pallas(
    spec: QincoSpec,
    x: jnp.ndarray,  # (NF/beams, D) per-vector targets
    xh: jnp.ndarray,  # (NF, D)
    vals,  # (A, NF) packed pre-selection values | None (in-kernel topA)
    codebook: jnp.ndarray,  # (K, D)
    in_proj,
    concat_w,
    concat_b,
    ffn_up,
    ffn_down,
    out_proj,
    n_codes: int,
    beams: int = 1,
    row_tile: int = 256,
    interpret: bool = False,
    sub_codebook=None,  # (K, D) -> compute the exact top-A in-kernel
) -> jnp.ndarray:
    """Exact-top-A candidate scoring with the fused concat table.

    ``vals`` holds the externally selected candidates' packed partial
    distances (codebook id in the low 8 mantissa bits, see
    ``_pack_ids_f32``) — the only selection data the kernel needs.
    Alternatively pass ``vals=None`` with ``sub_codebook`` to run the
    exact top-A extraction in-kernel (spec.fused_topa): no (NF, K)
    distance matrix or XLA top_k at all.  Returns (NF, n_codes) full
    squared distances, ids packed in the low bits.  Requires K <= 256
    and no low-rank concat factor (the folded table absorbs W1; callers
    fall back to ``candidate_scores_pallas`` otherwise)."""
    NF, D = xh.shape
    K = codebook.shape[0]
    A = n_codes
    if K > 256:
        raise ValueError("selected_scores_pallas requires K <= 256")
    if (vals is None) == (sub_codebook is None):
        raise ValueError("pass exactly one of vals / sub_codebook")
    if sub_codebook is not None and A > K:
        # extraction rounds beyond K would see an all-INF tile, whose
        # all-True equality mask silently fetches the SUM of every
        # codeword — fail loudly like the XLA top_k route does
        raise ValueError(
            f"in-kernel top-A requires n_codes <= K ({A} > {K})"
        )
    if row_tile % beams or x.shape[0] * beams != NF:
        raise ValueError("beams must divide row_tile and x rows * beams == NF")
    pad = _round_up(NF, row_tile) - NF
    if pad:
        x = jnp.pad(x, ((0, pad // beams), (0, 0)))
        xh = jnp.pad(xh, ((0, pad), (0, 0)))
        # Padded lanes are zero: the all-ones equality mask they produce
        # feeds rows that are sliced off below.
        if vals is not None:
            vals = jnp.pad(vals, ((0, 0), (0, pad)))
    n_tiles = (NF + pad) // row_tile

    # Folded concat table [C | C·P·(I+W1)] (see _fused_substep_kernel):
    # h = h0·(I+W1) + cond·W2 + b with h0 = C·P.  Under spec.fast the
    # fetch goes LEAN: the h column is rank-D (C · P·(I+W1)), so the
    # kernel fetches only the D codeword columns through the full-K
    # one-hot contraction and multiplies the folded (D, De) weight
    # densely — ~24% less fetch MXU work at QINCo2-S (see the kernel's
    # fetch comment for the precision note).
    dt = jnp.dtype(spec.compute_dtype)
    h_w = in_proj.shape[1] if in_proj is not None else D
    w1 = concat_w[:h_w]
    w2 = concat_w[h_w:]
    wfold = None
    if spec.fast:
        eye = jnp.eye(h_w, dtype=jnp.float32)
        pw = in_proj if in_proj is not None else eye
        wfold = (jnp.dot(pw, eye + w1, precision=jax.lax.Precision.HIGHEST)
                 .astype(dt))
        table = codebook.astype(dt)
    else:
        if in_proj is not None:
            cp = jnp.dot(codebook.astype(dt), in_proj.astype(dt),
                         preferred_element_type=jnp.float32)
        else:
            cp = codebook
        h_cand = cp + jnp.dot(cp.astype(dt), w1.astype(dt),
                              preferred_element_type=jnp.float32)
        table = jnp.concatenate([codebook, h_cand], axis=1).astype(dt)
    w2 = w2.astype(dt)
    ffn_up = ffn_up.astype(dt)
    ffn_down = ffn_down.astype(dt)
    if out_proj is not None:
        out_proj = out_proj.astype(dt)

    def row_spec(width, rows=row_tile):
        return pl.BlockSpec(
            (rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    vals_spec = pl.BlockSpec(
        (A, row_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    operands = [x, xh, vals, sub_codebook, table, wfold, w2,
                concat_b.reshape(1, -1), ffn_up, ffn_down, out_proj]
    in_specs = [
        row_spec(D, row_tile // beams),
        row_spec(D),
        None if vals is None else vals_spec,
        None if sub_codebook is None else full(sub_codebook),
        full(table),
        None if wfold is None else full(wfold),
        full(w2),
        full(concat_b.reshape(1, -1)),
        full(ffn_up),
        full(ffn_down),
        None if out_proj is None else full(out_proj),
    ]
    live_ops, live_specs, unpack = _live_plumbing(
        list(zip(operands, in_specs))
    )

    def kernel_dispatch(*refs):
        ins = unpack(refs[:-1])
        _selected_scores_kernel(spec, A, beams, *ins, refs[-1])

    dists = pl.pallas_call(
        kernel_dispatch,
        out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
        grid=(n_tiles,),
        in_specs=live_specs,
        out_specs=pl.BlockSpec(
            (row_tile, A), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*live_ops)
    return dists[:NF]


@functools.partial(
    jax.jit, static_argnames=("spec", "row_tile", "interpret", "pack_ids")
)
def candidate_scores_pallas(
    spec: QincoSpec,
    x: jnp.ndarray,  # (NF, D)
    xh: jnp.ndarray,  # (NF, D)
    idx: jnp.ndarray,  # (NF, A) int32
    codebook: jnp.ndarray,  # (K, D)
    in_proj,  # (D, De) | None
    concat_w,
    concat_w2,  # (rank, De) | None (QINCo-LR)
    concat_b,  # (De,)
    ffn_up,  # (L, De, Dh)
    ffn_down,
    out_proj,  # (De, D) | None
    row_tile: int = 256,
    interpret: bool = False,
    pack_ids: bool = False,
) -> jnp.ndarray:
    """Fused candidate scoring -> squared distances (NF, A).

    With ``pack_ids`` (requires K <= 256) each distance carries its
    candidate's codebook id in the low 8 mantissa bits; see
    ``_cand_scores_kernel``."""
    NF, D = x.shape
    A = idx.shape[1]
    pad = _round_up(NF, row_tile) - NF
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        xh = jnp.pad(xh, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    n_tiles = (NF + pad) // row_tile
    # Pre-flatten the candidate ids: the kernel builds its one-hot from a
    # (R·A, 1) block (2D lane-dim iota compare; see _cand_scores_kernel).
    idx = idx.reshape(-1, 1)

    # Pre-cast weights to the compute dtype (bit-identical — the kernel
    # rounds to ``dt`` before every use; see fused_substep_scores_pallas).
    dt = jnp.dtype(spec.compute_dtype)
    codebook = codebook.astype(dt)
    if in_proj is not None:
        in_proj = in_proj.astype(dt)
    concat_w = concat_w.astype(dt)
    if concat_w2 is not None:
        concat_w2 = concat_w2.astype(dt)
    ffn_up = ffn_up.astype(dt)
    ffn_down = ffn_down.astype(dt)
    if out_proj is not None:
        out_proj = out_proj.astype(dt)

    def row_spec(width):
        return pl.BlockSpec(
            (row_tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    idx_spec = pl.BlockSpec(
        (row_tile * A, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    operands = [x, xh, idx, codebook, in_proj, concat_w, concat_w2,
                concat_b.reshape(1, -1), ffn_up, ffn_down, out_proj]
    in_specs = [
        row_spec(D),
        row_spec(D),
        idx_spec,
        full(codebook),
        None if in_proj is None else full(in_proj),
        full(concat_w),
        None if concat_w2 is None else full(concat_w2),
        full(concat_b.reshape(1, -1)),
        full(ffn_up),
        full(ffn_down),
        None if out_proj is None else full(out_proj),
    ]
    # Pallas does not accept None operands; filter and re-inject.
    live_ops, live_specs, unpack = _live_plumbing(
        list(zip(operands, in_specs))
    )

    def kernel_dispatch(*refs):
        ins = unpack(refs[:-1])
        _cand_scores_kernel(spec, *ins, refs[-1], pack_ids=pack_ids)

    dists = pl.pallas_call(
        kernel_dispatch,
        out_shape=jax.ShapeDtypeStruct((NF + pad, A), jnp.float32),
        grid=(n_tiles,),
        in_specs=live_specs,
        out_specs=pl.BlockSpec(
            (row_tile, A), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*live_ops)
    return dists[:NF]


def _select_rebuild_kernel(
    spec: QincoSpec,
    A_eff: int,  # candidates per beam (position = f * A_eff + a)
    F_in: int,  # beams per vector in xh
    F_out: int,  # beams to select (ascending by distance)
    d_ref,  # (Vt, F_in*A_eff) packed candidate distances
    xh_ref,  # (Vt*F_in, D) f32 current reconstructions
    codebook_ref,  # (K, D) f32
    in_proj_ref,
    concat_w_ref,
    concat_w2_ref,
    concat_b_ref,
    ffn_up_ref,
    ffn_down_ref,
    out_proj_ref,
    xhat_ref,  # (F_out*Vt, D) f32 out — j-major (selection-rank-major)
    codes_ref,  # (F_out, Vt) i32 out
    par_ref,  # (F_out, Vt) i32 out
):
    """Beam selection + reconstruction rebuild, fused on-chip.

    Replaces the XLA tail of every Pallas beam step — `lax.top_k` over
    the (N, F·A) distances plus the selected-beam gather/recompute
    (reference semantics: qinco_inference.py:195-210) — which together
    cost as much as the scoring kernel itself at production shapes
    (bench_artifacts/profile_encode_2026-08-19.log: topk 5.35 + recompute
    5.22 vs kernel 9.82 ms/step at batch 4096).

    Selection is an exact iterative extraction: F_out rounds of
    (min, first-argmin, mask) over the packed distance tile — ties break
    by position exactly like `lax.top_k` (stable ascending).  The
    selected candidates' codebook ids ride the packed low mantissa bits
    (`_pack_ids_f32`), the parent beam is position // A_eff, and both
    gathers (parent reconstruction rows, codeword rows) run as exact
    f32 one-hot matmuls on the MXU — a selection of already-materialized
    f32 rows, so the rebuild matches the XLA recompute's numerics.

    Mosaic has no lane->sublane reshapes, so per-extraction (Vt, 1)
    columns concatenate along *sublanes*, making every stacked buffer
    j-major (selection rank j varies slowest).  The wrapper transposes
    the tile outputs back to vector-major outside the kernel (one cheap
    XLA relayout per step).
    """
    Vt, C = d_ref.shape
    dt = jnp.dtype(spec.compute_dtype)

    d = d_ref[:]
    # Mosaic's tpu.iota is integer-only; cast for the positional min.
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (Vt, C), 1).astype(
        jnp.float32
    )
    INF = jnp.float32(jnp.inf)
    lane_nf = jax.lax.broadcasted_iota(jnp.int32, (Vt, Vt * F_in), 1)
    vbase = jax.lax.broadcasted_iota(jnp.int32, (Vt, 1), 0) * F_in
    K = codebook_ref.shape[0]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (Vt, K), 1)

    oh_rows, oh_cands, code_cols, par_cols = [], [], [], []
    for _ in range(F_out):
        m = jnp.min(d, axis=1, keepdims=True)  # (Vt, 1)
        # first position attaining the min (exact: pos < 2^24 in f32)
        p = jnp.min(jnp.where(d == m, pos_iota, INF), axis=1, keepdims=True)
        d = jnp.where(pos_iota == p, INF, d)  # remove exactly one entry
        pi = p.astype(jnp.int32)
        f = pi // A_eff  # parent beam (Vt, 1)
        code = jnp.bitwise_and(
            jax.lax.bitcast_convert_type(m, jnp.int32), jnp.int32(0xFF)
        )
        oh_rows.append((lane_nf == vbase + f).astype(jnp.float32))
        oh_cands.append((lane_k == code).astype(jnp.float32))
        code_cols.append(code.T)  # (1, Vt)
        par_cols.append(f.T)

    # Exact f32 one-hot gathers on the MXU (one term per output row).
    oh_xh = jnp.concatenate(oh_rows, axis=0)  # (F_out*Vt, Vt*F_in)
    oh_cd = jnp.concatenate(oh_cands, axis=0)  # (F_out*Vt, K)
    xh_sel = jnp.dot(
        oh_xh, xh_ref[:], preferred_element_type=jnp.float32
    )  # (F_out*Vt, D) f32, exact row selection
    cand = jnp.dot(
        oh_cd, codebook_ref[:], preferred_element_type=jnp.float32
    )  # (F_out*Vt, D) f32

    xhat_ref[:] = _mlp_chain(
        spec, cand, xh_sel, in_proj_ref, concat_w_ref, concat_w2_ref,
        concat_b_ref, ffn_up_ref, ffn_down_ref, out_proj_ref,
    )
    codes_ref[:] = jnp.concatenate(code_cols, axis=0)  # (F_out, Vt)
    par_ref[:] = jnp.concatenate(par_cols, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "A_eff", "F_out", "vec_tile", "interpret"),
)
def select_rebuild_pallas(
    spec: QincoSpec,
    dists: jnp.ndarray,  # (N, F_in*A_eff) packed f32 (ids in low 8 bits)
    xh: jnp.ndarray,  # (N*F_in, D) f32
    codebook: jnp.ndarray,  # (K, D) f32
    in_proj,
    concat_w,
    concat_w2,
    concat_b,
    ffn_up,
    ffn_down,
    out_proj,
    A_eff: int,
    F_out: int,
    vec_tile: int = 0,
    interpret: bool = False,
):
    """Exact beam top-F_out + reconstruction rebuild in one kernel.

    Returns ``(xhat_next (N, F_out, D) f32, codes (N, F_out) i32,
    parents (N, F_out) i32)`` with beams sorted ascending by distance —
    the `_beam_step` contract.  Requires K <= 256 (packed ids) and
    F_out <= F_in*A_eff.  ``vec_tile=0`` auto-sizes the vector tile
    from the VMEM budget (64 at QINCo2-S shapes, halved as F_out*F_in
    grows)."""
    N, C = dists.shape
    F_in = C // A_eff
    D = xh.shape[1]
    if F_out > C:
        raise ValueError("F_out must be <= F_in*A_eff")
    # VMEM guard: the one-hot parent-gather matrix oh_xh is
    # (F_out*Vt, Vt*F_in) f32 — quadratic in the vector tile — and has no
    # grid dimension to pipeline over.  The measured-optimal default
    # (Vt=64 at F_out=F_in=32 -> 16.8 MB) is calibrated near the scoped-
    # VMEM ceiling, so larger B/F_out/select_tile values would otherwise
    # die with an opaque Mosaic allocation failure (round-4 advisor
    # finding).  vec_tile=0 auto-sizes from that budget; an explicit
    # tile that exceeds it raises with the math spelled out.
    OH_BUDGET_BYTES = 17 << 20
    if vec_tile == 0:
        vt = 64
        while vt > 8 and 4 * F_out * F_in * vt * vt > OH_BUDGET_BYTES:
            vt //= 2
        vec_tile = vt
    oh_bytes = 4 * F_out * F_in * vec_tile * vec_tile
    if oh_bytes > OH_BUDGET_BYTES:
        # also reachable from auto-sizing when even vt=8 cannot fit —
        # fail with the math spelled out rather than the opaque Mosaic
        # scoped-VMEM allocation error
        raise ValueError(
            f"select_rebuild_pallas: one-hot gather matrix "
            f"(F_out*Vt, Vt*F_in) f32 = {oh_bytes / 2**20:.1f} MB "
            f"exceeds the {OH_BUDGET_BYTES >> 20} MB VMEM budget at "
            f"vec_tile={vec_tile}, F_out={F_out}, F_in={F_in}; use a "
            f"smaller beam/tile or the XLA top_k fallback"
        )
    pad = _round_up(N, vec_tile) - N
    if pad:
        # padded vectors select inf everywhere -> code 0 / parent 0 rows,
        # discarded by the slice below
        dists = jnp.pad(dists, ((0, pad), (0, 0)),
                        constant_values=float("inf"))
        xh = jnp.pad(xh, ((0, pad * F_in), (0, 0)))
    n_tiles = (N + pad) // vec_tile

    dt = jnp.dtype(spec.compute_dtype)
    # The MLP rounds its weights to the compute dtype (see _mlp_chain);
    # pre-cast outside.  The codebook and xh stay f32: the one-hot
    # gathers are exact row selections feeding the same f32 inputs the
    # XLA recompute path sees.
    if in_proj is not None:
        in_proj = in_proj.astype(dt)
    concat_w = concat_w.astype(dt)
    if concat_w2 is not None:
        concat_w2 = concat_w2.astype(dt)
    ffn_up = ffn_up.astype(dt)
    ffn_down = ffn_down.astype(dt)
    if out_proj is not None:
        out_proj = out_proj.astype(dt)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    operands = [dists, xh, codebook, in_proj, concat_w, concat_w2,
                concat_b.reshape(1, -1), ffn_up, ffn_down, out_proj]
    in_specs = [
        pl.BlockSpec((vec_tile, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((vec_tile * F_in, D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        full(codebook),
        None if in_proj is None else full(in_proj),
        full(concat_w),
        None if concat_w2 is None else full(concat_w2),
        full(concat_b.reshape(1, -1)),
        full(ffn_up),
        full(ffn_down),
        None if out_proj is None else full(out_proj),
    ]
    live_ops, live_specs, unpack = _live_plumbing(
        list(zip(operands, in_specs))
    )

    def kernel_dispatch(*refs):
        ins = unpack(refs[:-3])
        _select_rebuild_kernel(
            spec, A_eff, F_in, F_out, *ins, refs[-3], refs[-2], refs[-1],
        )

    xhat_j, codes_j, par_j = pl.pallas_call(
        kernel_dispatch,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * F_out * vec_tile, D),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * F_out, vec_tile), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * F_out, vec_tile), jnp.int32),
        ],
        grid=(n_tiles,),
        in_specs=live_specs,
        out_specs=[
            pl.BlockSpec((F_out * vec_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_out, vec_tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_out, vec_tile), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(*live_ops)

    # j-major tile outputs -> vector-major (one XLA relayout per step)
    xhat_next = (
        xhat_j.reshape(n_tiles, F_out, vec_tile, D)
        .transpose(0, 2, 1, 3)
        .reshape(N + pad, F_out, D)[:N]
    )
    codes = (
        codes_j.reshape(n_tiles, F_out, vec_tile)
        .transpose(0, 2, 1)
        .reshape(N + pad, F_out)[:N]
    )
    parents = (
        par_j.reshape(n_tiles, F_out, vec_tile)
        .transpose(0, 2, 1)
        .reshape(N + pad, F_out)[:N]
    )
    return xhat_next, codes, parents
