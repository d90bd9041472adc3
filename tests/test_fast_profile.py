"""Fast-encode profile: speed knobs must not change results materially."""

import jax
import jax.numpy as jnp
import numpy as np

from qinco_tpu.models import QincoSpec, encode, init_params


def test_fast_profile_matches_exact_on_cpu():
    """On CPU (full-precision matmuls) the fast profile differs from the
    exact path only through approx_max_k's candidate recall; the
    reconstruction quality must stay essentially identical."""
    spec = QincoSpec(D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4)
    spec_fast = spec.with_(fast=True)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(128, spec.D)).astype(np.float32)
    )

    codes_e, xhat_e, _ = encode(params, spec, x)
    codes_f, xhat_f, _ = encode(params, spec_fast, x)

    mse_e = float(jnp.mean(jnp.sum((xhat_e - x) ** 2, -1)))
    mse_f = float(jnp.mean(jnp.sum((xhat_f - x) ** 2, -1)))
    assert mse_f <= mse_e * 1.02, (mse_f, mse_e)
    # most codes identical
    agree = float((np.asarray(codes_e) == np.asarray(codes_f)).mean())
    assert agree > 0.9, agree


def test_pallas_profile_matches_exact_on_cpu():
    """Pallas kernel path (interpret mode on CPU) must agree with the
    XLA path: same reconstruction quality, nearly identical codes."""
    spec = QincoSpec(D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4)
    spec_p = spec.with_(pallas=True)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, spec.D)).astype(np.float32)
    )
    codes_e, xhat_e, _ = encode(params, spec, x)
    codes_p, xhat_p, _ = encode(params, spec_p, x)
    mse_e = float(jnp.mean(jnp.sum((xhat_e - x) ** 2, -1)))
    mse_p = float(jnp.mean(jnp.sum((xhat_p - x) ** 2, -1)))
    assert mse_p <= mse_e * 1.01, (mse_p, mse_e)
    agree = float((np.asarray(codes_e) == np.asarray(codes_p)).mean())
    assert agree > 0.95, agree


def test_selected_kernel_codes_match_xla_exactly():
    """The pallas profile routes through selected_scores_pallas (exact
    top-A pre-selection passed as packed values): on CPU at f32 the
    selection and scoring are both exact, so codes must equal the XLA
    path's bit-for-bit (no ties in random data)."""
    spec = QincoSpec(D=32, K=64, M=4, L=1, de=32, dh=64, A=8, B=8)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(256, spec.D)).astype(np.float32)
    )
    codes_e, xhat_e, _ = encode(params, spec, x)
    codes_p, xhat_p, _ = encode(params, spec.with_(pallas=True), x)
    assert (np.asarray(codes_e) == np.asarray(codes_p)).all()
    np.testing.assert_allclose(
        np.asarray(xhat_e), np.asarray(xhat_p), rtol=1e-5, atol=1e-6
    )


def test_pallas_lowrank_falls_back_to_idx_kernel():
    """QINCo-LR (concat_rank) keeps a low-rank concat factor the folded
    table cannot absorb — the pallas route must fall back to the id-based
    scoring kernel and still track the XLA path."""
    spec = QincoSpec(D=16, K=32, M=3, L=1, de=12, dh=24, A=8, B=4,
                     concat_rank=6)
    params = init_params(jax.random.PRNGKey(1), spec)
    assert params.steps.concat_w2 is not None
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(64, spec.D)).astype(np.float32)
    )
    codes_e, xhat_e, _ = encode(params, spec, x)
    codes_p, xhat_p, _ = encode(params, spec.with_(pallas=True), x)
    mse_e = float(jnp.mean(jnp.sum((xhat_e - x) ** 2, -1)))
    mse_p = float(jnp.mean(jnp.sum((xhat_p - x) ** 2, -1)))
    assert mse_p <= mse_e * 1.01, (mse_p, mse_e)
    agree = float((np.asarray(codes_e) == np.asarray(codes_p)).mean())
    assert agree > 0.95, agree


def test_pallas_profile_ivf_spec():
    spec = QincoSpec(D=16, K=32, M=3, L=1, de=12, dh=24, A=8, B=4, ivf_K=64,
                     pallas=True)
    params = init_params(jax.random.PRNGKey(2), spec)
    params = params._replace(
        codebook0=jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(32, spec.D)).astype(np.float32)
    )
    codes, xhat, _ = encode(params, spec, x)
    assert codes.shape == (spec.M_ivf, 32)
    assert np.isfinite(np.asarray(xhat)).all()


def test_fused_substep_binned_selection():
    """fused_substep profile (interpret mode on CPU): the in-kernel binned
    argmin must agree with a plain-JAX binned argmin reference, and the
    end-to-end encode must stay close to the exact path in MSE."""
    spec = QincoSpec(
        D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4,
        pallas=True, fast=True, fused_substep=True,
    )
    spec_exact = spec.with_(pallas=False, fast=False, fused_substep=False)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(64, spec.D)).astype(np.float32)
    )
    codes_e, xhat_e, _ = encode(params, spec_exact, x)
    codes_f, xhat_f, _ = encode(params, spec, x)
    assert codes_f.shape == codes_e.shape
    mse_e = float(jnp.mean(jnp.sum((xhat_e - x) ** 2, -1)))
    mse_f = float(jnp.mean(jnp.sum((xhat_f - x) ** 2, -1)))
    # Binned pre-selection loses runner-up candidates to bin collisions.
    # At this toy shape (K=32 -> bins of 4, B=4) the cost is ~9%; at the
    # production shape (K=256, A=16, B=32) it measures ~0.2% (bench.py).
    assert mse_f <= mse_e * 1.15, (mse_f, mse_e)
    # decode(codes) must reproduce xhat exactly (ids decoded from packed bits)
    from qinco_tpu.models import decode

    dec = decode(params, spec, codes_f)
    assert float(jnp.mean((dec - xhat_f) ** 2)) < 1e-10


def test_fused_substep_kernel_selection_matches_reference():
    """The packed ids out of the fused kernel == binned argmin over the
    same (bf16-rounded) partial distances."""
    from qinco_tpu.models.params import init_params as ip
    from qinco_tpu.ops.pallas_kernels import fused_substep_scores_pallas

    spec = QincoSpec(D=16, K=32, M=2, L=1, de=16, dh=24, A=8, B=4,
                     compute_dtype="float32")
    params = ip(jax.random.PRNGKey(1), spec)
    p0 = jax.tree.map(lambda a: a[0], params.steps)
    rng = np.random.default_rng(4)
    NF = 64
    x = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    xh = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    out = np.asarray(fused_substep_scores_pallas(
        spec, x, xh, p0.sub_codebook, p0.codebook, p0.in_proj, p0.concat_w,
        p0.concat_w2, p0.concat_b, p0.ffn_up, p0.ffn_down, p0.out_proj,
        n_codes=spec.A, row_tile=32,
        interpret=jax.default_backend() != "tpu"))
    ids = out.view(np.int32) & 0xFF

    K, A = spec.K, spec.A
    G = K // A
    C = np.asarray(p0.sub_codebook, np.float32)
    d_sub = (C ** 2).sum(1)[None, :] - 2.0 * (
        np.asarray(x - xh, np.float32) @ C.T
    )
    ds_p = ((d_sub.astype(np.float32).view(np.int32) & ~0xFF)
            | np.arange(K, dtype=np.int32)[None, :]).view(np.float32)
    exp = np.empty((NF, A), np.int32)
    for a in range(A):
        exp[:, a] = ds_p[:, a * G:(a + 1) * G].argmin(1) + a * G
    assert (ids == exp).mean() > 0.99, (ids[:3], exp[:3])


def test_perbin_matches_blocked_fused_kernel():
    """spec.perbin is an exact reformulation of the blocked fused kernel:
    same packed candidate ids, distances equal to float-association
    tolerance, end-to-end encode equivalent."""
    from qinco_tpu.models.params import init_params as ip
    from qinco_tpu.ops.pallas_kernels import fused_substep_scores_pallas

    spec = QincoSpec(
        D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4,
        pallas=True, fast=True, fused_substep=True,
        compute_dtype="bfloat16",
    )
    params = ip(jax.random.PRNGKey(2), spec)
    p0 = jax.tree.map(lambda a: a[0], params.steps)
    rng = np.random.default_rng(11)
    NF = 64
    x = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    xh = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    interp = jax.default_backend() != "tpu"

    outs = {}
    for pb in (False, True):
        outs[pb] = np.asarray(fused_substep_scores_pallas(
            spec.with_(perbin=pb), x, xh, p0.sub_codebook, p0.codebook,
            p0.in_proj, p0.concat_w, p0.concat_w2, p0.concat_b, p0.ffn_up,
            p0.ffn_down, p0.out_proj, n_codes=spec.A, row_tile=32,
            interpret=interp))
    ids_a = outs[False].view(np.int32) & 0xFF
    ids_b = outs[True].view(np.int32) & 0xFF
    assert (ids_a == ids_b).all()
    da = (outs[False].view(np.int32) & ~0xFF).view(np.float32)
    db = (outs[True].view(np.int32) & ~0xFF).view(np.float32)
    np.testing.assert_allclose(da, db, rtol=1e-2, atol=1e-5)

    # end-to-end encode: same MSE class, decode reproduces xhat exactly
    xb = jnp.asarray(rng.normal(size=(64, spec.D)).astype(np.float32))
    _, xhat_f, _ = encode(params, spec, xb)
    codes_p, xhat_p, _ = encode(params, spec.with_(perbin=True), xb)
    mse_f = float(jnp.mean(jnp.sum((xhat_f - xb) ** 2, -1)))
    mse_p = float(jnp.mean(jnp.sum((xhat_p - xb) ** 2, -1)))
    assert abs(mse_p - mse_f) <= mse_f * 0.02, (mse_p, mse_f)
    from qinco_tpu.models import decode

    dec = decode(params, spec.with_(perbin=True), codes_p)
    assert float(jnp.mean((dec - xhat_p) ** 2)) < 1e-10


def test_approx_beam_plumbing():
    """approx_beam on CPU (where approx_max_k lowers to an exact top-k)
    must reproduce the exact profile's encode bit-for-bit, exercising the
    final-beam re-selection path."""
    spec = QincoSpec(
        D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4,
        pallas=True, fast=True, fused_substep=True,
        compute_dtype="bfloat16",
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(64, spec.D)).astype(np.float32)
    )
    codes_e, xhat_e, _ = encode(params, spec, x)
    codes_a, xhat_a, _ = encode(params, spec.with_(approx_beam=True), x)
    assert (np.asarray(codes_e) == np.asarray(codes_a)).all()
    np.testing.assert_allclose(np.asarray(xhat_e), np.asarray(xhat_a))


def test_no_bf16_accumulator_knob():
    """The former `bf16_acc` knob is gone: Mosaic rejects non-32-bit
    matmul accumulators on real TPUs ('tpu.matmul' op Expected matmul
    acc to be 32-bit, v5e 2026-08-18), so the option could never be
    honored on hardware and was removed from the spec."""
    import dataclasses

    assert "bf16_acc" not in {f.name for f in dataclasses.fields(QincoSpec)}


def test_fused_select_matches_xla_selection_exactly():
    """spec.fused_select routes the beam top-B + rebuild through
    select_rebuild_pallas (interpret mode on CPU).  Selection is exact
    with lax.top_k tie semantics, and the rebuild gathers the same f32
    rows the XLA recompute reads — codes must match bit-for-bit and
    reconstructions to float tolerance, for every packed-id scoring
    route."""
    base = QincoSpec(D=32, K=64, M=4, L=2, de=32, dh=64, A=8, B=8)
    routes = {
        "selected": base.with_(pallas=True),
        "fused": base.with_(pallas=True, fast=True, fused_substep=True),
        "perbin": base.with_(pallas=True, fast=True, fused_substep=True,
                             perbin=True),
        "lowrank_idx": base.with_(pallas=True, concat_rank=16),
    }
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(70, base.D)).astype(np.float32)
    )
    for name, spec in routes.items():
        params = init_params(jax.random.PRNGKey(0), spec)
        codes_r, xhat_r, _ = encode(params, spec, x)
        codes_s, xhat_s, _ = encode(
            params, spec.with_(fused_select=True, select_tile=16), x
        )
        assert (np.asarray(codes_r) == np.asarray(codes_s)).all(), name
        np.testing.assert_allclose(
            np.asarray(xhat_r), np.asarray(xhat_s), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )


def test_fused_select_ivf_first_step():
    """IVF mode enters the first MLP step at beam 1 with n_codes =
    max(B, A) == B: the select kernel's F_out == F_in*A_eff edge (full
    sort of all candidates)."""
    spec = QincoSpec(D=16, K=32, M=3, L=1, de=12, dh=24, A=4, B=8, ivf_K=64,
                     pallas=True, fused_select=True, select_tile=8)
    params = init_params(jax.random.PRNGKey(2), spec)
    params = params._replace(
        codebook0=jax.random.normal(jax.random.PRNGKey(3), (64, 16))
    )
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(33, spec.D)).astype(np.float32)
    )
    codes_r, xhat_r, _ = encode(params, spec.with_(fused_select=False), x)
    codes_s, xhat_s, _ = encode(params, spec, x)
    assert (np.asarray(codes_r) == np.asarray(codes_s)).all()
    np.testing.assert_allclose(
        np.asarray(xhat_r), np.asarray(xhat_s), rtol=1e-5, atol=1e-6
    )


def test_fused_topa_in_kernel_matches_external_exact_topk():
    """spec.fused_topa moves the substep top-A INTO the selected-scores
    kernel (exact iterative extraction over the on-chip (K, R) packed
    distance tile).  At f32 on CPU it must match the external
    exact-top_k route (fused_topa=False, fast=False) bit-for-bit —
    both rank the same packed partial distances with the same tie
    semantics."""
    # fast=True: the in-kernel route is gated on the fast profile (the
    # non-fast parity route keeps HIGHEST-precision external selection);
    # on CPU the external fast route's approx_max_k lowers to exact
    # top-k, so both sides are exact and must agree bit-for-bit.
    base = QincoSpec(D=32, K=64, M=4, L=2, de=32, dh=64, A=8, B=8,
                     pallas=True, fast=True)
    params = init_params(jax.random.PRNGKey(3), base)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(70, base.D)).astype(np.float32)
    )
    codes_ext, xhat_ext, _ = encode(params, base.with_(fused_topa=False), x)
    codes_ink, xhat_ink, _ = encode(params, base, x)
    assert (np.asarray(codes_ext) == np.asarray(codes_ink)).all()
    np.testing.assert_allclose(
        np.asarray(xhat_ext), np.asarray(xhat_ink), rtol=1e-5, atol=1e-6
    )
    # composes with the fused select/rebuild kernel and with IVF mode
    codes_fs, xhat_fs, _ = encode(
        params, base.with_(fused_select=True, select_tile=16), x
    )
    assert (np.asarray(codes_ext) == np.asarray(codes_fs)).all()

    ivf = QincoSpec(D=16, K=32, M=3, L=1, de=12, dh=24, A=4, B=8, ivf_K=64,
                    pallas=True, fast=True)
    p_ivf = init_params(jax.random.PRNGKey(4), ivf)
    p_ivf = p_ivf._replace(
        codebook0=jax.random.normal(jax.random.PRNGKey(5), (64, 16))
    )
    xi = jnp.asarray(
        np.random.default_rng(12).normal(size=(33, ivf.D)).astype(np.float32)
    )
    codes_i0, _, _ = encode(p_ivf, ivf.with_(fused_topa=False), xi)
    codes_i1, _, _ = encode(p_ivf, ivf, xi)
    assert (np.asarray(codes_i0) == np.asarray(codes_i1)).all()


def test_selected_perslot_matches_blocked_form(monkeypatch):
    """The round-5 per-slot restructure of the selected-scores kernel
    (each extraction round's fetch runs its own (R, ·) MLP slab) is an
    exact reformulation of the blocked (A·R, ·) form that deep presets
    (L > 4, `_selected_perslot`) still use: same packed candidate ids,
    distances equal to float-association tolerance."""
    from qinco_tpu.ops import pallas_kernels as pk

    spec = QincoSpec(D=16, K=32, M=4, L=2, de=12, dh=24, A=8, B=4,
                     pallas=True, fast=True, fused_topa=True,
                     compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(7), spec)
    p0 = jax.tree.map(lambda a: a[0], params.steps)
    rng = np.random.default_rng(13)
    NF = 64
    x = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    xh = jnp.asarray(rng.normal(size=(NF, spec.D)).astype(np.float32))
    interp = jax.default_backend() != "tpu"

    outs = {}
    for perslot in (True, False):
        monkeypatch.setattr(pk, "_selected_perslot", lambda s: perslot)
        # the jit cache keys on (spec, shapes) only — clear it so the
        # monkeypatched gate is re-read at trace time
        pk.selected_scores_pallas.clear_cache()
        outs[perslot] = np.asarray(pk.selected_scores_pallas(
            spec, x, xh, None, p0.codebook, p0.in_proj, p0.concat_w,
            p0.concat_b, p0.ffn_up, p0.ffn_down, p0.out_proj,
            n_codes=spec.A, row_tile=32, interpret=interp,
            sub_codebook=p0.sub_codebook))
    pk.selected_scores_pallas.clear_cache()
    ids_a = outs[True].view(np.int32) & 0xFF
    ids_b = outs[False].view(np.int32) & 0xFF
    assert (ids_a == ids_b).all()
    da = (outs[True].view(np.int32) & ~0xFF).view(np.float32)
    db = (outs[False].view(np.int32) & ~0xFF).view(np.float32)
    np.testing.assert_allclose(da, db, rtol=1e-2, atol=1e-5)

    # the external-vals route through both forms as well
    sub_d = np.sum(
        (np.asarray(xh)[:, None, :]
         - np.asarray(p0.sub_codebook)[None]) ** 2, -1)
    d_pk = pk._pack_ids_f32(
        jnp.asarray(sub_d.astype(np.float32)),
        jnp.arange(spec.K, dtype=jnp.int32)[None, :])
    vals = jnp.sort(d_pk, axis=1)[:, :spec.A].T  # (A, NF) ascending
    for perslot in (True, False):
        monkeypatch.setattr(pk, "_selected_perslot", lambda s: perslot)
        pk.selected_scores_pallas.clear_cache()
        outs[perslot] = np.asarray(pk.selected_scores_pallas(
            spec, x, xh, vals, p0.codebook, p0.in_proj, p0.concat_w,
            p0.concat_b, p0.ffn_up, p0.ffn_down, p0.out_proj,
            n_codes=spec.A, row_tile=32, interpret=interp))
    pk.selected_scores_pallas.clear_cache()
    assert ((outs[True].view(np.int32) & 0xFF)
            == (outs[False].view(np.int32) & 0xFF)).all()
    np.testing.assert_allclose(
        (outs[True].view(np.int32) & ~0xFF).view(np.float32),
        (outs[False].view(np.int32) & ~0xFF).view(np.float32),
        rtol=1e-2, atol=1e-5)


def test_fused_topa_refuses_n_codes_over_K():
    """B > K at the IVF expanding step makes n_codes = max(B, A) > K;
    the in-kernel route must raise like the XLA top_k route does, not
    silently fetch the sum of every codeword (round-5 review)."""
    import pytest

    from qinco_tpu.ops.pallas_kernels import selected_scores_pallas

    spec = QincoSpec(D=16, K=32, M=2, L=1, de=12, dh=16, A=8, B=64,
                     ivf_K=16, pallas=True, fast=True)
    params = init_params(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match="n_codes <= K"):
        selected_scores_pallas(
            spec,
            jnp.zeros((4, 16)), jnp.zeros((4, 16)), None,
            params.steps.codebook[0], None,
            params.steps.concat_w[0], params.steps.concat_b[0],
            params.steps.ffn_up[0], params.steps.ffn_down[0], None,
            n_codes=64, beams=1, row_tile=4, interpret=True,
            sub_codebook=params.steps.sub_codebook[0],
        )


def test_target_stats_single_row_mean_exact():
    """A tail batch with exactly one unmasked row must feed the TRUE
    row mean into the EMA stats — the old >=2 denominator clamp halved
    it (round-5 review)."""
    from qinco_tpu.models.qinco import _target_stats

    x_target = jnp.asarray([[[2.0, 4.0]]])  # (N=1, F=1, D=2)
    w = jnp.asarray([1.0])
    mean, std = _target_stats(x_target, w)
    np.testing.assert_allclose(np.asarray(mean), [2.0, 4.0], rtol=1e-6)
    assert np.isfinite(np.asarray(std)).all()
