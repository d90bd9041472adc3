"""Training-stack tests: k-means, RQ init, scheduler, train step,
dead-code reset, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qinco_tpu.config import load_config
from qinco_tpu.models import QincoSpec, init_model_state, init_params
from qinco_tpu.models.scheduler import RampCosineSchedule, ReduceLROnPlateau, build_schedule
from qinco_tpu.ops.kmeans import kmeans
from qinco_tpu.ops.rq import rq_decode, rq_encode, train_rq
from qinco_tpu.train.train_step import (
    build_optimizer,
    make_train_step,
    reset_unused_codebooks,
    set_learning_rate,
)
from qinco_tpu.checkpoint import load_checkpoint, save_checkpoint


def test_kmeans_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = np.concatenate(
        [c + 0.1 * rng.normal(size=(100, 2)).astype(np.float32) for c in centers]
    )
    got = kmeans(x, 4, iters=20, seed=0)
    # each true center should have a learned centroid nearby
    d = ((got[:, None, :] - centers[None]) ** 2).sum(-1)
    assert (d.min(0) < 0.1).all()


def test_kmeans_batched_streaming_matches():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2000, 8)).astype(np.float32)
    a = kmeans(x, 16, iters=5, seed=3)
    b = kmeans(x, 16, iters=5, seed=3, batch=500)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_rq_reduces_error_per_stage():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3000, 16)).astype(np.float32)
    errs = []
    for M in (1, 2, 4):
        cents, xq = train_rq(x, M, 32, iters=8, seed=0)
        assert len(cents) == M
        errs.append(float(((x - xq) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]
    # encode/decode roundtrip consistency
    cents, xq = train_rq(x, 2, 32, iters=8, seed=0)
    codes = rq_encode(x, cents)
    dec = rq_decode(codes, cents)
    np.testing.assert_allclose(dec, xq, rtol=1e-4, atol=1e-4)


def test_ramp_cosine_schedule_shape():
    s = RampCosineSchedule(base_lr=1e-3, ramp_epochs=3, max_epochs=60,
                           min_factor=1e-6)
    assert s.lr(0) == pytest.approx(1e-9)
    assert s.lr(1.5) == pytest.approx(5e-4)
    assert s.lr(3.0) == pytest.approx(1e-3)
    assert s.lr(30) < s.lr(10) < s.lr(3.0)
    assert s.lr(63) == pytest.approx(1e-3 * 1e-6)


def test_plateau_schedule_reduces_on_stall():
    s = ReduceLROnPlateau(base_lr=1e-3, reduce_fact=0.1, patience=2, min_lr=1e-6)
    for _ in range(3):
        s.step(1.0)
    assert s.cur_lr == pytest.approx(1e-3)  # first call set best
    s.step(1.0)
    assert s.cur_lr == pytest.approx(1e-4)
    s.step(0.5)  # improvement resets
    assert s.num_bad == 0


def _tiny_setup(ivf=False):
    spec = QincoSpec(
        D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2, ivf_K=32 if ivf else 0
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    if ivf:
        params = params._replace(
            codebook0=jax.random.normal(jax.random.PRNGKey(5), (32, 8))
        )
    mstate = init_model_state(spec)
    cfg = load_config({"K": spec.K, "M": spec.M, "lr": 1e-2})
    tx = build_optimizer(cfg, params, spec)
    opt_state = tx.init(params)
    step = make_train_step(spec, tx, grad_clip=0.1)
    return spec, params, mstate, tx, opt_state, step


@pytest.mark.parametrize("ivf", [False, True])
def test_train_step_reduces_loss(ivf):
    spec, params, mstate, tx, opt_state, step = _tiny_setup(ivf)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, spec.D)).astype(np.float32))
    w = jnp.ones((64,), jnp.float32)

    cb0_before = np.asarray(params.codebook0)
    losses = []
    for _ in range(20):
        params, opt_state, mstate, out = step(params, opt_state, mstate, x, w)
        losses.append(float(out.total_loss))
    assert losses[-1] < losses[0] * 0.9, losses
    if ivf:
        np.testing.assert_array_equal(np.asarray(params.codebook0), cb0_before)
    # usage accumulated
    assert int(np.asarray(mstate.usage).sum()) == 20 * 64 * spec.n_mlp_steps
    assert int(np.asarray(mstate.usage0).sum()) == 20 * 64


def test_train_step_weights_mask_padding():
    # _tiny_setup is deterministic; build two states because the jitted
    # step donates its inputs.
    rng = np.random.default_rng(1)
    spec, params, mstate, tx, opt_state, step = _tiny_setup()
    x = rng.normal(size=(32, spec.D)).astype(np.float32)
    x_pad = np.concatenate([x, np.zeros((32, spec.D), np.float32)])
    w_full = jnp.ones((32,), jnp.float32)
    w_pad = jnp.concatenate([jnp.ones(32), jnp.zeros(32)])

    p1, _, _, out1 = step(params, opt_state, mstate, jnp.asarray(x), w_full)
    spec, params, mstate, tx, opt_state, step = _tiny_setup()
    p2, _, _, out2 = step(params, opt_state, mstate, jnp.asarray(x_pad), w_pad)
    assert float(out1.total_loss) == pytest.approx(float(out2.total_loss), rel=1e-4)


def test_set_learning_rate_changes_update_scale():
    spec, params, mstate, tx, opt_state, step = _tiny_setup()
    params_before = jax.device_get(params)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, spec.D)), jnp.float32)
    w = jnp.ones((16,), jnp.float32)
    opt_state = set_learning_rate(opt_state, 0.0)
    p1, *_ = step(params, opt_state, mstate, x, w)
    # zero LR -> no parameter change
    for a, b in zip(
        jax.tree_util.tree_leaves(p1.steps),
        jax.tree_util.tree_leaves(params_before.steps),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reset_unused_codebooks():
    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(0), spec)
    mstate = init_model_state(spec)
    # mark half of each codebook used
    usage = np.zeros((spec.n_mlp_steps, spec.K), np.int32)
    usage[:, : spec.K // 2] = 5
    usage0 = np.zeros((spec.K,), np.int32)
    usage0[:4] = 1
    mstate = mstate._replace(
        usage=jnp.asarray(usage), usage0=jnp.asarray(usage0)
    )
    before = np.asarray(params.steps.codebook)
    new_params, n_reset = reset_unused_codebooks(
        jax.random.PRNGKey(1), params, mstate, spec
    )
    after = np.asarray(new_params.steps.codebook)
    np.testing.assert_array_equal(after[:, : spec.K // 2], before[:, : spec.K // 2])
    assert not np.allclose(after[:, spec.K // 2 :], before[:, spec.K // 2 :])
    np.testing.assert_array_equal(
        np.asarray(n_reset), [spec.K - 4] + [spec.K // 2] * spec.n_mlp_steps
    )


def test_checkpoint_roundtrip(tmp_path):
    spec, params, mstate, tx, opt_state, step = _tiny_setup()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, spec.D)), jnp.float32)
    w = jnp.ones((16,), jnp.float32)
    params, opt_state, mstate, _ = step(params, opt_state, mstate, x, w)

    path = tmp_path / "model.npz"
    save_checkpoint(
        path,
        params=params,
        model_state=mstate,
        opt_state=jax.device_get(opt_state),
        epoch=7,
        scheduler_state={"cur_lr": 0.5},
        hyperparams={"K": spec.K, "M": spec.M, "L": spec.L},
        data_dim=spec.D,
    )
    spec2, params2, mstate2, tx2, opt2, _ = _tiny_setup()
    restored = load_checkpoint(
        path, params_template=params2, mstate_template=mstate2, opt_template=opt2
    )
    assert restored["meta"]["epoch"] == 7
    assert restored["meta"]["parameters"]["K"] == spec.K
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["params"]),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored["opt_state"]),
        jax.tree_util.tree_leaves(opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_build_schedule_from_config():
    cfg = load_config(["lr=0.0008"])
    s = build_schedule(cfg)
    assert isinstance(s, RampCosineSchedule)
    cfg1 = load_config(preset="qinco1")
    s1 = build_schedule(cfg1)
    assert isinstance(s1, ReduceLROnPlateau)


def test_grad_accumulation_matches_large_batch():
    """accum=4 x 16-row micro-batches == one 64-row batch
    (reference effective batch: qinco/log.py:160, qinco_tasks.py:341)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, 8)).astype(np.float32)
    w = np.ones((64,), np.float32)

    spec, params, mstate, tx, opt_state, step1 = _tiny_setup()
    p1, o1, m1, out1 = step1(params, opt_state, mstate, jnp.asarray(x), jnp.asarray(w))

    spec, params, mstate, tx, opt_state, _ = _tiny_setup()
    step4 = make_train_step(spec, tx, grad_clip=0.1, accum=4)
    p4, o4, m4, out4 = step4(
        params, opt_state, mstate,
        jnp.asarray(x.reshape(4, 16, 8)), jnp.asarray(w.reshape(4, 16)),
    )

    assert float(out1.total_loss) == pytest.approx(float(out4.total_loss), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(out1.codes), np.asarray(out4.codes))
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    # usage histograms identical
    np.testing.assert_array_equal(np.asarray(m1.usage), np.asarray(m4.usage))


def test_grad_accumulation_padded_tail_group():
    """A fully padded micro-batch (weights all zero) must not change the
    result vs. the same rows without the padding group."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=(32, 8)).astype(np.float32)

    spec, params, mstate, tx, opt_state, _ = _tiny_setup()
    step2 = make_train_step(spec, tx, grad_clip=0.1, accum=2)
    x_pad = np.stack([x, np.zeros((32, 8), np.float32)])  # (2, 32, 8)
    w_pad = np.stack([np.ones((32,), np.float32), np.zeros((32,), np.float32)])
    p2, _, m2, out2 = step2(
        params, opt_state, mstate, jnp.asarray(x_pad), jnp.asarray(w_pad)
    )

    spec, params, mstate, tx, opt_state, step1 = _tiny_setup()
    p1, _, m1, out1 = step1(
        params, opt_state, mstate, jnp.asarray(x), jnp.ones((32,), jnp.float32)
    )
    assert float(out1.total_loss) == pytest.approx(float(out2.total_loss), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    # EMA buffers skipped the empty group: equal to the unpadded run
    np.testing.assert_allclose(
        np.asarray(m1.xtarget_mean), np.asarray(m2.xtarget_mean), rtol=1e-5
    )


def test_encode_stats_ignore_padded_rows():
    """EncodeStats must be identical whether padded rows are present or
    not, when the padding mask is supplied (ADVICE r1)."""
    from qinco_tpu.models.qinco import encode

    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(9)
    x = rng.normal(size=(24, 8)).astype(np.float32)
    x_pad = np.concatenate([x, np.zeros((8, 8), np.float32)])
    w_pad = jnp.concatenate([jnp.ones(24), jnp.zeros(8)])

    _, _, s_ref = encode(params, spec, jnp.asarray(x), weights=jnp.ones(24))
    _, _, s_pad = encode(params, spec, jnp.asarray(x_pad), weights=w_pad)
    np.testing.assert_allclose(
        np.asarray(s_ref.xtarget_mean), np.asarray(s_pad.xtarget_mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.xtarget_std), np.asarray(s_pad.xtarget_std),
        rtol=1e-5, atol=1e-6,
    )


def test_kmeans_device_streaming_and_mesh():
    """The streaming (mega-batch) path and the mesh-sharded path must
    match the resident path (device-side segment-sum M-step, VERDICT r1)."""
    from qinco_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    x = rng.normal(size=(4096, 16)).astype(np.float32)
    a = kmeans(x, 64, iters=4, seed=2)
    b = kmeans(x, 64, iters=4, seed=2, batch=1000)  # 5 mega-batches
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
    c = kmeans(x, 64, iters=4, seed=2, mesh=make_mesh())
    np.testing.assert_allclose(a, c, rtol=1e-3, atol=1e-3)
