"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qinco_tpu.config import load_config
from qinco_tpu.models import QincoSpec, init_model_state, init_params, encode
from qinco_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from qinco_tpu.train.train_step import build_optimizer, make_train_step


def test_mesh_construction():
    mesh = make_mesh(data=-1, model=1)
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)


def test_batch_sharded_train_step_matches_single_device():
    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    cfg = load_config({"K": spec.K, "M": spec.M, "lr": 1e-2})
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, spec.D)).astype(np.float32)
    w = np.ones((64,), np.float32)

    def run(mesh):
        params = init_params(jax.random.PRNGKey(0), spec)
        mstate = init_model_state(spec)
        tx = build_optimizer(cfg, params, spec)
        opt_state = tx.init(params)
        step = make_train_step(spec, tx, grad_clip=0.1)
        if mesh is not None:
            params, mstate, opt_state = (
                replicate(mesh, params),
                replicate(mesh, mstate),
                replicate(mesh, opt_state),
            )
            xb, wb = shard_batch(mesh, x), shard_batch(mesh, w)
        else:
            xb, wb = jnp.asarray(x), jnp.asarray(w)
        losses = []
        for _ in range(3):
            params, opt_state, mstate, out = step(params, opt_state, mstate, xb, wb)
            losses.append(float(out.total_loss))
        return losses, jax.device_get(params)

    losses_1, params_1 = run(None)
    losses_8, params_8 = run(make_mesh(data=-1))
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_encode_matches_single_device():
    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(1), spec)
    x = np.random.default_rng(2).normal(size=(64, spec.D)).astype(np.float32)
    codes_1, _, _ = encode(params, spec, jnp.asarray(x))
    mesh = make_mesh(data=-1)
    codes_8, _, _ = encode(replicate(mesh, params), spec, shard_batch(mesh, x))
    np.testing.assert_array_equal(np.asarray(codes_1), np.asarray(codes_8))


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)

    ge.dryrun_multichip(8)
