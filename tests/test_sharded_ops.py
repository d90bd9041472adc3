"""Model-axis codebook sharding on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from qinco_tpu.parallel.mesh import make_mesh
from qinco_tpu.parallel.sharded_ops import (
    shard_codebook,
    sharded_coarse_topk,
    sharded_ivf_assign,
)


def test_sharded_coarse_topk_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(0)
    K, D, nq, k = 64, 16, 33, 5
    book = rng.normal(size=(K, D)).astype(np.float32)
    xq = rng.normal(size=(nq, D)).astype(np.float32)

    book_sharded = shard_codebook(mesh, book)
    idx, dists = sharded_coarse_topk(mesh, jnp.asarray(xq), book_sharded, k)

    want = np.argsort(((xq[:, None] - book[None]) ** 2).sum(-1), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), want)
    true_d = np.take_along_axis(
        ((xq[:, None] - book[None]) ** 2).sum(-1), want, axis=1
    )
    np.testing.assert_allclose(np.asarray(dists), true_d, rtol=1e-3, atol=1e-3)


def test_sharded_ivf_assign_matches_argmin():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(1)
    K, D, n = 128, 8, 50
    book = rng.normal(size=(K, D)).astype(np.float32)
    x = rng.normal(size=(n, D)).astype(np.float32)
    codes = sharded_ivf_assign(mesh, jnp.asarray(x), shard_codebook(mesh, book))
    want = np.argmin(((x[:, None] - book[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(np.asarray(codes), want)


def test_encode_with_sharded_ivf_book_matches_replicated():
    from qinco_tpu.models import QincoSpec, init_params, encode
    from qinco_tpu.parallel.sharded_ops import encode_ivf_sharded

    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2, ivf_K=64)
    params = init_params(jax.random.PRNGKey(0), spec)
    params = params._replace(
        codebook0=jax.random.normal(jax.random.PRNGKey(1), (64, 8)) * 2
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(40, 8)).astype(np.float32)
    )

    codes_ref, xhat_ref, _ = encode(params, spec, x)

    mesh = make_mesh(data=1, model=8)
    params_sharded = params._replace(
        codebook0=shard_codebook(mesh, params.codebook0)
    )
    codes_sh, xhat_sh, _ = jax.jit(
        encode_ivf_sharded, static_argnames=("mesh", "spec")
    )(mesh, params_sharded, spec, x)

    np.testing.assert_array_equal(np.asarray(codes_ref), np.asarray(codes_sh))
    np.testing.assert_allclose(
        np.asarray(xhat_ref), np.asarray(xhat_sh), rtol=1e-4, atol=1e-4
    )
