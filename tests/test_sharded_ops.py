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
