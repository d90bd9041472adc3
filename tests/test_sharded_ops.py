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


def test_encode_task_with_model_axis(tmp_path):
    """CLI encode with mesh.model>1 routes through the sharded-IVF path
    and produces the same part files as the replicated run."""
    import run_qinco

    rng = np.random.default_rng(0)
    D = 8
    x = rng.normal(size=(1200, D)).astype(np.float32) * 2
    np.save(tmp_path / "t.npy", x)
    cents = rng.normal(size=(64, D)).astype(np.float32) * 2
    np.save(tmp_path / "ivf.npy", cents)

    run_qinco.main(
        [
            "task=train", f"trainset={tmp_path}/t.npy",
            f"output={tmp_path}/m.npz", f"ivf_centroids={tmp_path}/ivf.npy",
            "M=2", "K=16", "L=1", "de=6", "dh=8", "A=4", "B=2",
            "batch=256", "ds.valset=200", "epochs=1",
            "scheduler.stop_patience=0", "verbose=false",
        ]
    )
    for mesh_model, tag in ((1, "rep"), (4, "sh")):
        run_qinco.main(
            [
                "task=encode", f"db={tmp_path}/t.npy",
                f"model={tmp_path}/m.npz",
                f"ivf_centroids={tmp_path}/ivf.npy",
                f"output={tmp_path}/c_{tag}.npz",
                f"mesh.model={mesh_model}", "mesh.data=-1",
                "batch=256", "ds.db=600", "verbose=false",
            ]
        )
    a = np.load(tmp_path / "c_rep.part_0.npz")["codes"]
    b = np.load(tmp_path / "c_sh.part_0.npz")["codes"]
    np.testing.assert_array_equal(a, b)
