"""Legacy (v1) family: PQ-QINCo, OPQ, QINCo-LR, codec, two-stage search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import run_qinco
from qinco_tpu.codec import pack_codes, read_codes_file, unpack_codes, write_codes_file
from qinco_tpu.models import QincoSpec, init_params, encode, decode
from qinco_tpu.models.pq_qinco import (
    init_pq_params,
    pq_decode,
    pq_encode,
    stack_part_params,
)
from qinco_tpu.ops.opq import train_opq


def test_codec_roundtrip_8bit(tmp_path):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 256, size=(100, 8)).astype(np.int32)
    packed = pack_codes(codes, 8)
    assert packed.shape == (100, 8)
    np.testing.assert_array_equal(unpack_codes(packed, 8, 8), codes)

    path = tmp_path / "c.qcodes"
    write_codes_file(path, codes, K=256)
    got, K = read_codes_file(path)
    assert K == 256
    np.testing.assert_array_equal(got, codes)


@pytest.mark.parametrize("nbits", [4, 6, 10])
def test_codec_roundtrip_odd_bits(nbits):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2**nbits, size=(37, 5)).astype(np.int32)
    packed = pack_codes(codes, nbits)
    assert packed.shape[1] == (5 * nbits + 7) // 8
    np.testing.assert_array_equal(unpack_codes(packed, 5, nbits), codes)


def test_opq_rotation_is_orthogonal_and_helps():
    rng = np.random.default_rng(0)
    # anisotropic data where a rotation helps PQ
    n, D = 3000, 8
    mix = rng.normal(size=(D, D)).astype(np.float32)
    x = (rng.normal(size=(n, D)) @ mix).astype(np.float32)
    R = train_opq(x, n_parts=2, K=16, iters=4, kmeans_iters=4)
    np.testing.assert_allclose(R @ R.T, np.eye(D), atol=1e-4)


def test_pq_encode_decode_roundtrip():
    sub_spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    n_parts = 2
    params = init_pq_params(jax.random.PRNGKey(0), sub_spec, n_parts, opq=None)
    x = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
    codes, xhat = pq_encode(params, sub_spec, n_parts, jnp.asarray(x))
    assert codes.shape == (n_parts, sub_spec.M_ivf, 32)
    dec = pq_decode(params, sub_spec, n_parts, codes)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(xhat), rtol=1e-4,
                               atol=1e-4)


def test_pq_parts_equal_independent_models():
    """The vmapped PQ encode must equal encoding each slice separately."""
    sub_spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    p0 = init_params(jax.random.PRNGKey(1), sub_spec)
    p1 = init_params(jax.random.PRNGKey(2), sub_spec)
    params = stack_part_params([p0, p1])
    x = np.random.default_rng(1).normal(size=(16, 16)).astype(np.float32)

    codes, xhat = pq_encode(params, sub_spec, 2, jnp.asarray(x))
    from qinco_tpu.models.qinco import encode_raw

    c0 = encode_raw(p0, sub_spec, jnp.asarray(x[:, :8]))
    c1 = encode_raw(p1, sub_spec, jnp.asarray(x[:, 8:]))
    np.testing.assert_array_equal(np.asarray(codes[0]), np.asarray(c0))
    np.testing.assert_array_equal(np.asarray(codes[1]), np.asarray(c1))


def test_pq_opq_roundtrip_preserves_geometry():
    sub_spec = QincoSpec(D=8, K=16, M=2, L=1, de=6, dh=12, A=0, B=1)
    rng = np.random.default_rng(3)
    R = np.linalg.qr(rng.normal(size=(16, 16)))[0].astype(np.float32)
    params = init_pq_params(jax.random.PRNGKey(3), sub_spec, 2, opq=R)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    codes, xhat = pq_encode(params, sub_spec, 2, jnp.asarray(x))
    dec = pq_decode(params, sub_spec, 2, codes)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(xhat), rtol=1e-4,
                               atol=1e-4)


def test_qinco_lr_spec():
    spec = QincoSpec(D=16, K=16, M=3, L=1, de=None, dh=12, A=4, B=2,
                     concat_rank=6)
    params = init_params(jax.random.PRNGKey(4), spec)
    assert params.steps.concat_w.shape == (3 - 1, 32, 6)
    assert params.steps.concat_w2.shape == (3 - 1, 6, 16)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(16, 16)), jnp.float32)
    codes, xhat, _ = encode(params, spec, x)
    dec = decode(params, spec, codes)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(xhat), rtol=1e-3,
                               atol=1e-3)


def test_two_stage_search():
    from qinco_tpu.ops.aq import compute_fixed_aq_codebooks
    from qinco_tpu.search.two_stage import run_search_two_stage

    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(5), spec)
    rng = np.random.default_rng(5)
    db = rng.normal(size=(500, 8)).astype(np.float32)
    codes = np.asarray(encode(params, spec, jnp.asarray(db))[0])  # (M, N)

    books = compute_fixed_aq_codebooks(db, codes.T, k=spec.K)
    queries = db[:20] + 0.01 * rng.normal(size=(20, 8)).astype(np.float32)
    d = ((queries[:, None, :] - db[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :1].astype(np.int32)

    I, recalls = run_search_two_stage(
        params, spec, codes, books, queries, gt, nshort=50,
        decode_batch=256, log=lambda *a: None,
    )
    assert I.shape[1] == 50  # min(100, nshort)
    assert recalls[100] > 0.9


def test_pq_train_task_cli(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 8)).astype(np.float32)
    np.save(tmp_path / "t.npy", x)
    out = tmp_path / "pq.pqnpz"
    rc = run_qinco.main(
        [
            "task=train_pq", f"trainset={tmp_path}/t.npy", f"output={out}",
            "pq_parts=2", "opq=true",
            "M=2", "K=16", "L=1", "de=4", "dh=8", "A=0", "B=1",
            "batch=256", "ds.valset=256", "epochs=1",
            "scheduler.stop_patience=0", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None
    assert out.exists()

    rc = run_qinco.main(
        [
            "task=eval_pq", f"db={tmp_path}/t.npy", f"model={out}",
            "batch=256", "ds.db=512", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None
