import jax.numpy as jnp
import numpy as np
import pytest

from qinco_tpu.ops.distances import (
    batch_sqdist,
    batch_sqdist_partial,
    chunked_argmin,
    pairwise_sqdist,
    pairwise_sqdist_partial,
    sqdist_topk,
    topk_smallest,
)
from oracle import np_pairwise_sqdist


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_pairwise_sqdist_matches_numpy(rng):
    a = rng.normal(size=(17, 24)).astype(np.float32)
    b = rng.normal(size=(33, 24)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np_pairwise_sqdist(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_partial_distance_is_rank_equivalent(rng):
    a = rng.normal(size=(9, 16)).astype(np.float32)
    b = rng.normal(size=(21, 16)).astype(np.float32)
    full = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    part = np.asarray(pairwise_sqdist_partial(jnp.asarray(a), jnp.asarray(b)))
    # identical candidate ranking
    np.testing.assert_array_equal(
        np.argsort(full, axis=-1, kind="stable"),
        np.argsort(part, axis=-1, kind="stable"),
    )


def test_batch_sqdist(rng):
    a = rng.normal(size=(4, 5, 12)).astype(np.float32)
    b = rng.normal(size=(4, 7, 12)).astype(np.float32)
    got = np.asarray(batch_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.stack(
        [np_pairwise_sqdist(a[i].astype(np.float64), b[i].astype(np.float64)) for i in range(4)]
    )
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    part = np.asarray(batch_sqdist_partial(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(
        np.argsort(got, axis=-1, kind="stable"),
        np.argsort(part, axis=-1, kind="stable"),
    )


def test_topk_smallest_sorted_ascending(rng):
    d = rng.normal(size=(6, 40)).astype(np.float32)
    idx, vals = topk_smallest(jnp.asarray(d), 5)
    idx, vals = np.asarray(idx), np.asarray(vals)
    want_idx = np.argsort(d, axis=-1)[:, :5]
    np.testing.assert_array_equal(idx, want_idx)
    assert np.all(np.diff(vals, axis=-1) >= 0)


def test_sqdist_topk_agrees_with_exact(rng):
    a = rng.normal(size=(11, 8)).astype(np.float32)
    b = rng.normal(size=(64, 8)).astype(np.float32)
    idx, _ = sqdist_topk(jnp.asarray(a), jnp.asarray(b), 4)
    want = np.argsort(np_pairwise_sqdist(a, b), axis=-1)[:, :4]
    np.testing.assert_array_equal(np.asarray(idx), want)


@pytest.mark.parametrize("K,chunk", [(64, 64), (256, 64), (512, 512)])
def test_chunked_argmin(rng, K, chunk):
    x = rng.normal(size=(23, 16)).astype(np.float32)
    book = rng.normal(size=(K, 16)).astype(np.float32)
    codes, _ = chunked_argmin(jnp.asarray(x), jnp.asarray(book), chunk=chunk)
    want = np.argmin(np_pairwise_sqdist(x, book), axis=-1)
    np.testing.assert_array_equal(np.asarray(codes), want)


def test_packed_id_distances_preserve_ordering():
    """The low-8-bit id packing used by the Pallas kernels must keep f32
    ordering except on ~2^-15-relative ties, and ids must round-trip."""
    import jax

    from qinco_tpu.ops.pallas_kernels import _pack_ids_f32

    rng = np.random.default_rng(0)
    d = jnp.asarray(np.sort(rng.gamma(2.0, 10.0, size=512)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 256, size=512).astype(np.int32))
    packed = _pack_ids_f32(d, ids)
    # ids round-trip exactly
    got = np.asarray(
        jax.lax.bitcast_convert_type(packed, jnp.int32)
    ) & 0xFF
    np.testing.assert_array_equal(got, np.asarray(ids))
    # values unchanged beyond 2^-15 relative
    rel = np.abs(np.asarray(packed) - np.asarray(d)) / np.asarray(d)
    assert rel.max() < 2.0 ** -14
    # ordering preserved for pairs separated by > 2^-13 relative
    p = np.asarray(packed)
    dv = np.asarray(d)
    for i in range(0, 500, 7):
        j = i + 1
        if (dv[j] - dv[i]) / dv[i] > 2.0 ** -13:
            assert p[j] > p[i]
