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
