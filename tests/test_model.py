"""Model-core tests against the NumPy oracle (tests/oracle.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qinco_tpu.models import (
    QincoSpec,
    decode,
    encode,
    init_params,
    train_forward,
)
from qinco_tpu.models.qinco import encode_chunked, encode_raw, decode_raw
from oracle import np_decode, np_encode

SPECS = {
    "qinco2_beam": QincoSpec(D=12, K=16, M=4, L=2, de=10, dh=14, A=4, B=3),
    "qinco2_nosub": QincoSpec(D=12, K=16, M=4, L=1, de=10, dh=14, A=0, B=3),
    "qinco2_greedy": QincoSpec(D=8, K=16, M=3, L=2, de=None, dh=12, A=4, B=1),
    "qinco1": QincoSpec(D=8, K=16, M=3, L=2, de=None, dh=12, A=0, B=1, qinco1_mode=True),
    "ivf": QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=10, A=4, B=3, ivf_K=32),
}


def make_params(spec, seed=0):
    params = init_params(jax.random.PRNGKey(seed), spec)
    if spec.ivf_in_use:
        # random but fixed IVF centroids
        cb0 = jax.random.normal(jax.random.PRNGKey(seed + 1), (spec.ivf_K, spec.D))
        params = params._replace(codebook0=cb0)
    # perturb the zero-initialized weights so the MLP actually does something
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 2), len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("name", list(SPECS))
def test_decode_matches_oracle(name):
    spec = SPECS[name]
    params = make_params(spec)
    rng = np.random.default_rng(0)
    codes = np.stack(
        [rng.integers(0, k, size=11) for k in spec.K_vals]
    ).astype(np.int32)
    got = np.asarray(decode(params, spec, jnp.asarray(codes)))
    want = np_decode(spec, params, codes)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", list(SPECS))
def test_encode_matches_oracle(name):
    spec = SPECS[name]
    params = make_params(spec)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, spec.D)).astype(np.float32)

    codes, xhat, stats = encode(params, spec, jnp.asarray(x))
    codes = np.asarray(codes)
    want = np_encode(spec, params, x)

    frac_equal = (codes == want).mean()
    assert frac_equal >= 0.95, f"{frac_equal=}\n{codes=}\n{want=}"

    # reconstruction from returned xhat must equal decode of the codes
    dec = np.asarray(decode(params, spec, jnp.asarray(codes)))
    np.testing.assert_allclose(np.asarray(xhat), dec, rtol=1e-3, atol=1e-3)

    assert stats.xtarget_mean.shape == (spec.n_mlp_steps, spec.D)
    assert stats.xtarget_std.shape == (spec.n_mlp_steps, spec.D)


def test_encode_greedy_improves_with_beam():
    """Wider beam must not reconstruct worse than greedy on average."""
    spec_g = SPECS["qinco2_greedy"]
    spec_b = spec_g.with_(B=8)
    params = make_params(spec_g, seed=3)
    x = np.random.default_rng(2).normal(size=(64, spec_g.D)).astype(np.float32)
    _, xh_g, _ = encode(params, spec_g, jnp.asarray(x))
    _, xh_b, _ = encode(params, spec_b, jnp.asarray(x))
    mse_g = float(((np.asarray(xh_g) - x) ** 2).mean())
    mse_b = float(((np.asarray(xh_b) - x) ** 2).mean())
    assert mse_b <= mse_g + 1e-6


def test_encode_chunked_matches_single_shot():
    spec = SPECS["qinco2_beam"]
    params = make_params(spec, seed=5)
    x = np.random.default_rng(3).normal(size=(37, spec.D)).astype(np.float32)
    x_n = jnp.asarray(x)
    full = np.asarray(encode_raw(params, spec, x_n))
    chunked = encode_chunked(params, spec, x, batch=10)
    np.testing.assert_array_equal(full, chunked)


def test_raw_roundtrip_normalization():
    spec = SPECS["qinco2_beam"]
    params = make_params(spec, seed=7)
    params = params._replace(
        data_mean=jnp.arange(spec.D, dtype=jnp.float32) * 0.1,
        data_std=jnp.float32(2.5),
    )
    x = np.random.default_rng(4).normal(size=(8, spec.D)).astype(np.float32)
    codes = encode_raw(params, spec, jnp.asarray(x))
    xhat = decode_raw(params, spec, codes)
    # raw decode == normalized decode * std + mean
    x_n = (jnp.asarray(x) - params.data_mean) / params.data_std
    codes2, xh_n, _ = encode(params, spec, x_n)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    np.testing.assert_allclose(
        np.asarray(xhat),
        np.asarray(xh_n) * 2.5 + np.asarray(params.data_mean),
        rtol=1e-5,
        atol=1e-5,
    )


@pytest.mark.parametrize("name", ["qinco2_beam", "ivf", "qinco1"])
def test_train_forward_losses(name):
    spec = SPECS[name]
    params = make_params(spec, seed=9)
    x = np.random.default_rng(5).normal(size=(16, spec.D)).astype(np.float32)
    total, codes, aux, stats = train_forward(params, spec, jnp.asarray(x))
    assert np.isfinite(float(total))
    assert codes.shape == (spec.M_ivf, 16)
    # total equals the sum of the reported scalar losses
    parts = [v for k, v in aux.items() if k != "xhat"]
    np.testing.assert_allclose(float(total), float(sum(parts)), rtol=1e-5)

    # gradients flow and IVF codebook stays frozen
    def loss_fn(p):
        return train_forward(p, spec, jnp.asarray(x))[0]

    grads = jax.grad(loss_fn)(params)
    g_leaves = jax.tree_util.tree_leaves(grads.steps)
    assert any(float(jnp.abs(g).sum()) > 0 for g in g_leaves)
    if spec.ivf_in_use:
        assert float(jnp.abs(grads.codebook0).sum()) == 0.0


def test_spec_from_cfg_plumbs_kernel_knobs():
    """Round-4 advisor: docs recommended `fused_select=true` via config
    but spec_from_cfg never read it (silent no-op).  Every kernel knob
    the docs name must round-trip config -> spec."""
    from qinco_tpu.config import load_config
    from qinco_tpu.models.spec import spec_from_cfg

    cfg = load_config({
        "K": 64, "M": 4, "L": 2, "dh": 32, "de": 16, "A": 8, "B": 4,
        "pallas": True, "fast_encode": True, "compute_dtype": "bfloat16",
        "fused_select": True, "fused_topa": False, "fold_up": False,
        "row_tile": 512, "select_tile": 32, "perbin": True,
        "fused_substep": True,
    })
    spec = spec_from_cfg(cfg, D=32)
    assert spec.pallas and spec.fast and spec.fused_substep and spec.perbin
    assert spec.fused_select is True
    assert spec.fused_topa is False
    assert spec.fold_up is False
    assert spec.row_tile == 512
    assert spec.select_tile == 32
    assert spec.compute_dtype == "bfloat16"


def test_bench_ladder_profiles_construct_and_encode():
    """Every bench.py ladder rung's overrides must build a valid
    QincoSpec and run one tiny encode on CPU — catches override typos
    or route regressions before they burn TPU bench budget."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import bench
    from qinco_tpu.models import init_params
    from qinco_tpu.models.qinco import encode
    from qinco_tpu.models.spec import QincoSpec

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    )
    for prof in bench.PROFILES:
        kw = dict(D=16, K=16, M=3, L=1, de=8, dh=16, A=4, B=4)
        kw.update(prof["overrides"])
        kw.pop("row_tile", None)  # production tile sizes don't fit tiny shapes
        spec = QincoSpec(**kw)
        params = init_params(jax.random.PRNGKey(0), spec)
        codes, xhat, _ = encode(params, spec, x)
        assert codes.shape == (spec.M, 16), prof["name"]
        assert np.isfinite(np.asarray(xhat)).all(), prof["name"]


def test_encode_profile_bundles():
    """encode_profile=speed|parity|exact expands to the measured knob
    bundles; explicit overrides still win."""
    import pytest

    from qinco_tpu.config import load_config
    from qinco_tpu.models.spec import spec_from_cfg

    cfg = load_config(["encode_profile=speed", "K=16", "M=2", "L=1",
                       "dh=8", "A=4", "B=2"])
    spec = spec_from_cfg(cfg, D=8)
    assert spec.pallas and spec.fast and spec.fused_substep
    assert spec.perbin and spec.fused_select
    assert spec.compute_dtype == "bfloat16"

    cfg = load_config(["encode_profile=parity", "K=16", "M=2", "L=1",
                       "dh=8", "A=4", "B=2", "compute_dtype=float32"])
    spec = spec_from_cfg(cfg, D=8)
    assert spec.pallas and spec.fast and spec.fused_select
    assert not spec.fused_substep
    assert spec.compute_dtype == "float32"  # explicit override wins

    cfg = load_config(["encode_profile=exact", "K=16", "M=2", "L=1",
                       "dh=8", "A=4", "B=2"])
    spec = spec_from_cfg(cfg, D=8)
    assert not spec.pallas and not spec.fast

    with pytest.raises(ValueError, match="encode_profile"):
        load_config(["encode_profile=warp"])
