"""Behavioral parity against the actual reference implementation.

Imports the reference's torch model (read-only, from /root/reference),
builds it with random weights, converts its state_dict through our
``params_from_torch_state`` importer, and checks that encode codes and
decode reconstructions agree.  This is the strongest possible parity
oracle available offline (pretrained checkpoints can't be downloaded in
this environment).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


class _FakeAccel:
    device = torch.device("cpu")

    def print(self, *a, **k):
        pass


def _make_ref_model(D=16, K=16, M=3, L=2, de=12, dh=20, A=4, B=3, qinco1=False):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from qinco.utils import SharedCfgState  # reference module
    from qinco.model.qinco_base import QINCo

    cfg = SharedCfgState(
        {
            "K": K,
            "M": M,
            "L": L,
            "de": de,
            "dh": dh,
            "A": A,
            "B": B,
            "ivf_K": None,
            "ivf_in_use": False,
            "qinco1_mode": qinco1,
            "task": "eval",
            "enc_max_bs": 2**30,
            "codebook_noise_init": 0.1,
        }
    )
    cfg._accelerator = _FakeAccel()
    cfg._M_ivf = M
    cfg._K_vals = [K] * M
    cfg._D = D
    cfg._ivf_book = None
    cfg._qinco_jit = False

    torch.manual_seed(0)
    model = QINCo(cfg)
    model.data_mean.copy_(torch.randn(D) * 0.1)
    model.data_std.copy_(torch.tensor(1.5))
    # randomize the zero-initialized weights so the MLP is non-trivial
    with torch.no_grad():
        for p in model.parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.05)
    model.eval()
    return model, cfg


def _convert(model, spec):
    import jax

    from qinco_tpu.checkpoint import params_from_torch_state
    from qinco_tpu.models.params import init_model_state, init_params

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    template = init_params(jax.random.PRNGKey(0), spec)
    mstate = init_model_state(spec)
    return params_from_torch_state(sd, spec, template, mstate)


@pytest.mark.parametrize("qinco1", [False, True])
def test_decode_parity_with_reference(qinco1):
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.models.qinco import decode

    D, K, M, L, de, dh = 16, 16, 3, 2, 12, 20
    A, B = (0, 1) if qinco1 else (4, 3)
    model, cfg = _make_ref_model(D, K, M, L, de, dh, A, B, qinco1)
    spec = QincoSpec(D=D, K=K, M=M, L=L, de=de, dh=dh, A=A, B=B, qinco1_mode=qinco1)
    params, _ = _convert(model, spec)

    rng = np.random.default_rng(0)
    codes = np.stack([rng.integers(0, K, size=32) for _ in range(M)]).astype(np.int64)

    with torch.no_grad():
        # reference decode works in normalized space via step='decode'
        want = model(torch.from_numpy(codes), step="decode").numpy()

    import jax.numpy as jnp

    got_norm = decode(params, spec, jnp.asarray(codes.astype(np.int32)))
    got = np.asarray(got_norm) * np.asarray(params.data_std) + np.asarray(
        params.data_mean
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("qinco1", [False, True])
def test_encode_parity_with_reference(qinco1):
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.models.qinco import encode_raw, decode_raw

    D, K, M, L, de, dh = 16, 16, 3, 2, 12, 20
    A, B = (0, 1) if qinco1 else (4, 3)
    model, cfg = _make_ref_model(D, K, M, L, de, dh, A, B, qinco1)
    spec = QincoSpec(D=D, K=K, M=M, L=L, de=de, dh=dh, A=A, B=B, qinco1_mode=qinco1)
    params, _ = _convert(model, spec)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, D)).astype(np.float32) * 1.5

    with torch.no_grad():
        want_codes = model(torch.from_numpy(x), step="encode").numpy()

    import jax.numpy as jnp

    got_codes = np.asarray(encode_raw(params, spec, jnp.asarray(x)))
    frac = (got_codes == want_codes).mean()
    assert frac >= 0.97, f"code agreement {frac}\n{got_codes}\n{want_codes}"

    # Reconstruction parity is what actually matters under fp tie-breaks
    with torch.no_grad():
        want_rec = model(torch.from_numpy(want_codes), step="decode").numpy()
    got_rec = np.asarray(decode_raw(params, spec, jnp.asarray(got_codes)))
    want_mse = float(((want_rec - x) ** 2).mean())
    got_mse = float(((got_rec - x) ** 2).mean())
    assert got_mse <= want_mse * 1.01, (got_mse, want_mse)


def test_convert_task_cli_roundtrip(tmp_path):
    """Full convert surface: reference torch checkpoint (with the
    reference's own save layout) -> convert task -> eval produces the
    same reconstructions."""
    import run_qinco
    import jax.numpy as jnp

    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.models.qinco import decode_raw
    from qinco_tpu.checkpoint import load_checkpoint
    from qinco_tpu.models.params import init_model_state, init_params
    import jax

    D, K, M, L, de, dh, A, B = 12, 16, 3, 2, 10, 14, 4, 3
    model, cfg_ref = _make_ref_model(D, K, M, L, de, dh, A, B, qinco1=False)

    # reference checkpoint layout (qinco/utils.py:100-137)
    pt_path = tmp_path / "ref.pt"
    torch.save(
        {
            "epoch": 42,
            "model": model.state_dict(),
            "optimizer": None,
            "scheduler": None,
            "logger": None,
            "parameters": {
                "K": K, "M": M, "de": de, "dh": dh, "L": L, "A": A, "B": B,
                "ivf_in_use": False, "qinco1_mode": False,
            },
            "data_dim": D,
        },
        str(pt_path),
    )

    out = tmp_path / "converted.npz"
    rc = run_qinco.main(
        ["task=convert", f"model={pt_path}", f"output={out}", "verbose=false"]
    )
    assert rc == 0 or rc is None
    assert out.exists()

    spec = QincoSpec(D=D, K=K, M=M, L=L, de=de, dh=dh, A=A, B=B)
    restored = load_checkpoint(
        out,
        params_template=init_params(jax.random.PRNGKey(0), spec),
        mstate_template=init_model_state(spec),
    )
    assert restored["meta"]["epoch"] == 42
    params = restored["params"]

    codes = np.random.default_rng(0).integers(0, K, size=(M, 8)).astype(np.int32)
    got = np.asarray(decode_raw(params, spec, jnp.asarray(codes)))
    with torch.no_grad():
        want = model(torch.from_numpy(codes.astype(np.int64)), step="decode").numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_convert_v1_era_checkpoint_uses_dataset_norms(tmp_path):
    """QINCo1-era checkpoints carry no data_mean/std and use the v1 module
    layout (in/out proj inside residual_blocks, stray step-0 substep
    codebook); `db=` pulls the reference's per-dataset normalization
    tables (qinco_tasks.py:509-560)."""
    import run_qinco
    import jax
    import jax.numpy as jnp

    from qinco_tpu.checkpoint import load_checkpoint
    from qinco_tpu.models.params import init_model_state, init_params
    from qinco_tpu.models.qinco import decode_raw
    from qinco_tpu.models.spec import QincoSpec
    from qinco_tpu.tasks.convert_task import v1_dataset_norms

    D, K, M, L, de, dh = 128, 16, 3, 2, 8, 12  # bigann dims
    rng = np.random.default_rng(3)
    f32 = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))

    sd = {"steps.0.codebook.weight": f32(K, D),
          "steps.0.substep.codebook.weight": f32(K, D)}  # v1 stray key
    for m in range(1, M):
        sd[f"steps.{m}.codebook.weight"] = f32(K, D)
        sd[f"steps.{m}.concat.mlp.weight"] = f32(de, de + D)
        sd[f"steps.{m}.concat.mlp.bias"] = f32(de)
        # v1 layout: projections nested inside residual blocks
        sd[f"steps.{m}.residual_blocks.0.in_proj.weight"] = f32(de, D)
        sd[f"steps.{m}.residual_blocks.0.out_proj.weight"] = f32(D, de)
        for l in range(L):
            sd[f"steps.{m}.residual_blocks.{l}.up_proj.weight"] = f32(dh, de)
            sd[f"steps.{m}.residual_blocks.{l}.down_proj.weight"] = f32(de, dh)

    pt_path = tmp_path / "v1.pt"
    torch.save(
        {
            "epoch": 7,
            "model": sd,
            "parameters": {
                "K": K, "M": M, "de": de, "dh": dh, "L": L, "A": 0, "B": 1,
                "ivf_in_use": False, "qinco1_mode": True,
            },
        },
        str(pt_path),
    )

    out = tmp_path / "v1.npz"
    rc = run_qinco.main(
        ["task=convert", f"model={pt_path}", f"output={out}",
         "db=bigann1B", "verbose=false"]
    )
    assert rc == 0 or rc is None

    spec = QincoSpec(D=D, K=K, M=M, L=L, de=de, dh=dh, A=0, B=1,
                     qinco1_mode=True)
    restored = load_checkpoint(
        out,
        params_template=init_params(jax.random.PRNGKey(0), spec),
        mstate_template=init_model_state(spec),
    )
    params = restored["params"]

    dim, mean, std = v1_dataset_norms("bigann1B")
    assert dim == D
    np.testing.assert_allclose(np.asarray(params.data_mean), mean)
    np.testing.assert_allclose(float(params.data_std), std)
    # the renamed projections landed where decode expects them
    np.testing.assert_allclose(
        np.asarray(params.steps.in_proj[0]),
        sd["steps.1.residual_blocks.0.in_proj.weight"].T, rtol=1e-6)

    codes = rng.integers(0, K, size=(M, 8)).astype(np.int32)
    rec = np.asarray(decode_raw(params, spec, jnp.asarray(codes)))
    assert np.isfinite(rec).all()
