"""2-process multi-host regression: spawns two real ``jax.distributed``
processes (4 virtual CPU devices each → one 8-device global mesh) and
asserts train-step and encode parity with a single-process run.

This is the test the reference never had for its DDP/NCCL stack
(SURVEY.md §4: "Distributed testing: none").
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(77)
    db = rng.normal(size=(80, 8)).astype(np.float32)
    np.save(tmpdir / "db.npy", db)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo_root = str(WORKER.parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port), str(tmpdir)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return tmpdir, db


def test_two_process_train_matches_single_process(multihost_run):
    tmpdir, _ = multihost_run
    import jax

    from qinco_tpu.config import load_config
    from qinco_tpu.models import QincoSpec, init_model_state, init_params
    from qinco_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from qinco_tpu.train.train_step import build_optimizer, make_train_step

    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(0), spec)
    mstate = init_model_state(spec)
    cfg = load_config({"K": spec.K, "M": spec.M, "lr": 1e-2})
    tx = build_optimizer(cfg, params, spec)
    opt_state = tx.init(params)
    step = make_train_step(spec, tx, grad_clip=0.1)

    mesh = make_mesh()
    params = replicate(mesh, params)
    mstate = replicate(mesh, mstate)
    opt_state = replicate(mesh, opt_state)
    data = np.random.default_rng(42).normal(size=(64, spec.D)).astype(np.float32)

    losses = []
    for _ in range(3):
        xb = shard_batch(mesh, data)
        wb = shard_batch(mesh, np.ones((64,), np.float32))
        params, opt_state, mstate, out = step(params, opt_state, mstate, xb, wb)
        losses.append(float(out.total_loss))

    mh_losses = json.load(open(tmpdir / "mh_losses.json"))
    np.testing.assert_allclose(losses, mh_losses, rtol=1e-5)

    mh = np.load(tmpdir / "mh_params.npz")
    ref_leaves = [np.asarray(a) for a in jax.tree.leaves(jax.device_get(params))]
    assert len(ref_leaves) == len(mh.files)
    for i, leaf in enumerate(ref_leaves):
        np.testing.assert_allclose(
            leaf, mh[f"leaf{i}"], rtol=1e-4, atol=1e-5,
            err_msg=f"param leaf {i} diverged between 1-proc and 2-proc runs",
        )


def test_two_process_encode_part_files(multihost_run):
    tmpdir, db = multihost_run
    import jax

    from qinco_tpu.config import load_config
    from qinco_tpu.models import QincoSpec, init_params
    from qinco_tpu.models.qinco import encode_chunked
    from qinco_tpu.tasks.search_tasks import EncodedDBIterator

    cfg = load_config({"K": 16, "M": 3})
    it = EncodedDBIterator(cfg, str(tmpdir / "enc.npz"))
    assert it.n_parts == 2
    codes = it.load_all()
    assert codes.shape == (80, 3)

    # Single-process reference encode with the same seed-0 model.
    spec = QincoSpec(D=8, K=16, M=3, L=1, de=6, dh=12, A=4, B=2)
    params = init_params(jax.random.PRNGKey(0), spec)
    ref = encode_chunked(params, spec, db, batch=16).T
    np.testing.assert_array_equal(codes, ref)
