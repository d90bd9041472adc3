"""End-to-end task tests through the CLI surface on tiny synthetic data."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import run_qinco

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    """A tiny clusterable dataset written as .npy."""
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(32, 16)).astype(np.float32) * 3
    assign = rng.integers(0, 32, size=3000)
    x = centers[assign] + 0.3 * rng.normal(size=(3000, 16)).astype(np.float32)
    path = tmp / "train.npy"
    np.save(path, x)
    return path, x


def run_cli(args):
    return run_qinco.main(args)


def test_train_eval_resume_cycle(tiny_data, tmp_path):
    path, x = tiny_data
    out = tmp_path / "model.npz"
    common = [
        f"trainset={path}",
        f"output={out}",
        "M=4", "K=16", "L=1", "de=8", "dh=16", "A=4", "B=2",
        "batch=256",
        "ds.valset=256",
        "epochs=2",
        "scheduler.stop_patience=0",
        "lr=0.004",
        "verbose=false",
    ]
    # train 2 epochs (stop_patience=0 -> stops at epochs+0... need best tracking)
    rc = run_cli(["task=train", *common])
    assert rc == 0 or rc is None
    assert out.exists()

    # eval_valset from the checkpoint: no model args needed (re-hydrated)
    rc = run_cli(
        [
            "task=eval_valset",
            f"trainset={path}",
            f"model={out}",
            "output=" + str(tmp_path / "unused.npz"),
            "batch=256",
            "ds.valset=256",
            "verbose=false",
        ]
    )
    assert rc == 0 or rc is None

    # eval on the db surface
    rc = run_cli(
        [
            "task=eval",
            f"db={path}",
            f"model={out}",
            "batch=256",
            "ds.db=512",
            "verbose=false",
        ]
    )
    assert rc == 0 or rc is None

    # resume training from the checkpoint
    rc = run_cli(["task=train", "resume=true", *common, "epochs=3"])
    assert rc == 0 or rc is None


def test_training_improves_val_mse(tiny_data, tmp_path):
    """A few epochs of training must improve validation MSE substantially
    over the noisy RQ-initialized starting point."""
    from qinco_tpu.config import load_config
    from qinco_tpu.tasks.train_task import TrainTask
    from qinco_tpu.train.loop import compute_mse

    path, x = tiny_data
    out = tmp_path / "model2.npz"
    cfg = load_config(
        [
            "task=train",
            f"trainset={path}",
            f"output={out}",
            "M=4", "K=16", "L=1", "de=8", "dh=16", "A=4", "B=2",
            "batch=256", "ds.valset=256", "epochs=5",
            "scheduler.stop_patience=0", "lr=0.004", "verbose=false",
        ]
    )
    task = TrainTask(cfg)
    initial = compute_mse(
        task.params, task.spec, task.val_loader, mse_scale=cfg.mse_scale
    )
    best = task.run()
    assert np.isfinite(best)
    assert best < initial * 0.7, f"trained {best} vs initial {initial}"


def test_encode_task_part_files(tiny_data, tmp_path):
    path, x = tiny_data
    model = tmp_path / "m.npz"
    run_cli(
        [
            "task=train", f"trainset={path}", f"output={model}",
            "M=2", "K=16", "L=1", "de=8", "dh=16", "A=0", "B=1",
            "batch=256", "ds.valset=256", "epochs=1",
            "scheduler.stop_patience=0", "verbose=false",
        ]
    )
    enc_out = tmp_path / "codes.npz"
    run_cli(
        [
            "task=encode", f"db={path}", f"model={model}",
            f"output={enc_out}", "batch=256", "ds.db=600", "verbose=false",
        ]
    )
    header = np.load(enc_out)
    assert int(header["n_parts"]) == 1
    codes = np.load(tmp_path / "codes.part_0.npz")["codes"]
    assert codes.shape == (600, 2)
    assert codes.dtype == np.int32

    # EncodedDBIterator round-trip
    from qinco_tpu.config import load_config
    from qinco_tpu.tasks.search_tasks import EncodedDBIterator

    cfg = load_config({})
    it = EncodedDBIterator(cfg, str(enc_out))
    allc = it.load_all()
    np.testing.assert_array_equal(allc, codes)
    assert cfg.K == 16 and cfg.M == 2


def test_eval_time_cli(tiny_data, tmp_path):
    """eval_time surface: reports per-vector timings and writes a
    profiler trace."""
    path, x = tiny_data
    model = tmp_path / "mt.npz"
    run_cli(
        [
            "task=train", f"trainset={path}", f"output={model}",
            "M=2", "K=16", "L=1", "de=8", "dh=16", "A=4", "B=2",
            "batch=256", "ds.valset=256", "epochs=1",
            "scheduler.stop_patience=0", "verbose=false",
        ]
    )
    trace_dir = tmp_path / "trace"
    rc = run_cli(
        [
            "task=eval_time", f"db={path}", f"model={model}",
            f"profile_dir={trace_dir}",
            "batch=256", "ds.db=512", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None
    assert trace_dir.exists() and any(trace_dir.rglob("*"))


def test_logger_early_stop_on_patience(tiny_data, tmp_path):
    from qinco_tpu.config import load_config
    from qinco_tpu.logsys import MetricLogger

    cfg = load_config(["scheduler.stop_patience=2", "task=train", "epochs=100"])
    melog = MetricLogger(cfg, is_main=False)
    melog.cur_epoch = 0
    melog.best_mse = 1.0
    melog.best_mse_epoch = 0
    for epoch in range(1, 10):
        melog.cur_epoch = epoch
        if melog.should_stop():
            break
    assert epoch == 3  # 0 best + patience 2 -> stops at epoch 3

    # state roundtrip
    state = melog.state_dict()
    melog2 = MetricLogger(cfg, is_main=False)
    melog2.load_state_dict(state)
    assert melog2.best_mse == melog.best_mse
    assert melog2.best_mse_epoch == melog.best_mse_epoch


def test_qinco1_preset_training(tiny_data, tmp_path):
    """QINCo1 recipe end-to-end: adam + plateau schedule, A=0, B=1,
    qinco1_mode normalization."""
    path, x = tiny_data
    out = tmp_path / "q1.npz"
    rc = run_cli(
        [
            "task=train", "model_args=qinco1", f"trainset={path}",
            f"output={out}",
            "M=3", "K=16", "L=1", "dh=12",
            # plateau mode stops on patience, not epochs (reference
            # parity); a tiny lr stalls val MSE so the test ends fast
            "batch=256", "ds.valset=256", "lr=1e-7",
            "scheduler.stop_patience=0", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None
    assert out.exists()
    from qinco_tpu.checkpoint import load_checkpoint_meta

    meta = load_checkpoint_meta(out)
    assert meta["parameters"]["qinco1_mode"] is True
    assert meta["parameters"]["A"] == 0
