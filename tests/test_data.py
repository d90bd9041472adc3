import numpy as np
import pytest

from qinco_tpu.config import load_config
from qinco_tpu.data.datasets import BlockShuffledLoader, load_vec_trainset
from qinco_tpu.data.vecs_io import (
    bvecs_mmap,
    bvecs_write,
    fvecs_mmap,
    fvecs_write,
    ivecs_mmap,
    ivecs_write,
    open_vectors,
)


def test_fvecs_roundtrip(tmp_path):
    x = np.random.default_rng(0).normal(size=(13, 7)).astype(np.float32)
    path = tmp_path / "x.fvecs"
    fvecs_write(path, x)
    got = fvecs_mmap(path)
    np.testing.assert_array_equal(np.asarray(got), x)
    np.testing.assert_array_equal(np.asarray(open_vectors(path)), x)


def test_bvecs_roundtrip(tmp_path):
    x = np.random.default_rng(1).integers(0, 255, size=(9, 16)).astype(np.uint8)
    path = tmp_path / "x.bvecs"
    bvecs_write(path, x)
    np.testing.assert_array_equal(np.asarray(bvecs_mmap(path)), x)


def test_ivecs_roundtrip(tmp_path):
    x = np.random.default_rng(2).integers(0, 10**6, size=(5, 100)).astype(np.int32)
    path = tmp_path / "x.ivecs"
    ivecs_write(path, x)
    np.testing.assert_array_equal(np.asarray(ivecs_mmap(path)), x)


def test_loader_covers_all_rows_padded():
    data = np.arange(25 * 3, dtype=np.float32).reshape(25, 3)
    loader = BlockShuffledLoader(data, batch_size=8)
    batches = list(loader)
    assert [b.n_valid for b in batches] == [8, 8, 8, 1]
    assert all(b.x.shape == (8, 3) for b in batches)
    rows = np.concatenate([b.x[: b.n_valid] for b in batches])
    np.testing.assert_array_equal(rows, data)


def test_loader_shuffle_is_epoch_dependent_permutation():
    data = np.arange(64, dtype=np.float32).reshape(32, 2)
    loader = BlockShuffledLoader(data, batch_size=8, shuffle=True, seed=3)
    e0 = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(0)])
    e1 = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(1)])
    assert sorted(e0[:, 0]) == sorted(data[:, 0].tolist())
    assert not np.array_equal(e0, e1)
    # same epoch re-iterated must be deterministic
    e0b = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(0)])
    np.testing.assert_array_equal(e0, e0b)


def test_loader_loop_windows_cover_dataset():
    data = np.arange(10, dtype=np.float32).reshape(10, 1)
    loader = BlockShuffledLoader(data, batch_size=4, loop=4)
    e0 = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(0)])[:, 0]
    e1 = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(1)])[:, 0]
    e2 = np.concatenate([b.x[: b.n_valid] for b in loader.epoch(2)])[:, 0]
    np.testing.assert_array_equal(e0, [0, 1, 2, 3])
    np.testing.assert_array_equal(e1, [4, 5, 6, 7])
    np.testing.assert_array_equal(e2, [8, 9, 0, 1])  # wraps around


def test_loader_sharding_partitions_rows():
    data = np.arange(40, dtype=np.float32).reshape(40, 1)
    rows = []
    for i in range(4):
        loader = BlockShuffledLoader(data, batch_size=5, shard=(i, 4))
        rows.extend(np.concatenate([b.x[: b.n_valid] for b in loader])[:, 0].tolist())
    assert sorted(rows) == list(range(40))


def test_trainset_split(tmp_path):
    x = np.random.default_rng(0).normal(size=(120, 4)).astype(np.float32)
    np.save(tmp_path / "train.npy", x)
    cfg = load_config(
        {
            "trainset": str(tmp_path / "train.npy"),
            "batch": 16,
            "ds.valset": 20,
        }
    )
    (xt, xval), (tl, vl) = load_vec_trainset(cfg)
    assert len(xt) == 100 and len(xval) == 20
    np.testing.assert_array_equal(np.asarray(xval), x[-20:])


def test_config_presets_and_overrides():
    cfg = load_config(["model_args=qinco2-S", "M=16", "ds.loop=1234"])
    assert cfg.L == 2 and cfg.de == 128 and cfg.dh == 256
    assert cfg.A == 16 and cfg.B == 32
    assert cfg.M == 16
    assert cfg.ds.loop == 1234
    assert cfg.lr == pytest.approx(8e-4)

    cfg1 = load_config(preset="qinco1")
    assert cfg1.qinco1_mode is True
    assert cfg1.scheduler.name == "reduce_lr_plateau"
    assert cfg1.optimizer == "adam"
