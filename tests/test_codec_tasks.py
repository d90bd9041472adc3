"""CLI surfaces for the QINCo1-era codec and two-stage search
(reference drivers: qinco_v1/codec_qinco.py, qinco_v1/search_2stage.py)."""

import json

import numpy as np
import pytest

import run_qinco

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def flat_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("codec")
    rng = np.random.default_rng(0)
    D = 12
    centers = rng.normal(size=(64, D)).astype(np.float32) * 3

    def sample(n, seed):
        r = np.random.default_rng(seed)
        return (
            centers[r.integers(0, 64, size=n)]
            + 0.3 * r.normal(size=(n, D)).astype(np.float32)
        ).astype(np.float32)

    train = sample(3000, 1)
    db = sample(1000, 2)
    queries = db[:40] + 0.01 * rng.normal(size=(40, D)).astype(np.float32)
    d = ((queries[:, None, :] - db[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10].astype(np.int32)

    np.save(tmp / "train.npy", train)
    np.save(tmp / "db.npy", db)
    np.save(tmp / "queries.npy", queries)
    np.save(tmp / "gt.npy", gt)
    run_qinco.main(
        [
            "task=train", f"trainset={tmp}/train.npy",
            f"output={tmp}/model.npz",
            "M=4", "K=16", "L=1", "de=8", "dh=12", "A=4", "B=2",
            "batch=512", "ds.valset=500", "epochs=2",
            "scheduler.stop_patience=0", "lr=0.004", "verbose=false",
        ]
    )
    return tmp


def test_encode_decode_codec_roundtrip_npy(flat_model):
    tmp = flat_model
    run_qinco.main(
        [
            "task=encode_codec", f"model={tmp}/model.npz",
            f"db={tmp}/db.npy", f"output={tmp}/codes.npy",
            "batch=512", "verbose=false",
        ]
    )
    codes = np.load(tmp / "codes.npy")
    assert codes.shape == (1000, 4) and codes.dtype == np.int32
    assert codes.max() < 16

    run_qinco.main(
        [
            "task=decode_codec", f"model={tmp}/model.npz",
            f"encoded_db={tmp}/codes.npy", f"output={tmp}/decoded.npy",
            "batch=512", "verbose=false",
        ]
    )
    dec = np.load(tmp / "decoded.npy")
    db = np.load(tmp / "db.npy")
    assert dec.shape == db.shape
    # quantization error well below data energy on this clustered set
    assert ((dec - db) ** 2).mean() < (db**2).mean() * 0.5


def test_encode_decode_codec_roundtrip_packed(flat_model):
    tmp = flat_model
    run_qinco.main(
        [
            "task=encode_codec", f"model={tmp}/model.npz",
            f"db={tmp}/db.npy", f"output={tmp}/codes.qcod",
            "batch=512", "verbose=false",
        ]
    )
    # 4 codes x 4 bits = 2 bytes/vector + 20-byte header
    assert (tmp / "codes.qcod").stat().st_size == 20 + 2 * 1000

    run_qinco.main(
        [
            "task=decode_codec", f"model={tmp}/model.npz",
            f"encoded_db={tmp}/codes.qcod", f"output={tmp}/decoded2.npy",
            "batch=512", "verbose=false",
        ]
    )
    dec2 = np.load(tmp / "decoded2.npy")
    dec1 = np.load(tmp / "decoded.npy") if (tmp / "decoded.npy").exists() else None
    if dec1 is not None:
        np.testing.assert_array_equal(dec1, dec2)


def test_search_2stage_task(flat_model):
    tmp = flat_model
    run_qinco.main(
        [
            "task=search_2stage", f"model={tmp}/model.npz",
            f"trainset={tmp}/train.npy", f"db={tmp}/db.npy",
            f"queries={tmp}/queries.npy", f"queries_gt={tmp}/gt.npy",
            f"output={tmp}/res2stage.json",
            "search.nshort=[100,200]", "search.batch_size=512",
            "batch=512", "ds.valset=500", "verbose=false",
        ]
    )
    res = json.loads((tmp / "res2stage.json").read_text())
    assert set(res) == {"100", "200"} or set(res) == {100, 200} or len(res) == 2
    best = max(r["100"] for r in res.values())
    assert best > 0.9, res
