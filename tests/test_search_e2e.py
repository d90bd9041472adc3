"""End-to-end Figure-3 pipeline on a tiny synthetic dataset, through the
CLI surface: ivf_centroids -> train (IVF model) -> encode trainset+db ->
build_index -> train_pairwise_decoder -> search (flat + IVF)."""

import json
from pathlib import Path

import numpy as np
import pytest

import run_qinco

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(0)
    D = 12
    centers = rng.normal(size=(64, D)).astype(np.float32) * 3

    def sample(n, seed):
        r = np.random.default_rng(seed)
        return (
            centers[r.integers(0, 64, size=n)]
            + 0.3 * r.normal(size=(n, D)).astype(np.float32)
        ).astype(np.float32)

    train = sample(4000, 1)
    db = sample(2000, 2)
    queries = db[:50] + 0.01 * rng.normal(size=(50, D)).astype(np.float32)
    # ground truth: brute-force nearest db row
    d = ((queries[:, None, :] - db[None]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10].astype(np.int32)

    np.save(tmp / "train.npy", train)
    np.save(tmp / "db.npy", db)
    np.save(tmp / "queries.npy", queries)
    np.save(tmp / "gt.npy", gt)
    return {"tmp": tmp, "D": D, "db": db, "queries": queries, "gt": gt}


def test_full_ivf_pipeline(pipeline):
    tmp = pipeline["tmp"]
    ivf_K = 32

    # 1. IVF centroids
    run_qinco.main(
        [
            "task=ivf_centroids", f"trainset={tmp}/train.npy",
            f"output={tmp}/ivf.npy", f"ivf_K={ivf_K}",
            "ds.valset=500", "verbose=false",
        ]
    )
    cents = np.load(tmp / "ivf.npy")
    assert cents.shape == (ivf_K, pipeline["D"])

    # 2. Train an IVF-QINCo model
    run_qinco.main(
        [
            "task=train", f"trainset={tmp}/train.npy",
            f"output={tmp}/model.npz", f"ivf_centroids={tmp}/ivf.npy",
            "M=2", "K=16", "L=1", "de=8", "dh=12", "A=4", "B=2",
            "batch=512", "ds.valset=500", "epochs=2",
            "scheduler.stop_patience=0", "lr=0.004", "verbose=false",
        ]
    )

    # 3. Encode trainset and DB
    run_qinco.main(
        [
            "task=encode", f"trainset={tmp}/train.npy",
            f"model={tmp}/model.npz", f"ivf_centroids={tmp}/ivf.npy",
            f"output={tmp}/codes_train.npz", "encode_trainset=true",
            "batch=512", "ds.valset=500", "verbose=false",
        ]
    )
    run_qinco.main(
        [
            "task=encode", f"db={tmp}/db.npy", f"model={tmp}/model.npz",
            f"ivf_centroids={tmp}/ivf.npy",
            f"output={tmp}/codes_db.npz", "batch=512", "verbose=false",
        ]
    )
    codes = np.load(tmp / "codes_db.part_0.npz")["codes"]
    assert codes.shape == (2000, 3)  # ivf code + M=2
    assert codes[:, 0].max() < ivf_K

    # 4. Build index
    run_qinco.main(
        [
            "task=build_index", f"trainset={tmp}/train.npy",
            f"ivf_centroids={tmp}/ivf.npy",
            f"encoded_trainset={tmp}/codes_train.npz",
            f"encoded_db={tmp}/codes_db.npz",
            f"output={tmp}/index.qivf", "ds.valset=500", "verbose=false",
        ]
    )
    assert (tmp / "index.qivf").exists()

    # 5. Pairwise decoder
    run_qinco.main(
        [
            "task=train_pairwise_decoder", f"trainset={tmp}/train.npy",
            f"ivf_centroids={tmp}/ivf.npy",
            f"encoded_trainset={tmp}/codes_train.npz",
            f"output={tmp}/pairwise.npz",
            "ds.valset=500", "n_pairwise_codebooks=2", "verbose=false",
        ]
    )
    assert (tmp / "pairwise.npz").exists()

    # 6. IVF search over the operating-point grid
    run_qinco.main(
        [
            "task=search", f"model={tmp}/model.npz",
            f"ivf_centroids={tmp}/ivf.npy",
            f"index={tmp}/index.qivf",
            f"pairwise_decoder={tmp}/pairwise.npz",
            f"queries={tmp}/queries.npy", f"queries_gt={tmp}/gt.npy",
            f"output={tmp}/results.json",
            "search.nprobe=[4,32]", "search.nshort=[10,100]",
            "search.nmid_short=[1,2]", "search.quantizer_efSearch=[]",
            "batch=512", "search.batch_size=512", "verbose=false",
        ]
    )
    results = json.loads((tmp / "results.json").read_text())
    res = results["ivf_real_res"]
    assert len(res) >= 3
    # R@1 on a tiny M=2/K=16 quantizer is tie-limited (many db rows share
    # codes); R@100 measures whether the pipeline retrieves correctly.
    assert max(r["recalls"]["100"] for r in res) > 0.95, [
        r["recalls"] for r in res
    ]
    assert max(r["recalls"]["10"] for r in res) > 0.6
    # full-probe full-shortlist config should beat tiny config
    r_small = [r for r in res if r["parameters"]["nprobe"] == 4]
    r_big = [r for r in res if r["parameters"]["nprobe"] == 32]
    if r_small and r_big:
        assert max(x["recalls"]["100"] for x in r_big) >= max(
            x["recalls"]["100"] for x in r_small
        )

    # 7. resume skips measured points
    rc = run_qinco.main(
        [
            "task=search", f"model={tmp}/model.npz",
            f"ivf_centroids={tmp}/ivf.npy",
            f"index={tmp}/index.qivf",
            f"pairwise_decoder={tmp}/pairwise.npz",
            f"queries={tmp}/queries.npy", f"queries_gt={tmp}/gt.npy",
            f"output={tmp}/results.json", "resume=true",
            "search.nprobe=[4,32]", "search.nshort=[10,100]",
            "search.nmid_short=[1,2]", "search.quantizer_efSearch=[]",
            "batch=512", "search.batch_size=512", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None


def test_flat_search(pipeline):
    tmp = pipeline["tmp"]
    run_qinco.main(
        [
            "task=train", f"trainset={tmp}/train.npy",
            f"output={tmp}/flat_model.npz",
            "M=4", "K=16", "L=1", "de=8", "dh=12", "A=4", "B=2",
            "batch=512", "ds.valset=500", "epochs=2",
            "scheduler.stop_patience=0", "lr=0.004", "verbose=false",
        ]
    )
    task = run_qinco.main  # alias for readability
    rc = task(
        [
            "task=search", f"model={tmp}/flat_model.npz",
            f"db={tmp}/db.npy",
            f"queries={tmp}/queries.npy", f"queries_gt={tmp}/gt.npy",
            "batch=512", "search.batch_size=512", "verbose=false",
        ]
    )
    assert rc == 0 or rc is None


def test_pair_codes_index_and_search(pipeline):
    """K -> K² code-paired index (reference: pair_codes_ivf,
    search_tasks.py:145-164): rebuild the index with pair_codes=true and
    check search recall still holds."""
    tmp = pipeline["tmp"]
    if not (tmp / "codes_db.npz").exists():
        pytest.skip("requires artifacts from test_full_ivf_pipeline")

    run_qinco.main(
        [
            "task=build_index", f"trainset={tmp}/train.npy",
            f"ivf_centroids={tmp}/ivf.npy",
            f"encoded_trainset={tmp}/codes_train.npz",
            f"encoded_db={tmp}/codes_db.npz",
            f"output={tmp}/index_paired.qivf", "ds.valset=500",
            "search.pair_codes=true", "verbose=false",
        ]
    )
    run_qinco.main(
        [
            "task=search", f"model={tmp}/model.npz",
            f"ivf_centroids={tmp}/ivf.npy",
            f"index={tmp}/index_paired.qivf",
            f"queries={tmp}/queries.npy", f"queries_gt={tmp}/gt.npy",
            f"output={tmp}/results_paired.json",
            "search.nprobe=[32]", "search.nshort=[100]",
            "search.nmid_short=[1]", "search.quantizer_efSearch=[]",
            "search.pair_codes=true",
            "batch=512", "search.batch_size=512", "verbose=false",
        ]
    )
    results = json.loads((tmp / "results_paired.json").read_text())
    res = results["ivf_real_res"]
    assert res, "no experiments ran"
    # the paired index stores M/2 codes of K^2 entries; recall must match
    # the unpaired pipeline's quality on this easy synthetic set
    assert max(r["recalls"]["100"] for r in res) > 0.95, [
        r["recalls"] for r in res
    ]
