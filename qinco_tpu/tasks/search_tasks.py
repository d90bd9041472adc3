"""Search-pipeline tasks: IVF centroid training, parallel DB encoding,
index build, pairwise-decoder training, large-scale search.

Reference: qinco/search/search_tasks.py.
"""

from __future__ import annotations


import numpy as np

from ..data.datasets import load_queries_data, load_vec_db, load_vec_trainset
from ..models.qinco import encode_chunked
from ..ops.kmeans import kmeans
from ..utils import TimersManager
from .base import BaseTask


class BaseSearchTask(BaseTask):
    pass


class IVFTrainTask(BaseSearchTask):
    """Train the 2^20-way IVF coarse codebook with TPU k-means
    (reference: search_tasks.py:67-77, 644-670 — faiss.Kmeans niter=100)."""

    USE_MODEL = False

    def setup(self):
        super().setup()
        cfg = self.cfg
        assert cfg.output and str(cfg.output).endswith(".npy"), (
            "Specify a .npy output for the IVF centroids"
        )
        assert cfg.ivf_K, "Specify ivf_K (e.g. 1048576)"

    def load_data(self):
        cfg = self.cfg
        self.print(f"Loading training data from {cfg.trainset}")
        (self.train_vecs, _), _ = load_vec_trainset(cfg)
        self.print(f"Training set: {self.train_vecs.shape}")

    def run(self):
        cfg = self.cfg
        x = np.asarray(self.train_vecs, np.float32)
        # Data-parallel over the mesh on single-process runs; multi-process
        # hosts would need per-host data slices (kmeans docstring).
        mesh = self.mesh if self.process_count == 1 else None
        centroids = kmeans(
            x, int(cfg.ivf_K),
            iters=int(cfg.get("kmeans_iters", 100) or 100),
            seed=cfg.seed, verbose=cfg.verbose,
            mesh=mesh,
        )
        self.print(f"Storing IVF centroids to {cfg.output}")
        np.save(cfg.output, centroids)
        return centroids


class EncodeDBTask(BaseSearchTask):
    """Data-parallel database encoding with per-process part files
    (reference: encode_database, search_tasks.py:85-137).

    Keeps the reference's npz contract: a header npz with
    {n_parts, K, M, D} plus ``<base>.part_{i}.npz`` files with a
    ``codes (n, M_ivf)`` array, so encoded DBs interoperate.
    """

    def setup(self):
        super().setup()
        assert self.cfg.output and str(self.cfg.output).endswith(".npz"), (
            "Specify a .npz output path"
        )

    def load_data(self):
        cfg = self.cfg
        if cfg.encode_trainset:
            (train_vecs, val_vecs), _ = load_vec_trainset(cfg)
            self.db_vecs = np.concatenate(
                [np.asarray(train_vecs), np.asarray(val_vecs)], axis=0
            )
            self.print(f"Training + validation sets: {self.db_vecs.shape}")
        else:
            self.print(f"Loading database from {cfg.db}")
            self.db_vecs, _ = load_vec_db(cfg)
            self.print(f"Database: {self.db_vecs.shape}")
        self.data_dim = self.db_vecs.shape[-1]

    def run(self):
        cfg = self.cfg
        output_base = str(cfg.output)[:-4]
        nproc, rank = self.process_count, self.process_index
        db_size = len(self.db_vecs)
        timers = TimersManager("encode", "saving")

        start = (db_size // nproc) * rank
        end = (db_size // nproc) * (rank + 1) if rank < nproc - 1 else db_size
        self.print(f"Encoding {db_size} vectors using {nproc} process(es)")

        params = self.params
        encode_kw = {}
        if cfg.mesh.model > 1 and self.spec.ivf_in_use:
            # Billion-scale configuration: shard the coarse book over the
            # model mesh axis (parallel/sharded_ops.py).  The mesh is
            # *local* to this process: DB encoding is embarrassingly
            # parallel across ranks (each encodes its own slice), so the
            # book-shard collectives must stay within the host.
            from ..parallel.mesh import local_mesh
            from ..parallel.sharded_ops import shard_codebook

            mesh = local_mesh(model=cfg.mesh.model)
            self.print(
                f"Sharding the IVF codebook over {cfg.mesh.model} chips"
            )
            params = params._replace(
                codebook0=shard_codebook(mesh, self.params.codebook0)
            )
            encode_kw["mesh"] = mesh

        with timers.encode:
            codes = encode_chunked(
                params,
                self.spec,
                self.db_vecs[start:end],
                batch=cfg.batch,
                enc_max_bs=cfg.enc_max_bs,
                **encode_kw,
            ).T  # (n, M_ivf) — reference stores codes transposed (:115)
        self.print(f"Encoding done in {timers.encode}")

        with timers.saving:
            if self.is_main:
                np.savez_compressed(
                    cfg.output, n_parts=nproc, K=cfg.K, M=cfg.M, D=self.spec.D
                )
            np.savez_compressed(f"{output_base}.part_{rank}.npz", codes=codes)
        self.print(
            f"Stored codes into {cfg.output} and {nproc} part file(s) "
            f"[done in {timers.saving}]"
        )
        return codes


class EncodedDBIterator:
    """Streams per-rank encoded part files
    (reference: search_utils.py:33-78)."""

    def __init__(self, cfg, base_path: str):
        assert str(base_path).endswith(".npz")
        self.part_base_path = str(base_path)[:-4]
        info = np.load(base_path)
        self.n_parts = int(info["n_parts"])
        for name in ("K", "M"):
            val = int(info[name])
            if cfg.get(name) is None:
                cfg[name] = val
            else:
                assert cfg[name] == val, f"{name} mismatch: cfg {cfg[name]} vs db {val}"
        self.D = int(info["D"])
        self.batch_start_id = 0

    def iter(self, batch_size: int | None = None):
        self.batch_start_id = 0
        for i_part in range(self.n_parts):
            codes = np.load(f"{self.part_base_path}.part_{i_part}.npz")["codes"]
            bs = batch_size or len(codes)
            for ib in range(0, len(codes), bs):
                batch = codes[ib : ib + bs]
                self.batch_end_id = self.batch_start_id + len(batch)
                yield batch
                self.batch_start_id += len(batch)

    def load_all(self) -> np.ndarray:
        return np.concatenate(list(self.iter()), axis=0)


class BuildIndexTask(BaseSearchTask):
    USE_MODEL = False

    def run(self):
        from ..search.index_build import run_build_index

        return run_build_index(self)


class TrainPairwiseDecoderTask(BaseSearchTask):
    USE_MODEL = False

    def load_data(self):
        cfg = self.cfg
        (self.train_vecs, self.val_vecs), _ = load_vec_trainset(cfg)
        self.data_dim = self.train_vecs.shape[-1]

    def run(self):
        from ..search.pairwise_decoder import run_train_pairwise_decoder

        return run_train_pairwise_decoder(self)


class SearchTask(BaseSearchTask):
    def load_data(self):
        cfg = self.cfg
        self.xq, self.xq_gt = load_queries_data(cfg)
        if cfg.index:
            self.print(f"Reading index from {cfg.index}")
        else:
            self.print(f"Reading database from {cfg.db}")
            self.db, _ = load_vec_db(cfg)
        self.data_dim = self.xq.shape[-1]

    def run(self):
        from ..search.search import run_search_flat, run_search_ivf

        if self.cfg.index:
            return run_search_ivf(self)
        return run_search_flat(self)
