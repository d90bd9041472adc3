"""Task lifecycle: setup -> load_data -> load_model -> run.

Mirrors the reference's task registry and BaseTask flow
(reference: run.py:20-31, qinco/qinco_tasks.py:320-398) without the
mutable SharedCfgState: each task owns explicit attributes.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np

from ..config import Config, apply_dataset_preset
from ..checkpoint import (
    SAVED_PARAMETERS,
    load_checkpoint,
    load_checkpoint_meta,
    save_checkpoint,
)
from ..models.params import init_model_state, init_params, set_codebooks_from_rq
from ..models.spec import spec_from_cfg
from ..parallel.mesh import make_mesh


class BaseTask:
    USE_MODEL = True
    NEEDS_TRAIN_DATA = False

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.setup()
        self.load_data()
        if self.USE_MODEL:
            self.load_model()

    # -- lifecycle ----------------------------------------------------------
    def setup(self) -> None:
        cfg = self.cfg
        if cfg.cpu:
            os.environ.setdefault("JAX_PLATFORMS", "cpu")
        np.random.seed(cfg.seed)

        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_main = self.process_index == 0

        apply_dataset_preset(cfg)

        # Checkpoint metadata re-hydrates hyperparameters
        # (reference: qinco/utils.py:140-179).
        self.ckpt_meta = None
        # Training resume re-points the model at the output checkpoint
        # (reference: qinco_tasks.py:443-449); search resume instead replays
        # its JSON results file (handled in search/search.py).
        if (
            cfg.resume
            and cfg.task == "train"
            and cfg.output
            and Path(cfg.output).exists()
        ):
            cfg.model = cfg.output
            self.print(f"Resuming from {cfg.output}")
        if (
            cfg.model
            and Path(cfg.model).exists()
            and str(cfg.model).endswith(".npz")
            and not str(cfg.model).endswith(".pqnpz")
        ):
            meta = load_checkpoint_meta(cfg.model)
            self.ckpt_meta = meta
            for arg, val in meta.get("parameters", {}).items():
                if cfg.get(arg) is None:
                    cfg[arg] = val
                elif arg == "A" and cfg[arg] and not val:
                    raise ValueError(
                        "Can't evaluate a model trained with A=0 using a "
                        "non-zero A value."
                    )
                elif arg in ("K", "M", "L", "de", "dh", "ivf_K") and cfg[arg] != val:
                    raise ValueError(
                        f"Config {arg}={cfg[arg]} conflicts with checkpoint "
                        f"{arg}={val}; structural hyperparameters cannot be "
                        "overridden at load time."
                    )
                elif arg == "A" and not cfg[arg] and val:
                    raise ValueError(
                        "Can't evaluate with A=0 a model trained with "
                        f"A={val} (substep codebooks present)."
                    )
            self.data_dim = meta.get("data_dim")

        # IVF centroids imply an IVF model (reference: qinco_tasks.py:357-358).
        self.ivf_centroids = None
        if cfg.ivf_centroids:
            self.ivf_centroids = np.load(cfg.ivf_centroids)
            cfg.ivf_in_use = True
            cfg.ivf_K, d = self.ivf_centroids.shape
            self.data_dim = d

        self.mesh = make_mesh(data=cfg.mesh.data, model=cfg.mesh.model)
        self.print(
            f"Devices: {len(jax.devices())} "
            f"({self.process_count} process(es)); mesh {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}"
        )
        self.log_device_memory()

    def log_device_memory(self) -> None:
        """Per-device HBM report (reference: log_mem_info,
        qinco/utils.py:266-291)."""
        if not self.is_main:
            return
        from ..utils import format_memory

        for dev in jax.local_devices():
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            in_use = stats.get("bytes_in_use")
            limit = stats.get("bytes_limit")
            if limit:
                self.print(
                    f"Device {dev}: {format_memory(in_use or 0)} / "
                    f"{format_memory(limit)} HBM in use"
                )

    def print(self, *args) -> None:
        if getattr(self, "is_main", True):
            print(*args, flush=True)

    def load_data(self) -> None:
        pass

    def load_model(self) -> None:
        """Build spec/params; initialize codebooks (RQ) or load checkpoint
        (reference: initialize_model, qinco_tasks.py:270-312)."""
        cfg = self.cfg
        D = getattr(self, "data_dim", None)
        assert D is not None, "data dimension unknown; load data or checkpoint first"
        self.spec = spec_from_cfg(cfg, D)
        spec = self.spec

        key = jax.random.PRNGKey(cfg.seed)
        data_mean, data_std = self.compute_data_stats()
        self.params = init_params(
            key,
            spec,
            data_mean=data_mean,
            data_std=data_std,
            ivf_centroids=None,  # raw centroids normalized below
        )
        self.mstate = init_model_state(spec)

        fresh_training = cfg.task == "train" and not cfg.model
        if fresh_training:
            rq_centroids = self.train_rq_init()
            if rq_centroids is not None:
                key, k_rq = jax.random.split(key)
                self.params = set_codebooks_from_rq(
                    k_rq,
                    self.params,
                    spec,
                    rq_centroids,
                    noise_init=cfg.codebook_noise_init,
                )

        if self.ivf_centroids is not None and cfg.task != "convert":
            # IVF centroids live in normalized space inside the model
            # (reference: qinco_tasks.py:294-300).
            import jax.numpy as jnp

            norm = (
                jnp.asarray(self.ivf_centroids, jnp.float32)
                - self.params.data_mean
            ) / self.params.data_std
            self.params = self.params._replace(codebook0=norm)

        if cfg.model and Path(cfg.model).exists():
            self.restore_checkpoint(cfg.model)

    def compute_data_stats(self):
        return None, None

    def train_rq_init(self):
        return None

    # -- checkpointing ------------------------------------------------------
    def hyperparams_dict(self) -> dict:
        cfg = self.cfg
        return {p: cfg.get(p) for p in SAVED_PARAMETERS if cfg.get(p) is not None}

    def save(self, *, epoch=None, opt_state=None, scheduler_state=None,
             logger_state=None) -> None:
        if not self.is_main:
            return
        save_checkpoint(
            self.cfg.output,
            params=self.params,
            model_state=self.mstate,
            opt_state=opt_state,
            epoch=epoch,
            scheduler_state=scheduler_state,
            logger_state=logger_state,
            hyperparams=self.hyperparams_dict(),
            data_dim=self.spec.D,
        )

    def restore_checkpoint(self, path, opt_template=None) -> dict:
        restored = load_checkpoint(
            path,
            params_template=self.params,
            mstate_template=self.mstate,
            opt_template=opt_template,
        )
        self.params = restored["params"]
        if restored["mstate"] is not None:
            self.mstate = restored["mstate"]
        self.print(f"Loaded model checkpoint from {path}")
        return restored

    def run(self):
        raise NotImplementedError


def get_task(name: str):
    from . import (
        codec_task,
        convert_task,
        eval_task,
        pq_task,
        search_tasks,
        train_task,
    )

    registry = {
        "train": train_task.TrainTask,
        "eval_valset": train_task.TrainTask,  # eval path of the train task
        "eval": eval_task.EvalTask,
        "eval_time": eval_task.EvalTask,
        "convert": convert_task.ConvertTask,
        "ivf_centroids": search_tasks.IVFTrainTask,
        "encode": search_tasks.EncodeDBTask,
        "build_index": search_tasks.BuildIndexTask,
        "train_pairwise_decoder": search_tasks.TrainPairwiseDecoderTask,
        "search": search_tasks.SearchTask,
        "train_pq": pq_task.PQTrainTask,
        "eval_pq": pq_task.PQEvalTask,
        "encode_codec": codec_task.EncodeCodecTask,
        "decode_codec": codec_task.DecodeCodecTask,
        "search_2stage": codec_task.TwoStageSearchTask,
    }
    if name not in registry:
        raise ValueError(f"Unknown task {name!r}; available: {sorted(registry)}")
    return registry[name]


EXPERIMENTS = get_task
