"""Convert reference torch checkpoints (.pt) to qinco-tpu .npz.

Plays the role of the reference's `convert` task
(qinco/qinco_tasks.py:508-573), generalized: instead of hard-coded
per-dataset normalization tables, the converter reads data_mean/data_std
from the checkpoint itself (modern reference checkpoints carry them) or
from the dataset when provided.
"""

from __future__ import annotations

import numpy as np

from ..checkpoint import load_torch_checkpoint, params_from_torch_state
from ..models.params import init_model_state, init_params
from .base import BaseTask

import jax


class ConvertTask(BaseTask):
    USE_MODEL = False

    def load_data(self):
        pass

    def run(self):
        cfg = self.cfg
        assert cfg.model, "Specify the .pt checkpoint via 'model'"
        assert cfg.output and str(cfg.output).endswith(".npz"), (
            "Specify a .npz output path"
        )

        model_sd, meta = load_torch_checkpoint(cfg.model)
        hp = meta["parameters"]
        for arg, val in hp.items():
            if cfg.get(arg) is None:
                cfg[arg] = val
        D = meta.get("data_dim")
        if D is None:
            D = model_sd["data_mean"].shape[0]
        if cfg.ivf_centroids:
            self.ivf_centroids = np.load(cfg.ivf_centroids)
            cfg.ivf_in_use = True
            cfg.ivf_K = self.ivf_centroids.shape[0]
        if not cfg.get("ivf_in_use") and any(
            "ivf_centroids" in k for k in model_sd
        ):
            cfg.ivf_in_use = True

        from ..models.spec import spec_from_cfg

        self.spec = spec_from_cfg(cfg, int(D))
        template = init_params(jax.random.PRNGKey(0), self.spec)
        mstate = init_model_state(self.spec)
        self.params, self.mstate = params_from_torch_state(
            model_sd, self.spec, template, mstate
        )
        self.save(epoch=meta.get("epoch"))
        self.print(f"Converted {cfg.model} -> {cfg.output}")
