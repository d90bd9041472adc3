"""Convert reference torch checkpoints (.pt) to qinco-tpu .npz.

Plays the role of the reference's `convert` task
(qinco/qinco_tasks.py:508-573): data_mean/data_std come from the
checkpoint itself when it carries them (modern reference checkpoints
do); for QINCo1-era checkpoints that don't, passing `db=<name>` pulls
the per-dataset normalization statistics the reference hard-codes
(qinco_tasks.py:509-538, DB_DIMS/DB_NORMS/DB_STD), stored here as a
binary asset (assets/v1_dataset_norms.npz — measured dataset
statistics, not re-derivable offline).
"""

from __future__ import annotations

import pathlib
import re

import jax
import numpy as np

from ..checkpoint import load_torch_checkpoint, params_from_torch_state
from ..models.params import init_model_state, init_params
from .base import BaseTask

_V1_NORMS_PATH = pathlib.Path(__file__).parent.parent / "assets" / "v1_dataset_norms.npz"


def v1_dataset_norms(db: str):
    """Return (dim, mean[D], std) for a QINCo1-era dataset name, or None.

    `db` may carry a 1B suffix (the reference maps e.g. bigann1B to the
    bigann1M statistics, qinco_tasks.py:540).
    """
    name = db.replace("1B", "1M")
    with np.load(_V1_NORMS_PATH) as z:
        if f"{name}__dim" not in z:
            return None
        return (
            int(z[f"{name}__dim"]),
            np.asarray(z[f"{name}__mean"], np.float32),
            float(z[f"{name}__std"]),
        )

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
        db_name = cfg.get("db_name") or cfg.get("db")
        if db_name and "data_mean" not in model_sd:
            # QINCo1-era checkpoint: normalization lives in the reference's
            # per-dataset tables, not the state dict (qinco_tasks.py:554-560).
            norms = v1_dataset_norms(str(db_name))
            assert norms is not None, (
                f"No v1 normalization stats for db={db_name!r}; known: "
                "bigann1M, deep1M, contriever1M, FB_ssnpp1M (or 1B variants)"
            )
            _, mean, std = norms
            model_sd["data_mean"] = mean
            model_sd["data_std"] = np.float32(std)
        D = meta.get("data_dim")
        if D is None:
            D = model_sd["data_mean"].shape[0]
        # QINCo1-era layouts: in/out projections live inside
        # residual_blocks.{l}, and step 0 may carry an unused substep
        # codebook (reference rename/delete, qinco_tasks.py:549-562).

        model_sd = {
            re.sub(r"residual_blocks\.[0-9]+\.(in_proj|out_proj)", r"\1", k): w
            for k, w in model_sd.items()
        }
        model_sd.pop("steps.0.substep.codebook.weight", None)
        if cfg.ivf_centroids:
            self.ivf_centroids = np.load(cfg.ivf_centroids)
            cfg.ivf_in_use = True
            cfg.ivf_K = self.ivf_centroids.shape[0]
            # Side-file centroids are already in normalized space
            # (reference, qinco_tasks.py:564-568).
            model_sd.setdefault(
                "steps.0.ivf_centroids.weight",
                np.asarray(self.ivf_centroids, np.float32),
            )
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
