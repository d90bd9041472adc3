"""PQ-QINCo tasks: product-split training + evaluation/search.

Reference: qinco_v1/pq_qinco.py (prepare -> per-part train_qinco ->
recombine, with optional OPQ rotation).  Here the parts train
sequentially in-process and combine into one ``.pqnpz`` checkpoint; the
vmapped PQ model (models/pq_qinco.py) then encodes all parts in one
compiled program.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from ..config import load_config
from ..data.datasets import load_vec_trainset, load_queries_data, load_vec_db
from ..metrics import compute_recalls, corrected_mse
from ..models.pq_qinco import PQQincoParams, pq_encode, stack_part_params
from ..models.spec import QincoSpec
from ..ops.opq import train_opq
from .base import BaseTask


def save_pq_checkpoint(path, params: PQQincoParams, sub_spec: QincoSpec,
                       n_parts: int) -> None:
    import jax.numpy as jnp

    arrays = {}
    leaves = jax.tree_util.tree_leaves(params.parts)
    for i, leaf in enumerate(leaves):
        arrays[f"part_{i:04d}"] = np.asarray(leaf)
    if params.opq is not None:
        arrays["opq"] = np.asarray(params.opq)
    arrays["part_scales"] = np.asarray(params.part_scales)
    arrays["meta"] = np.frombuffer(
        json.dumps(
            {
                "n_parts": n_parts,
                "n_leaves": len(leaves),
                "spec": {
                    k: getattr(sub_spec, k)
                    for k in (
                        "D", "K", "M", "L", "de", "dh", "A", "B",
                        "qinco1_mode",
                    )
                },
            }
        ).encode(),
        dtype=np.uint8,
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_pq_checkpoint(path):
    import jax.numpy as jnp
    from ..models.params import init_params

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        sub_spec = QincoSpec(**meta["spec"])
        n_parts = meta["n_parts"]
        template = init_params(jax.random.PRNGKey(0), sub_spec)
        template_stacked = jax.tree.map(
            lambda a: jnp.stack([a] * n_parts), template
        )
        t_leaves, treedef = jax.tree_util.tree_flatten(template_stacked)
        leaves = [
            jnp.asarray(z[f"part_{i:04d}"]) for i in range(meta["n_leaves"])
        ]
        parts = jax.tree_util.tree_unflatten(treedef, leaves)
        opq = jnp.asarray(z["opq"]) if "opq" in z else None
        params = PQQincoParams(
            parts=parts, opq=opq, part_scales=jnp.asarray(z["part_scales"])
        )
    return params, sub_spec, n_parts


class PQTrainTask(BaseTask):
    """task=train_pq: trains n_parts independent QINCo models on the
    (optionally OPQ-rotated) dimension splits, then combines them."""

    USE_MODEL = False

    def setup(self):
        super().setup()
        cfg = self.cfg
        assert cfg.output and str(cfg.output).endswith(".pqnpz"), (
            "Specify a .pqnpz output for the PQ-QINCo model"
        )
        self.n_parts = int(cfg.get("pq_parts", 2) or 2)
        self.use_opq = bool(cfg.get("opq", False))

    def load_data(self):
        cfg = self.cfg
        (self.train_vecs, self.val_vecs), _ = load_vec_trainset(cfg)
        self.data_dim = self.train_vecs.shape[-1]
        assert self.data_dim % self.n_parts == 0, (
            f"D={self.data_dim} not divisible by pq_parts={self.n_parts}"
        )

    def run(self):
        cfg = self.cfg
        from .train_task import TrainTask

        D, P = self.data_dim, self.n_parts
        d_sub = D // P
        x = np.asarray(self.train_vecs, np.float32)

        opq = None
        if self.use_opq:
            self.print("Training OPQ rotation")
            opq = train_opq(
                x[:100_000], P, min(cfg.K or 256, 256), seed=cfg.seed,
                verbose=cfg.verbose,
            )
            x = x @ opq.T
        xval = np.asarray(self.val_vecs, np.float32)
        if opq is not None:
            xval = xval @ opq.T

        out_dir = Path(cfg.output).parent
        out_dir.mkdir(parents=True, exist_ok=True)
        part_params = []
        for p_i in range(P):
            self.print(f"===== training PQ part {p_i + 1}/{P} (dims {d_sub})")
            sl = slice(p_i * d_sub, (p_i + 1) * d_sub)
            part_path = out_dir / f"_pq_part{p_i}.npy"
            np.save(part_path, np.concatenate([x[:, sl], xval[:, sl]]))
            sub_cfg = load_config(
                {
                    **{
                        k: cfg.get(k)
                        for k in (
                            "M", "K", "L", "de", "dh", "A", "B", "lr", "wd",
                            "grad_clip", "batch", "epochs", "optimizer",
                            "seed", "qinco1_mode", "verbose",
                        )
                    },
                    "task": "train",
                    "trainset": str(part_path),
                    "output": str(out_dir / f"_pq_part{p_i}.npz"),
                    "ds.valset": cfg.ds.valset,
                    "ds.loop": cfg.ds.loop,
                    "scheduler.stop_patience": cfg.scheduler.stop_patience,
                }
            )
            task = TrainTask(sub_cfg)
            task.run()
            part_params.append(jax.device_get(task.params))
            self.sub_spec = task.spec
            part_path.unlink()

        params = stack_part_params(part_params, opq=opq)
        save_pq_checkpoint(cfg.output, params, self.sub_spec, P)
        self.print(f"Saved PQ-QINCo model to {cfg.output}")

        # quick MSE report (reference prints final MSE, PQ_QINCo.md:62)
        x_orig = np.asarray(self.val_vecs[:10_000], np.float32)
        import jax.numpy as jnp

        codes, xhat = pq_encode(params, self.sub_spec, P, jnp.asarray(x_orig))
        mse = corrected_mse(np.asarray(xhat), x_orig, cfg.mse_scale)
        self.print(f"PQ-QINCo validation MSE: {mse:g}")
        return params


class PQEvalTask(BaseTask):
    """task=eval_pq: MSE + flat-search recall for a PQ-QINCo model."""

    USE_MODEL = False

    def load_data(self):
        cfg = self.cfg
        self.db, _ = load_vec_db(cfg)
        self.data_dim = self.db.shape[-1]
        self.xq = self.xq_gt = None
        if cfg.queries:
            self.xq, self.xq_gt = load_queries_data(cfg)

    def run(self):
        import jax.numpy as jnp

        cfg = self.cfg
        assert cfg.model, "Specify the .pqnpz model via 'model'"
        params, sub_spec, n_parts = load_pq_checkpoint(cfg.model)

        db = np.asarray(self.db, np.float32)
        bs = cfg.batch
        codes_all, xhat_all = [], []
        for i in range(0, len(db), bs):
            chunk = db[i : i + bs]
            n_valid = len(chunk)
            if n_valid < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - n_valid, chunk.shape[1]), np.float32)]
                )
            codes, xhat = pq_encode(params, sub_spec, n_parts, jnp.asarray(chunk))
            codes_all.append(np.asarray(codes)[:, :, :n_valid])
            xhat_all.append(np.asarray(xhat)[:n_valid])
        xhat = np.concatenate(xhat_all)
        mse = corrected_mse(xhat, db, cfg.mse_scale)
        self.print(f"PQ-QINCo DB MSE: {mse:g}")

        recalls = None
        if self.xq is not None:
            xq = np.asarray(self.xq, np.float32)
            d = ((xq[:, None, :] - xhat[None]) ** 2).sum(-1)
            I = np.argsort(d, axis=1)[:, :100]
            recalls = compute_recalls(I, np.asarray(self.xq_gt))
            self.print(
                f"R@1={recalls[1] * 100:.2f} R@10={recalls[10] * 100:.2f} "
                f"R@100={recalls[100] * 100:.2f}"
            )
        return mse, recalls
