"""Training task (and eval_valset variant).

Reference flow: QincoTrainTask + train_qinco
(qinco/qinco_tasks.py:216-249, 401-484).
"""

from __future__ import annotations

import jax
import numpy as np

from ..data.datasets import load_vec_trainset
from ..logsys import MetricLogger
from ..models.scheduler import ReduceLROnPlateau, build_schedule
from ..ops.rq import train_rq
from ..parallel.mesh import replicate, shard_batch, shard_stacked_batch
from ..train.loop import compute_mse
from ..train.train_step import (
    build_optimizer,
    make_train_step,
    reset_unused_codebooks,
    reset_usage,
    set_learning_rate,
)
from ..metrics import corrected_mse
from .base import BaseTask


class _GroupValid:
    """Batch-group view: concatenated rows + total valid count."""

    def __init__(self, x, n_valid):
        self.x = x
        self.n_valid = n_valid


def _grouped_batches(it, accum: int):
    """Group loader micro-batches ``accum`` at a time, padding the final
    group with zero-valid batches so the jitted step keeps one shape."""
    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == accum:
            yield buf
            buf = []
    if buf:
        zero = np.zeros_like(buf[0].x)
        while len(buf) < accum:
            buf.append(_GroupValid(zero, 0))
        yield buf


class TrainTask(BaseTask):
    def setup(self):
        super().setup()
        cfg = self.cfg
        if cfg.task == "train":
            assert cfg.output, "Specify 'output' (.npz) to store model weights"
            assert str(cfg.output).endswith(".npz"), (
                "Specify a .npz file for 'output'"
            )
            if cfg.model is None:
                for arg in ["L", "dh", "M", "K", "A", "B"]:
                    assert cfg.get(arg) is not None, (
                        f"Specify '{arg}' or use a model_args preset"
                    )

    def load_data(self):
        cfg = self.cfg
        self.print(f"Loading training data from {cfg.trainset}")
        (self.train_vecs, self.val_vecs), (self.train_loader, self.val_loader) = (
            load_vec_trainset(cfg, shard=(self.process_index, self.process_count))
        )
        self.print(f"Training set: {self.train_vecs.shape}")
        self.print(f"Validation set: {self.val_vecs.shape}")
        self.data_dim = self.train_vecs.shape[-1]

    def compute_data_stats(self):
        """Data normalization statistics (reference: qinco_tasks.py:417-434)."""
        cfg = self.cfg
        if cfg.task != "train":
            return None, None
        if cfg.qinco1_mode:
            # Full-trainset extremes (reference: qinco_tasks.py:418-420 uses
            # the whole trainset, not a 100k sample); streamed off the memmap.
            d_min, d_max = np.inf, -np.inf
            for i in range(0, len(self.train_vecs), 1_000_000):
                blk = np.asarray(self.train_vecs[i : i + 1_000_000])
                d_min = min(d_min, float(blk.min()))
                d_max = max(d_max, float(blk.max()))
            mean = np.ones((self.data_dim,), np.float32) * d_min + 1
            std = (d_max - d_min) / 2
            self.print(f"QINCo1 mode: rescale interval [{d_min:g};{d_max:g}] to [-1;1]")
            return mean, std
        stats = np.asarray(self.train_vecs[:100_000], np.float32)
        mean = stats.mean(0)
        std = float(stats.std())
        self.print(f"Data mean {mean.mean():.3g}, std {std:.3g}")
        return mean, std

    def train_rq_init(self):
        """RQ bootstrap of the codebooks (reference: vrq.py:265-313).

        Single-program: with jit over the mesh every process computes the
        same centroids, so no explicit rank-0 broadcast is needed.
        """
        cfg = self.cfg
        self.print("====================== residual quantizer training")
        x = np.asarray(self.train_vecs[:1_000_000], np.float32)
        ivf_raw = self.ivf_centroids if self.spec.ivf_in_use else None
        centroids, xq = train_rq(
            x,
            self.spec.M_ivf,
            self.spec.K,
            iters=10,
            seed=cfg.seed,
            ivf_centroids=ivf_raw,
        )
        rq_mse = corrected_mse(xq, x, cfg.mse_scale)
        self.print(f"RQ init train MSE={rq_mse:g}")
        self.rq_mse = rq_mse
        return centroids

    def run(self):
        cfg = self.cfg
        spec = self.spec
        eval_only = cfg.task != "train"

        schedule = build_schedule(cfg)
        tx = build_optimizer(cfg, self.params, spec)
        opt_state = tx.init(self.params)
        accum = max(1, int(cfg.get("grad_accumulate", 1) or 1))
        train_step = make_train_step(spec, tx, cfg.grad_clip, accum=accum)

        start_epoch = 0
        melog = MetricLogger(cfg, is_main=self.is_main, save_fn=None)

        # Resume full training state (reference: utils.py:182-200).
        if cfg.model and self.ckpt_meta is not None and not eval_only:
            restored = self.restore_checkpoint(cfg.model, opt_template=opt_state)
            meta = restored["meta"]
            if restored["opt_state"] is not None:
                opt_state = restored["opt_state"]
            if meta.get("epoch") is not None:
                start_epoch = int(meta["epoch"])
            if meta.get("scheduler"):
                schedule.load_state_dict(meta["scheduler"])
            if meta.get("logger"):
                melog.load_state_dict(meta["logger"])

        params, mstate = replicate(self.mesh, self.params), replicate(
            self.mesh, self.mstate
        )
        opt_state = replicate(self.mesh, opt_state)

        epoch = start_epoch
        melog.cur_epoch = epoch - 1

        def save_best(reason):
            self.params, self.mstate = params, mstate
            self.save(
                epoch=epoch + 1,
                opt_state=jax.device_get(opt_state),
                scheduler_state=schedule.state_dict(),
                logger_state=melog.state_dict(),
            )

        melog.save_fn = save_best

        # Initial validation MSE (reference: qinco_tasks.py:234).
        mse_val = compute_mse(
            params, spec, self.val_loader, melog,
            mesh=self.mesh, mse_scale=cfg.mse_scale,
        )
        self.print(f"Validation metrics: [[MSE={mse_val:g}]]")
        if eval_only:
            melog.close()
            return mse_val

        key = jax.random.PRNGKey(cfg.seed + 1234)
        while not melog.should_stop():
            melog.cur_epoch = epoch
            if isinstance(schedule, ReduceLROnPlateau):
                schedule.step(mse_val)
            # One logical "batch" = one optimizer step = `accum` loader
            # micro-batches (effective batch accum × batch × hosts,
            # reference: qinco/log.py:160).
            n_batches = max(1, -(-len(self.train_loader) // accum))
            lr = schedule.lr(epoch)
            melog.start_epoch(epoch, n_batches, lr)
            mstate = reset_usage(mstate)

            # Losses accumulate on-device; the host syncs for display only
            # every `log_every` batches (each sync costs a transport
            # round-trip that would otherwise halve throughput).
            log_every = max(1, int(cfg.get("log_every", 10) or 1))
            sum_total = None
            sum_each: dict = {}
            n_seen = 0
            for i_batch, group in enumerate(
                _grouped_batches(self.train_loader.epoch(epoch), accum)
            ):
                # Fractional cosine step per batch (reference:
                # qinco_tasks.py:156-168).
                lr = schedule.lr(epoch + (i_batch + 1) / n_batches)
                opt_state = set_learning_rate(opt_state, lr)
                if accum == 1:
                    x_np = group[0].x
                    w = np.zeros((len(x_np),), np.float32)
                    w[: group[0].n_valid] = 1.0
                    xb = shard_batch(self.mesh, x_np)
                    wb = shard_batch(self.mesh, w)
                else:
                    # Stacked micro-batches: (accum, N, D) sharded on
                    # axis 1 (see make_train_step / shard_stacked_batch).
                    x_np = np.stack([g.x for g in group])
                    w = np.zeros(x_np.shape[:2], np.float32)
                    for j, g in enumerate(group):
                        w[j, : g.n_valid] = 1.0
                    xb = shard_stacked_batch(self.mesh, x_np)
                    wb = shard_stacked_batch(self.mesh, w)
                b = _GroupValid(x=x_np, n_valid=int(w.sum()))
                params, opt_state, mstate, out = train_step(
                    params, opt_state, mstate, xb, wb
                )
                # Global valid count: hosts feed identical-shape shards
                # (effective batch = batch × accum × hosts, log.py:160).
                nv = b.n_valid * self.process_count
                n_seen += nv
                sum_total = (
                    out.total_loss * nv
                    if sum_total is None
                    else sum_total + out.total_loss * nv
                )
                for k, v in out.losses.items():
                    sum_each[k] = (
                        v * nv if k not in sum_each else sum_each[k] + v * nv
                    )
                if i_batch % log_every == 0 or i_batch == n_batches - 1:
                    melog.step_batch(
                        i_batch, nv, out.total_loss, out.losses, lr
                    )
                else:
                    melog.cur_step += 1
            melog.end_train_phase()

            mse_val = compute_mse(
                params, spec, self.val_loader, melog,
                mesh=self.mesh, mse_scale=cfg.mse_scale,
            )

            usage_rows = [np.asarray(mstate.usage0)] + [
                np.asarray(u) for u in mstate.usage
            ]
            melog.end_epoch(
                mse_val,
                usage_rows=usage_rows,
                mean_loss=float(sum_total) / max(n_seen, 1),
                mean_all={
                    k: float(v) / max(n_seen, 1) for k, v in sum_each.items()
                },
            )

            # Dead-codeword reset — runs in qinco1 mode too, with noise
            # scale 1 (reference: qinco_base.py:402-409, 505-522).
            key, k_reset = jax.random.split(key)
            params, n_reset = reset_unused_codebooks(
                k_reset, params, mstate, spec,
                noise_init=cfg.codebook_noise_init,
            )
            n_reset = np.asarray(n_reset)
            if n_reset.sum():
                self.print(
                    f"Reset {int(n_reset.sum())} codewords at end of epoch "
                    f"{epoch} (per step: {n_reset.tolist()})"
                )

            epoch += 1

        self.print(
            f"[T_total={melog.timers.total} | T_train={melog.timers.train}] "
            "Training done"
        )
        self.params, self.mstate = jax.device_get(params), jax.device_get(mstate)
        melog.close()
        return melog.best_mse
