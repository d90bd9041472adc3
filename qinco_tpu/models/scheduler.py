"""Learning-rate schedules.

Functional re-implementation of the reference's two schedules
(reference: qinco/model/scheduler.py:12-39, qinco_tasks.py:57-79):

- ramp-cosine: linear ramp over ``ramp_epochs`` then cosine decay, stepped
  *fractionally* every batch (``epoch + (i_batch+1)/n_batches``,
  qinco_tasks.py:156-168);
- reduce-on-plateau (QINCo1 mode): ×``reduce_fact`` when val MSE stalls.

Both produce a plain float learning rate that the train step takes as an
argument, so no re-jitting per LR change.

Note: the reference constructs RampCosineLRSchedule with
``min_val = lr * lr_min_fact`` where min_val is used as a *factor*
(scheduler.py's LambdaLR multiplies it by the base LR).  We preserve that
exact behavior for parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class RampCosineSchedule:
    base_lr: float
    ramp_epochs: float
    max_epochs: float
    min_factor: float  # reference passes lr * lr_min_fact here

    def factor(self, epoch: float) -> float:
        if epoch < self.ramp_epochs:
            return max(min(epoch / self.ramp_epochs, 1.0), self.min_factor)
        p = (epoch - self.ramp_epochs) / self.max_epochs
        angle = min(p, 1.0) * math.pi / 2
        return max(math.cos(angle), self.min_factor)

    def lr(self, epoch: float) -> float:
        return self.base_lr * self.factor(epoch)

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


@dataclass
class ReduceLROnPlateau:
    base_lr: float
    reduce_fact: float = 0.1
    patience: int = 10
    min_lr: float = 0.0
    threshold: float = 1e-10  # relative improvement threshold

    cur_lr: float = field(init=False)
    best: float = field(default=math.inf, init=False)
    num_bad: int = field(default=0, init=False)

    def __post_init__(self):
        self.cur_lr = self.base_lr

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.cur_lr = max(self.cur_lr * self.reduce_fact, self.min_lr)
                self.num_bad = 0
        return self.cur_lr

    def lr(self, epoch: float = 0.0) -> float:
        return self.cur_lr

    def state_dict(self) -> dict:
        return {"cur_lr": self.cur_lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, state: dict) -> None:
        self.cur_lr = state["cur_lr"]
        self.best = state["best"]
        self.num_bad = state["num_bad"]


def build_schedule(cfg):
    """Select the schedule from config (reference: qinco_tasks.py:57-79)."""
    s_cfg = cfg.scheduler
    if s_cfg.name == "cosine":
        return RampCosineSchedule(
            base_lr=cfg.lr,
            ramp_epochs=s_cfg.ramp_epochs,
            max_epochs=cfg.epochs,
            min_factor=cfg.lr * s_cfg.lr_min_fact,
        )
    if s_cfg.name == "reduce_lr_plateau":
        return ReduceLROnPlateau(
            base_lr=cfg.lr,
            reduce_fact=s_cfg.reduce_fact,
            patience=s_cfg.patience,
            min_lr=cfg.lr * s_cfg.lr_min_fact,
            threshold=s_cfg.threshold_frac,
        )
    raise ValueError(f"Unknown scheduler {s_cfg.name!r}")
