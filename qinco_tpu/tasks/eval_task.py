"""Database-MSE evaluation (`eval`) and timing harness (`eval_time`).

Reference: QincoEvalTask (qinco/qinco_tasks.py:486-505); the eval_time
protocol reports μs/vector after JIT warm-up with device-completion
fences (qinco_tasks.py:98-145) — here ``jax.block_until_ready`` replaces
the ``.item()`` CUDA syncs.
"""

from __future__ import annotations

from ..data.datasets import load_vec_db
from ..train.loop import compute_mse
from .base import BaseTask


class EvalTask(BaseTask):
    def load_data(self):
        cfg = self.cfg
        self.print(f"Loading database from {cfg.db}")
        self.test_vecs, self.test_loader = load_vec_db(
            cfg, shard=(self.process_index, self.process_count)
        )
        self.print(f"Test set: {self.test_vecs.shape}")
        self.data_dim = self.test_vecs.shape[-1]

    def run(self):
        cfg = self.cfg
        timing = cfg.task == "eval_time"
        profile_dir = cfg.get("profile_dir")

        def _run():
            return compute_mse(
                self.params,
                self.spec,
                self.test_loader,
                mesh=self.mesh,
                mse_scale=cfg.mse_scale,
                timing=timing,
            )

        if timing and profile_dir:
            # jax.profiler trace replaces the reference's wall-clock-only
            # instrumentation (SURVEY.md §5.1)
            import jax

            with jax.profiler.trace(str(profile_dir)):
                mse = _run()
            self.print(f"Wrote profiler trace to {profile_dir}")
        else:
            mse = _run()
        self.print(f"Test metrics: [[MSE={mse:g}]]")
        return mse
