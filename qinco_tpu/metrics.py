"""Metrics: distributed-correct MSE, codebook entropy.

Re-implements the reference's torcheval-based metrics
(reference: qinco/metrics.py:29-110) as plain accumulators over numpy /
JAX scalars.  Cross-process reduction happens naturally because the
jitted eval step computes global sums over the batch-sharded mesh; the
host accumulators below only ever see already-reduced numbers.
"""

from __future__ import annotations

import numpy as np


class MSEMetric:
    """Sum-of-squared-error accumulator -> scaled mean per vector
    (reference: qinco/metrics.py:29-65 — note compute() returns
    ``sum((x-xhat)^2) * scale / n_samples``, i.e. per-vector energy)."""

    def __init__(self, scale: float = 1.0):
        self.scale = scale
        self.reset()

    def reset(self) -> None:
        self.loss_sum = 0.0
        self.num_samples = 0

    def update(self, batch: np.ndarray, xhat: np.ndarray, n_valid: int | None = None):
        n = len(batch) if n_valid is None else n_valid
        b, h = np.asarray(batch[:n]), np.asarray(xhat[:n])
        self.loss_sum += float(((b - h) ** 2).sum())
        self.num_samples += n

    def update_sums(self, sq_err_sum: float, n: int) -> None:
        self.loss_sum += float(sq_err_sum)
        self.num_samples += int(n)

    def compute(self) -> float:
        if not self.num_samples:
            return float("nan")
        return self.loss_sum * self.scale / self.num_samples


def corrected_mse(x, y, mse_scale: float = 1.0) -> float:
    """Scaled per-vector MSE between two vector sets
    (reference: qinco/utils.py:87-97)."""
    x, y = np.asarray(x), np.asarray(y)
    assert x.shape == y.shape
    return float(((x - y) ** 2).mean(0).sum()) * mse_scale


ENTROPY_MAX_CODES = 8_388_608  # reference: qinco/metrics.py:77


def codebook_entropy(usage_rows) -> list[float]:
    """Shannon entropy (bits) of each step's codeword-usage histogram
    (reference: qinco/metrics.py:93-99)."""
    out = []
    for u in usage_rows:
        u = np.asarray(u, np.float64)
        total = u.sum()
        if total <= 1e-6:
            out.append(0.0)
            continue
        p = u / total
        p = p[p > 0]
        out.append(float(-(p * np.log2(p)).sum()))
    return out


def compute_recalls(I: np.ndarray, gt: np.ndarray) -> dict[int, float]:
    """recall@{1,10,100}: fraction of queries whose true NN appears in the
    top-r results (reference: qinco/search/search_tasks.py:276-282)."""
    assert I.ndim == 2 and gt.ndim == 2
    return {
        rank: float((I[:, :rank] == gt[:, :1]).sum() / gt.shape[0])
        for rank in (1, 10, 100)
    }
