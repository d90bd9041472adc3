"""Training / evaluation loops.

Replaces the reference's accelerate-driven epoch machinery
(reference: qinco/qinco_tasks.py:87-249) with jitted steps over a device
mesh.  Static batch shapes + padding weights replace the reference's
"fake batch" lockstep padding for distributed eval
(qinco_tasks.py:93-96,130-133).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..logsys import MetricLogger
from ..models.qinco import decode_raw, encode
from ..models.spec import QincoSpec
from ..parallel.mesh import shard_batch
from ..utils import Timer


def make_eval_fns(spec: QincoSpec):
    """Jitted encode / decode / error fns for the MSE eval loop
    (reference: compute_MSE, qinco_tasks.py:87-148)."""

    @jax.jit
    def encode_fn(params, batch):
        x = (batch - params.data_mean) / params.data_std
        codes, _, _ = encode(params, spec, x)
        return codes

    @jax.jit
    def decode_fn(params, codes):
        return decode_raw(params, spec, codes)

    @jax.jit
    def sq_err_fn(batch, xhat, weights):
        return jnp.sum((batch - xhat) ** 2 * weights[:, None])

    return encode_fn, decode_fn, sq_err_fn


def compute_mse(
    params,
    spec: QincoSpec,
    loader,
    melog: MetricLogger | None = None,
    *,
    mesh=None,
    mse_scale: float = 1.0,
    timing: bool = False,
    warmup_batches: int = 10,
) -> float:
    """Evaluate scaled MSE over a loader; optionally time encode/decode
    per vector (reference `eval_time` protocol, qinco_tasks.py:98-145)."""
    encode_fn, decode_fn, sq_err_fn = make_eval_fns(spec)

    def put(x):
        return shard_batch(mesh, x) if mesh is not None else jnp.asarray(x)

    it = iter(loader)
    first = next(it, None)
    if first is None:
        return float("nan")

    if timing and warmup_batches:
        for _ in range(warmup_batches):
            codes = encode_fn(params, put(first.x))
            xhat = decode_fn(params, codes)
        jax.block_until_ready(xhat)

    t_encode, t_decode = Timer(), Timer()
    loss_sum, n_vecs = 0.0, 0
    if melog is not None:
        melog.start_eval(len(loader))

    def batches():
        yield first
        yield from it

    # Multi-host: every process feeds identical-shape shards (the data
    # layer hands each host exactly span//n rows), so the global valid
    # count is local n_valid × process_count; the squared-error sum is
    # already global (computed inside jit over the sharded batch).
    n_hosts = jax.process_count()
    for i_batch, b in enumerate(batches()):
        xb = put(b.x)
        with t_encode:
            codes = encode_fn(params, xb)
            jax.block_until_ready(codes)
        with t_decode:
            xhat = decode_fn(params, codes)
            jax.block_until_ready(xhat)
        w = np.zeros((len(b.x),), np.float32)
        w[: b.n_valid] = 1.0
        err = float(sq_err_fn(xb, xhat, put(w)))
        nv = b.n_valid * n_hosts
        loss_sum += err
        n_vecs += nv
        if melog is not None:
            melog.step_eval_sums(i_batch, err, nv)

    if timing:
        print(f"Encoding time: {t_encode.s()} | Decoding time: {t_decode.s()}")
        print(f"Encoding time / vector: {t_encode.get() / n_vecs * 1e6:.1f}μs")
        print(f"Decoding time / vector: {t_decode.get() / n_vecs * 1e6:.1f}μs")

    mse = loss_sum * mse_scale / max(n_vecs, 1)
    if melog is not None:
        melog.end_eval()
        melog.last_val_mse = mse
    return mse
