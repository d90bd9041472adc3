"""The jitted training step and its optimizer plumbing.

Replaces the reference's accelerate/DDP loop body (reference:
qinco/qinco_tasks.py:179-213 + qinco_base.py:487-503) with one pure
function: no-grad beam-search encode, per-step decode losses, AdamW with
clip-by-value, EMA statistics, and codeword-usage histograms — all inside
a single XLA program.  Data parallelism comes from ``jit`` over a
batch-sharded mesh (grad reduction compiled by XLA over ICI), not from a
gradient-bucketing wrapper.

Frozen leaves (IVF codebook, data mean/std — torch buffers in the
reference, qinco_base.py:139-140,432-433) are masked out of the optimizer
via ``optax.multi_transform``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.params import ModelState, QincoParams
from ..models.qinco import encode, train_losses
from ..models.spec import QincoSpec

STATS_MOMENTUM = 0.1  # reference: qinco_base.py:254


class TrainStepOutput(NamedTuple):
    total_loss: jnp.ndarray
    losses: dict
    codes: jnp.ndarray  # (M_ivf, N)


def optimizer_param_labels(params: QincoParams, spec: QincoSpec):
    """'train' / 'frozen' label pytree for optax.multi_transform."""
    labels = jax.tree.map(lambda _: "train", params)
    return labels._replace(
        codebook0="frozen" if spec.ivf_in_use else "train",
        data_mean="frozen",
        data_std="frozen",
    )


def build_optimizer(cfg, params: QincoParams, spec: QincoSpec):
    """AdamW/Adam with reference hyperparameters; LR injected per step
    (reference: qinco_tasks.py:41-54)."""
    name = str(cfg.optimizer).lower()
    wd = float(cfg.wd or 0.0)
    if name == "adamw":
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=float(cfg.lr), weight_decay=wd
        )
    elif name == "adam":
        # The reference passes weight_decay to torch.optim.Adam (L2-style)
        inner = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.adam(learning_rate),
            )
        )(learning_rate=float(cfg.lr))
    else:
        raise ValueError(f"Unknown optimizer {cfg.optimizer!r}")

    labels = optimizer_param_labels(params, spec)
    tx = optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, labels
    )
    return tx


def set_learning_rate(opt_state, lr: float):
    """Poke the injected LR into the optimizer state (host-side)."""

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return s

    return jax.tree.map(
        visit,
        opt_state,
        is_leaf=lambda s: hasattr(s, "hyperparams"),
    )


def _clip_by_value(grads, clip: float):
    """Reference clips gradients by value, not by norm
    (qinco_tasks.py:196-197 — clip_grad_value_)."""
    return jax.tree.map(lambda g: jnp.clip(g, -clip, clip), grads)


def _micro_batch_pass(spec: QincoSpec, params, mstate: ModelState, x, weights):
    """Forward + grad of one micro-batch; updates the EMA/usage state.

    Returns (grads·n_valid, losses·n_valid, n_valid, codes, mstate): the
    caller divides by the total valid count, which makes accumulated
    micro-batches *exactly* equal to one large batch (the reference's
    effective batch = nproc × batch × accum, qinco/log.py:160).
    """
    codes, _, enc_stats = encode(
        jax.lax.stop_gradient(params), spec, x, weights=weights,
        want_stats=True,
    )

    def loss_fn(p):
        total, aux = train_losses(p, spec, x, codes, weights)
        return total, aux

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    # EMA buffers (reference: qinco_base.py:296-304).  A fully padded
    # micro-batch (grad-accum tail) contributes no update: momentum 0.
    m = STATS_MOMENTUM * (weights.sum() > 0)
    n_valid = jnp.maximum(weights.sum(), 1.0)
    x_mean = jnp.sum(x * weights[:, None], axis=0) / n_valid
    x_var = jnp.sum((x - x_mean) ** 2 * weights[:, None], axis=0) / jnp.maximum(
        n_valid - 1.0, 1.0
    )
    mstate = mstate._replace(
        xtarget_mean=m * enc_stats.xtarget_mean + (1 - m) * mstate.xtarget_mean,
        xtarget_var=m * enc_stats.xtarget_std + (1 - m) * mstate.xtarget_var,
        x0_mean=m * x_mean + (1 - m) * mstate.x0_mean,
        x0_std=m * jnp.sqrt(x_var) + (1 - m) * mstate.x0_std,
    )

    # Codeword-usage histograms for entropy logging + dead-code reset
    # (reference: metrics.py:83-91, log.py:253-254).
    w_int = weights.astype(jnp.int32)
    usage0 = mstate.usage0.at[codes[0]].add(w_int)
    usage = jax.vmap(lambda u, c: u.at[c].add(w_int))(mstate.usage, codes[1:])
    mstate = mstate._replace(usage0=usage0, usage=usage)

    nv = weights.sum()
    losses = {k: v * nv for k, v in aux.items() if k != "xhat"}
    grads = jax.tree.map(lambda g: g * nv, grads)
    return grads, (total * nv, losses), nv, codes, mstate


def make_train_step(spec: QincoSpec, tx, grad_clip: float | None, accum: int = 1):
    """Build the jitted train step.

    accum == 1: (params, opt_state, mstate, batch (N, D), weights (N,)).
    accum > 1:  batch (accum, N, D), weights (accum, N) — *stacked*
    micro-batches (place with ``shard_stacked_batch`` so each stays
    spread over the data axis; a flat concatenation would force a
    resharding collective per micro-batch).

    ``accum > 1`` scans the micro-batches, averaging gradients weighted
    by valid-row counts before the single optimizer update — numerically
    identical to one (accum·N)-row batch (the reference wires this
    through accelerate, qinco_tasks.py:341).
    """

    def train_step(params, opt_state, mstate: ModelState, batch, weights):
        # Normalize with frozen statistics (no grad into mean/std).
        mean = jax.lax.stop_gradient(params.data_mean)
        std = jax.lax.stop_gradient(params.data_std)
        x_all = (batch - mean) / std

        if accum == 1:
            grads, (total, losses), nv, codes, mstate = _micro_batch_pass(
                spec, params, mstate, x_all, weights
            )
            n_total = jnp.maximum(nv, 1.0)
        else:
            assert batch.ndim == 3 and batch.shape[0] == accum, (
                f"accum={accum} expects stacked (accum, N, D) batches, "
                f"got {batch.shape}"
            )
            xs = x_all
            ws = weights

            def body(carry, xw):
                gsum, tsum, lsums, mstate = carry
                x, w = xw
                g, (t, ls), nv, codes, mstate = _micro_batch_pass(
                    spec, params, mstate, x, w
                )
                gsum = jax.tree.map(jnp.add, gsum, g)
                lsums = jax.tree.map(jnp.add, lsums, ls)
                return (gsum, tsum + t, lsums, mstate), (codes, nv)

            g0 = jax.tree.map(jnp.zeros_like, params)
            # Trace one micro-batch to get the loss-dict structure.
            l0 = jax.eval_shape(
                lambda p: _micro_batch_pass(spec, p, mstate, xs[0], ws[0])[1][1],
                params,
            )
            l0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), l0)
            (grads, total, losses, mstate), (codes_all, nvs) = jax.lax.scan(
                body, (g0, jnp.float32(0.0), l0, mstate), (xs, ws)
            )
            n_total = jnp.maximum(nvs.sum(), 1.0)
            # (accum, M_ivf, N) -> (M_ivf, accum·N)
            codes = jnp.moveaxis(codes_all, 0, 1).reshape(codes_all.shape[1], -1)

        grads = jax.tree.map(lambda g: g / n_total, grads)
        total = total / n_total
        losses = jax.tree.map(lambda v: v / n_total, losses)

        if grad_clip:
            grads = _clip_by_value(grads, grad_clip)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        return params, opt_state, mstate, TrainStepOutput(total, losses, codes)

    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def reset_usage(mstate: ModelState) -> ModelState:
    return mstate._replace(
        usage0=jnp.zeros_like(mstate.usage0), usage=jnp.zeros_like(mstate.usage)
    )


@functools.partial(jax.jit, static_argnames=("spec", "noise_init"))
def reset_unused_codebooks(
    key: jax.Array,
    params: QincoParams,
    mstate: ModelState,
    spec: QincoSpec,
    noise_init: float = 0.1,
):
    """Re-initialize codewords unused over the last epoch
    (reference: qinco_base.py:385-413, triggered from log.py:253-254).

    New rows ~ standardized U[0,1) scaled by the per-step EMA residual
    statistics; substep rows get the same values plus noise/4.
    Returns (params, n_reset_per_step (M_ivf-1+1,)).
    """
    Ms, K, D = spec.n_mlp_steps, spec.K, spec.D
    k_main, k_noise, k0 = jax.random.split(key, 3)

    rand = jax.random.uniform(k_main, (Ms, K, D), jnp.float32)
    rand = (rand - rand.mean((1, 2), keepdims=True)) / rand.std((1, 2), keepdims=True)
    new_books = rand * mstate.xtarget_var[:, None, :] + mstate.xtarget_mean[:, None, :]

    used = (mstate.usage > 0)[:, :, None]  # (Ms, K, 1)
    noise_scale = noise_init if not spec.qinco1_mode else 1.0

    steps = params.steps
    codebook = jnp.where(used, steps.codebook, new_books)
    steps = steps._replace(codebook=codebook)
    if spec.has_substep():
        sub_new = new_books + jax.random.normal(
            k_noise, new_books.shape
        ) * new_books.std((1, 2), keepdims=True) * (noise_scale / 4)
        sub = jnp.where(used, steps.sub_codebook, sub_new)
        steps = steps._replace(sub_codebook=sub)
    params = params._replace(steps=steps)

    n_reset = jnp.sum(~used[..., 0], axis=1)  # (Ms,)

    if not spec.ivf_in_use:
        # Step-0 codebook resets too (it's a plain trainable codebook).
        rand0 = jax.random.uniform(k0, (spec.K0, D), jnp.float32)
        rand0 = (rand0 - rand0.mean()) / rand0.std()
        new0 = rand0 * mstate.x0_std + mstate.x0_mean
        used0 = (mstate.usage0 > 0)[:, None]
        params = params._replace(
            codebook0=jnp.where(used0, params.codebook0, new0)
        )
        n_reset = jnp.concatenate([jnp.sum(~used0[:, 0])[None], n_reset])
    else:
        n_reset = jnp.concatenate([jnp.zeros((1,), n_reset.dtype), n_reset])

    return params, n_reset
