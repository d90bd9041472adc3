"""Parameter and state pytrees + initializers.

One parameter set serves training, encoding and decoding — the jitted
entry points in :mod:`qinco_tpu.models.qinco` specialize behavior, so the
reference's duplicated module families (QINCo / QINCoInferenceEncoder /
QINCoInferenceDecoder sharing weights, qinco/model/qinco_base.py +
qinco_inference.py) collapse into this single pytree.

Per-step MLP weights are **stacked along a leading step axis** so the
encode/decode loops are ``lax.scan`` over steps — the TPU-idiomatic shape
(single compiled step body, no per-step unrolling).

Reference initialization semantics preserved:
- concat MLP zero-init (residual no-op at init), FFN down-proj zero-init,
  FFN up / in/out proj Kaiming-uniform (qinco_base.py:52-97, 239-246);
- QINCo1 mode uses torch's default Linear init everywhere
  (kaiming-uniform with a=sqrt(5), i.e. bound 1/sqrt(fan_in));
- codebooks + substep codebooks get identical RQ-derived values with
  shared noise (qinco_base.py:27-44).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spec import QincoSpec


class StepParams(NamedTuple):
    """Weights of one MLP quantization step; leaves may carry a leading
    stacked-step axis."""

    codebook: jnp.ndarray  # (K, D)
    sub_codebook: Optional[jnp.ndarray]  # (K, D) when A > 0
    concat_w: jnp.ndarray  # (De + D, De) — or (De + D, rank) when concat_rank
    concat_w2: Optional[jnp.ndarray]  # (rank, De) low-rank concat (QINCo-LR)
    concat_b: jnp.ndarray  # (De,)
    ffn_up: jnp.ndarray  # (L, De, Dh)
    ffn_down: jnp.ndarray  # (L, Dh, De)
    in_proj: Optional[jnp.ndarray]  # (D, De) when De != D
    out_proj: Optional[jnp.ndarray]  # (De, D) when De != D


class QincoParams(NamedTuple):
    codebook0: jnp.ndarray  # (K0, D) — step-0 codebook (IVF book when ivf_K > 0)
    steps: StepParams  # stacked (M_ivf - 1, ...)
    data_mean: jnp.ndarray  # (D,)
    data_std: jnp.ndarray  # () scalar


class ModelState(NamedTuple):
    """Non-trained, mutated-by-training state, kept explicit
    (reference keeps these as torch buffers: qinco_base.py:254-260)."""

    xtarget_mean: jnp.ndarray  # (M_ivf - 1, D) EMA of per-step residual mean
    xtarget_var: jnp.ndarray  # (M_ivf - 1, D) EMA of per-step residual std
    x0_mean: jnp.ndarray  # (D,) EMA of step-0 input mean (normalized space)
    x0_std: jnp.ndarray  # (D,) EMA of step-0 input std
    usage0: jnp.ndarray  # (K0,) step-0 codeword usage this epoch
    usage: jnp.ndarray  # (M_ivf - 1, K) per-step codeword usage this epoch


def _kaiming_uniform(key, shape, fan_in, gain: float) -> jnp.ndarray:
    bound = gain * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


RELU_GAIN = float(np.sqrt(2.0))
TORCH_DEFAULT_GAIN = float(np.sqrt(1.0 / 3.0))  # kaiming_uniform(a=sqrt(5))


def _init_one_step(key, spec: QincoSpec) -> StepParams:
    D, De, Dh, L, K = spec.D, spec.De, spec.dh, spec.L, spec.K
    ks = jax.random.split(key, 8)
    q1 = spec.qinco1_mode

    rank = spec.concat_rank
    concat_out = rank if rank else De
    if q1:
        concat_w = _kaiming_uniform(
            ks[0], (De + D, concat_out), De + D, TORCH_DEFAULT_GAIN
        )
        b_bound = 1.0 / np.sqrt(De + D)
        concat_b = jax.random.uniform(ks[1], (De,), jnp.float32, -b_bound, b_bound)
        ffn_up = _kaiming_uniform(ks[2], (L, De, Dh), De, TORCH_DEFAULT_GAIN)
        ffn_down = _kaiming_uniform(ks[3], (L, Dh, De), Dh, TORCH_DEFAULT_GAIN)
    else:
        concat_w = jnp.zeros((De + D, concat_out), jnp.float32)
        concat_b = jnp.zeros((De,), jnp.float32)
        ffn_up = _kaiming_uniform(ks[2], (L, De, Dh), De, RELU_GAIN)
        ffn_down = jnp.zeros((L, Dh, De), jnp.float32)
    # QINCo-LR low-rank concat factor (reference: qinco_v1/model_qinco.py:164-177)
    concat_w2 = (
        _kaiming_uniform(ks[7], (rank, De), rank, TORCH_DEFAULT_GAIN)
        if rank
        else None
    )

    if De != D:
        gain = TORCH_DEFAULT_GAIN if q1 else RELU_GAIN
        in_proj = _kaiming_uniform(ks[4], (D, De), D, gain)
        out_proj = _kaiming_uniform(ks[5], (De, D), De, gain)
    else:
        in_proj = None
        out_proj = None

    codebook = jax.random.normal(ks[6], (K, D), jnp.float32)
    # distinct buffer: aliased leaves break jit buffer donation
    sub_codebook = codebook.copy() if spec.has_substep() else None
    return StepParams(
        codebook=codebook,
        sub_codebook=sub_codebook,
        concat_w=concat_w,
        concat_w2=concat_w2,
        concat_b=concat_b,
        ffn_up=ffn_up,
        ffn_down=ffn_down,
        in_proj=in_proj,
        out_proj=out_proj,
    )


def init_params(
    key: jax.Array,
    spec: QincoSpec,
    *,
    data_mean: np.ndarray | None = None,
    data_std: float | np.ndarray | None = None,
    ivf_centroids: np.ndarray | None = None,
) -> QincoParams:
    k0, ksteps = jax.random.split(key)
    Ms = spec.n_mlp_steps

    step_keys = jax.random.split(ksteps, Ms)
    steps = jax.vmap(lambda k: _init_one_step(k, spec))(step_keys)

    if spec.ivf_in_use:
        assert ivf_centroids is None or ivf_centroids.shape == (spec.ivf_K, spec.D)
        codebook0 = (
            jnp.asarray(ivf_centroids, jnp.float32)
            if ivf_centroids is not None
            else jnp.zeros((spec.ivf_K, spec.D), jnp.float32)
        )
    else:
        codebook0 = jax.random.normal(k0, (spec.K0, spec.D), jnp.float32)

    mean = (
        jnp.asarray(data_mean, jnp.float32)
        if data_mean is not None
        else jnp.zeros((spec.D,), jnp.float32)
    )
    std = jnp.asarray(data_std if data_std is not None else 1.0, jnp.float32)
    return QincoParams(codebook0=codebook0, steps=steps, data_mean=mean, data_std=std)


def init_model_state(spec: QincoSpec) -> ModelState:
    Ms = spec.n_mlp_steps
    return ModelState(
        xtarget_mean=jnp.zeros((Ms, spec.D), jnp.float32),
        xtarget_var=jnp.ones((Ms, spec.D), jnp.float32),
        x0_mean=jnp.zeros((spec.D,), jnp.float32),
        x0_std=jnp.ones((spec.D,), jnp.float32),
        usage0=jnp.zeros((spec.K0,), jnp.int32),
        usage=jnp.zeros((Ms, spec.K), jnp.int32),
    )


def set_codebooks_from_rq(
    key: jax.Array,
    params: QincoParams,
    spec: QincoSpec,
    rq_centroids: list[np.ndarray],
    noise_init: float = 0.1,
) -> QincoParams:
    """Initialize codebooks (and substep codebooks) from trained-RQ stage
    centroids (reference: qinco_base.py:27-44).

    ``rq_centroids`` holds one (K, D) array per non-IVF stage, in *raw data
    space*; stage 0 of a non-IVF model is normalized with (mean, std),
    later stages only by std.
    """
    mean, std = params.data_mean, params.data_std
    noise_scale = noise_init if not spec.qinco1_mode else 1.0

    new_books = []
    keys = jax.random.split(key, len(rq_centroids))
    for i_stage, (cent, k) in enumerate(zip(rq_centroids, keys)):
        c = jnp.asarray(cent, jnp.float32)
        if i_stage == 0 and not spec.ivf_in_use:
            c = (c - mean) / std
        else:
            c = c / std
        c = c + jax.random.normal(k, c.shape) * jnp.std(c) * noise_scale
        new_books.append(c)

    if spec.ivf_in_use:
        # All RQ stages map onto MLP steps; step 0 keeps the IVF book.
        stacked = jnp.stack(new_books)
        steps = params.steps._replace(codebook=stacked)
        if spec.has_substep():
            steps = steps._replace(sub_codebook=stacked.copy())
        return params._replace(steps=steps)

    codebook0 = new_books[0]
    stacked = jnp.stack(new_books[1:])
    steps = params.steps._replace(codebook=stacked)
    if spec.has_substep():
        steps = steps._replace(sub_codebook=stacked.copy())
    return params._replace(codebook0=codebook0, steps=steps)


def count_params(params: QincoParams) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
