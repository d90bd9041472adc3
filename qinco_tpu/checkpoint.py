"""Checkpoint I/O.

Single-file ``.npz`` checkpoints carrying the flattened parameter /
model-state / optimizer pytrees plus a JSON metadata record with the
hyperparameters needed to rebuild the model — the same contract as the
reference's torch.save dict (reference: qinco/utils.py:100-137:
{epoch, model, optimizer, scheduler, logger, parameters{K,M,de,dh,L,A,B,
ivf_in_use,ivf_K,qinco1_mode}, data_dim}).

Also provides the ``.pt`` converter that imports reference-trained torch
checkpoints into this layout (replacing the reference's `convert` task,
qinco/qinco_tasks.py:508-573), which is the parity oracle path.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

SAVED_PARAMETERS = [
    "K",
    "M",
    "de",
    "dh",
    "L",
    "A",
    "B",
    "ivf_in_use",
    "ivf_K",
    "qinco1_mode",
]


def _flatten(tree) -> list[np.ndarray]:
    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(tree)]


def _unflatten_like(template, leaves):
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    assert len(t_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, template expects {len(t_leaves)}"
    )
    cast = [
        jnp.asarray(l, t.dtype if hasattr(t, "dtype") else None)
        for l, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)


def save_checkpoint(
    path: str | Path,
    *,
    params,
    model_state=None,
    opt_state=None,
    epoch: int | None = None,
    scheduler_state: dict | None = None,
    logger_state: dict | None = None,
    hyperparams: dict | None = None,
    data_dim: int | None = None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    arrays: dict[str, np.ndarray] = {}
    meta: dict = {
        "epoch": epoch,
        "scheduler": scheduler_state,
        "logger": logger_state,
        "parameters": hyperparams or {},
        "data_dim": data_dim,
        "counts": {},
    }
    for name, tree in (
        ("params", params),
        ("mstate", model_state),
        ("opt", opt_state),
    ):
        if tree is None:
            meta["counts"][name] = -1
            continue
        leaves = _flatten(tree)
        meta["counts"][name] = len(leaves)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}_{i:04d}"] = leaf

    arrays["_meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.rename(path)


def load_checkpoint_meta(path: str | Path) -> dict:
    with np.load(path) as data:
        return json.loads(bytes(data["_meta"]).decode("utf-8"))


def load_checkpoint(
    path: str | Path,
    *,
    params_template,
    mstate_template=None,
    opt_template=None,
) -> dict:
    """Restore pytrees from a checkpoint using structure templates."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["_meta"]).decode("utf-8"))
        out = {"meta": meta}
        counts = meta["counts"]

        def load_tree(name, template):
            n = counts.get(name, -1)
            if n < 0 or template is None:
                return None
            leaves = [data[f"{name}_{i:04d}"] for i in range(n)]
            return _unflatten_like(template, leaves)

        out["params"] = load_tree("params", params_template)
        out["mstate"] = load_tree("mstate", mstate_template)
        out["opt_state"] = load_tree("opt", opt_template)
    return out


# ---------------------------------------------------------------------------
# Reference (.pt) checkpoint import
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str | Path):
    """Read a reference torch checkpoint -> (state arrays dict, metadata).

    Weight layout notes: torch Linear stores (out, in) and computes
    ``x @ W.T``; our layout is (in, out) for ``x @ W`` — transposed here.
    """
    import torch

    state = torch.load(str(path), map_location="cpu", weights_only=True)
    model_sd = state["model"] if "model" in state else state
    model_sd = {
        k.replace("module.", ""): v.numpy() for k, v in model_sd.items()
    }
    meta = {
        "epoch": state.get("epoch"),
        "parameters": state.get("parameters", {}),
        "data_dim": state.get("data_dim"),
    }
    return model_sd, meta


def params_from_torch_state(model_sd: dict, spec, params_template, mstate_template):
    """Map a reference state dict onto (QincoParams, ModelState).

    Reference module paths (qinco/model/qinco_base.py):
      steps.{m}.codebook.weight, steps.{m}.substep.codebook.weight,
      steps.{m}.concat.mlp.{weight,bias}, steps.{m}.residual_blocks.{l}.
      {up_proj,down_proj}.weight, steps.{m}.{in,out}_proj.weight,
      steps.{m}.ivf_centroids.weight (IVF step 0),
      steps.{m}.{xtarget_mean,xtarget_var}, data_mean, data_std.
    """
    Ms = spec.n_mlp_steps
    first_mlp = 1  # step 0 is always codebook-only / IVF

    def get(key):
        assert key in model_sd, f"missing key {key} in torch checkpoint"
        return np.asarray(model_sd[key], np.float32)

    if spec.ivf_in_use:
        codebook0 = get("steps.0.ivf_centroids.weight")
    else:
        codebook0 = get("steps.0.codebook.weight")

    def stack(fmt, transpose=False, optional=False):
        out = []
        for m in range(first_mlp, first_mlp + Ms):
            key = fmt.format(m=m)
            if optional and key not in model_sd:
                return None
            w = get(key)
            out.append(w.T if transpose else w)
        return np.stack(out)

    steps = params_template.steps._replace(
        codebook=stack("steps.{m}.codebook.weight"),
        sub_codebook=(
            stack("steps.{m}.substep.codebook.weight", optional=True)
            if spec.has_substep()
            else None
        ),
        concat_w=stack("steps.{m}.concat.mlp.weight", transpose=True),
        concat_w2=None,  # reference QINCo2 checkpoints have no LR concat
        concat_b=stack("steps.{m}.concat.mlp.bias"),
        ffn_up=np.stack(
            [
                np.stack(
                    [
                        get(f"steps.{m}.residual_blocks.{l}.up_proj.weight").T
                        for l in range(spec.L)
                    ]
                )
                for m in range(first_mlp, first_mlp + Ms)
            ]
        ),
        ffn_down=np.stack(
            [
                np.stack(
                    [
                        get(f"steps.{m}.residual_blocks.{l}.down_proj.weight").T
                        for l in range(spec.L)
                    ]
                )
                for m in range(first_mlp, first_mlp + Ms)
            ]
        ),
        in_proj=(
            stack("steps.{m}.in_proj.weight", transpose=True)
            if spec.De != spec.D
            else None
        ),
        out_proj=(
            stack("steps.{m}.out_proj.weight", transpose=True)
            if spec.De != spec.D
            else None
        ),
    )

    data_mean = get("data_mean")
    data_std = np.asarray(model_sd["data_std"], np.float32).reshape(())

    params = params_template._replace(
        codebook0=jnp.asarray(codebook0),
        steps=jax.tree.map(lambda x: jnp.asarray(x), steps),
        data_mean=jnp.asarray(data_mean),
        data_std=jnp.asarray(data_std),
    )

    mstate = mstate_template
    if mstate is not None and f"steps.{first_mlp}.xtarget_mean" in model_sd:
        mstate = mstate._replace(
            xtarget_mean=jnp.asarray(stack("steps.{m}.xtarget_mean")),
            xtarget_var=jnp.asarray(stack("steps.{m}.xtarget_var")),
        )
    return params, mstate
