"""Configuration system for qinco-tpu.

Hydra-free re-implementation of the reference's config surface
(reference: config/qinco_cfg.yaml, run.py:34-45, qinco/utils.py:16-40).
Key differences from the reference, by design:

- The reference threads a mutable ``SharedCfgState`` god-object through
  every module, mixing YAML values with runtime registers
  (``qinco/utils.py:16-40``).  Here the YAML config is a plain nested
  namespace (:class:`Config`) and all runtime state lives in explicit
  dataclasses / pytrees owned by the task.
- Model hyper-parameters that must be static under ``jax.jit`` are
  extracted into the frozen, hashable :class:`qinco_tpu.models.spec.QincoSpec`.

Supports ``model_args=<preset>`` overlays and dotted CLI overrides
(``ds.loop=100000``), matching the reference's Hydra UX.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any

import yaml

_CONFIG_DIR = Path(__file__).parent / "configs"


class Config:
    """Nested attribute/dict-style view over a plain dict tree."""

    def __init__(self, tree: dict):
        object.__setattr__(self, "_tree", tree)

    # -- attribute & item access -------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            val = self._tree[name]
        except KeyError:
            raise AttributeError(f"No config key {name!r}") from None
        if isinstance(val, dict):
            return Config(val)
        return val

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._tree[name] = value

    def __getitem__(self, name: str) -> Any:
        return getattr(self, name)

    def __setitem__(self, name: str, value: Any) -> None:
        setattr(self, name, value)

    def __contains__(self, name: str) -> bool:
        return name in self._tree

    def get(self, name: str, default: Any = None) -> Any:
        val = self._tree.get(name, default)
        if isinstance(val, dict):
            return Config(val)
        return val

    def keys(self):
        return self._tree.keys()

    def items(self):
        return self._tree.items()

    def to_dict(self) -> dict:
        return copy.deepcopy(self._tree)

    def __repr__(self) -> str:
        return "Config(" + yaml.safe_dump(self._tree, default_flow_style=False) + ")"


def _deep_update(dst: dict, src: dict) -> dict:
    for key, val in src.items():
        if isinstance(val, dict) and isinstance(dst.get(key), dict):
            _deep_update(dst[key], val)
        else:
            dst[key] = val
    return dst


def _parse_value(text: str) -> Any:
    """Parse a CLI value with YAML semantics (int/float/bool/null/list).

    YAML 1.1 only treats scientific notation as a float when it has a
    dot ('1.0e-7'); plain '1e-7' would silently stay a string, so fall
    back to Python float parsing for such values.
    """
    try:
        val = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(val, str):
        try:
            return float(val)
        except ValueError:
            return val
    return val


def _set_dotted(tree: dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
        if not isinstance(node, dict):
            raise ValueError(f"Cannot override non-dict key {part!r} in {dotted!r}")
    node[parts[-1]] = value


def available_presets() -> list[str]:
    return sorted(p.stem for p in (_CONFIG_DIR / "model_args").glob("*.yaml"))


def load_config(
    overrides: list[str] | dict | None = None,
    *,
    preset: str | None = None,
) -> Config:
    """Build a config from defaults + optional model preset + overrides.

    ``overrides`` may be a list of ``key=value`` strings (CLI style, dotted
    keys allowed) or a plain dict.  ``model_args=<preset>`` inside the
    overrides selects a preset, mirroring the reference CLI.
    """
    with open(_CONFIG_DIR / "default.yaml") as f:
        tree = yaml.safe_load(f)

    kv_overrides: list[tuple[str, Any]] = []
    if isinstance(overrides, dict):
        kv_overrides = list(overrides.items())
    elif overrides:
        for item in overrides:
            if "=" not in item:
                raise ValueError(f"Override {item!r} must look like key=value")
            key, _, val = item.partition("=")
            kv_overrides.append((key, _parse_value(val)))

    # A preset can come from the explicit arg or a model_args=... override.
    encode_profile = None
    for key, val in list(kv_overrides):
        if key == "model_args":
            preset = val
            kv_overrides.remove((key, val))
        elif key == "encode_profile":
            encode_profile = val
            kv_overrides.remove((key, val))

    # Convenience bundles for the measured encode profiles (docs/
    # architecture.md; individual knobs may still be overridden after):
    #   exact  — reference-parity f32 XLA path (the default.yaml state)
    #   parity — fastest reference-parity selection: in-kernel exact
    #            top-A + fused select/rebuild (68.4k vec/s on v5e)
    #   speed  — fastest overall: binned per-bin kernel (+0.07-0.43%
    #            MSE, 105.7k vec/s on v5e)
    if encode_profile:
        bundles = {
            "exact": {},
            "parity": dict(pallas=True, fast_encode=True,
                           compute_dtype="bfloat16", fused_select=True),
            "speed": dict(pallas=True, fast_encode=True,
                          compute_dtype="bfloat16", fused_substep=True,
                          perbin=True, fused_select=True),
        }
        if encode_profile not in bundles:
            raise ValueError(
                f"Unknown encode_profile {encode_profile!r}; "
                f"available: {sorted(bundles)}"
            )
        # bundle first, explicit dotted overrides still win below
        kv_overrides = list(bundles[encode_profile].items()) + kv_overrides

    if preset:
        preset_path = _CONFIG_DIR / "model_args" / f"{preset}.yaml"
        if not preset_path.exists():
            raise ValueError(
                f"Unknown model preset {preset!r}; available: {available_presets()}"
            )
        with open(preset_path) as f:
            _deep_update(tree, yaml.safe_load(f))

    for key, val in kv_overrides:
        _set_dotted(tree, key, val)

    return Config(tree)


def apply_dataset_preset(cfg: Config) -> None:
    """If ``cfg.db`` names a known dataset, populate its paths
    (reference: qinco/qinco_tasks.py:360-371)."""
    presets = cfg._tree.get("default_datasets", {})
    if cfg.db in presets:
        cfg.db_name = cfg.db  # keep the symbolic name (v1 norm lookup)
        ds_preset = presets[cfg.db]
        for key, val in ds_preset.items():
            if key == "limit_db":
                cfg.ds.db = min(cfg.ds.db or val, val)
            elif key == "mse_scale":
                cfg.mse_scale = val
            else:
                assert key in ("db", "trainset", "queries", "queries_gt")
                cfg[key] = val
