"""Minimal Hydra-equivalent config layer.

Capabilities mirrored from the reference (SURVEY.md section 5, "Config /
flag system"): per-model YAML files with ``_target_`` trees, recursive
instantiation, dotted CLI overrides (``a.b.c=value``), ``--config-name``
selection, and runtime mutation (checkpoint path resolution in
``utils.set_ckpt``, ``eval.py:23``'s ``eval_steps_output`` override).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml

from tante_tpu.registry import resolve

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


class Config(dict):
    """A dict with attribute access and dotted get/set, like OmegaConf lite."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    # ---- dotted access -------------------------------------------------
    def select(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def update_dotted(self, dotted: str, value: Any) -> None:
        node: Any = self
        parts = dotted.split(".")
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> Dict[str, Any]:
        return _unwrap(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def copy(self) -> "Config":
        return _wrap(copy.deepcopy(_unwrap(self)))


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _unwrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _unwrap(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_unwrap(v) for v in obj]
    return obj


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML semantics (ints, floats, bools)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_config(
    config_name: str,
    config_dir: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> Config:
    """Load ``<config_dir>/<config_name>.yaml`` and apply dotted overrides."""
    config_dir = config_dir or CONFIG_DIR
    path = config_name if config_name.endswith((".yaml", ".yml")) else os.path.join(config_dir, config_name + ".yaml")
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = _wrap(raw or {})
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' is not of the form key=value")
        key, _, val = ov.partition("=")
        cfg.update_dotted(key.strip(), _parse_value(val.strip()))
    return cfg


def instantiate(node: Any, **extra_kwargs: Any) -> Any:
    """Recursively instantiate a ``_target_`` config node (Hydra parity).

    Child dicts containing ``_target_`` are instantiated first; other values
    pass through.  ``extra_kwargs`` override/add constructor arguments the
    same way the reference passes ``dset_metadata=...`` etc.
    (reference ``train.py:30,35,41,46,55``).
    """
    if isinstance(node, dict) and "_target_" in node:
        ctor = resolve(node["_target_"])
        kwargs = {
            k: instantiate(v) for k, v in node.items() if k != "_target_"
        }
        kwargs.update(extra_kwargs)
        return ctor(**kwargs)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def set_ckpt(cfg: Config, choose: str = "recent") -> tuple:
    """Resolve the experiment folder and auto-resume checkpoint.

    Mirrors reference ``utils.py:36-47``: maps ``cfg.experiment`` to
    ``<root_path>/experiments/<experiment>/``; if a ``<choose>`` checkpoint
    exists there, its path is written into both ``cfg.trainer.checkpoint_path``
    and ``cfg.evaler.checkpoint_path``.  Checkpoints here are orbax
    directories (``recent/`` / ``best/``) rather than ``.pt`` files.
    """
    # Absolute: orbax's tensorstore layer rejects relative checkpoint paths.
    experiment_folder = os.path.abspath(
        os.path.join(cfg["root_path"], "experiments", cfg["experiment"])
    )
    checkpoint_path = ""
    if os.path.exists(experiment_folder):
        candidate = os.path.join(experiment_folder, choose)
        if os.path.isdir(candidate):
            checkpoint_path = candidate
    else:
        os.makedirs(experiment_folder, exist_ok=True)
    if "trainer" in cfg:
        cfg["trainer"]["checkpoint_path"] = checkpoint_path
    if "evaler" in cfg:
        cfg["evaler"]["checkpoint_path"] = checkpoint_path
    return cfg, experiment_folder
