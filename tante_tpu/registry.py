"""Target-string registry: the ``_target_`` resolution layer.

The reference uses Hydra's ``hydra.utils.instantiate`` with dotted target
strings (``configs/tante.yaml`` -> ``train.py:30,35,41,46,55`` in the
reference).  We keep the same config surface but resolve targets through an
explicit registry so that (a) reference-style names keep working
(``models.TANTE``, ``trainer.MSE``, ``torch.optim.AdamW``, ...) and (b) the
framework never imports torch.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(*names: str) -> Callable[[Callable], Callable]:
    """Decorator: register a constructor under one or more target names."""

    def deco(fn: Callable) -> Callable:
        for name in names:
            _REGISTRY[name] = fn
        return fn

    return deco


def register_alias(name: str, fn: Callable) -> None:
    _REGISTRY[name] = fn


def resolve(target: str) -> Callable[..., Any]:
    """Resolve a target string to a constructor.

    Lookup order: explicit registry (including reference-style aliases),
    then dotted import of ``module.attr``.
    """
    # Ensure the standard registrations have been installed.
    _install_default_aliases()
    if target in _REGISTRY:
        return _REGISTRY[target]
    if "." in target:
        module_name, attr = target.rsplit(".", 1)
        try:
            module = importlib.import_module(module_name)
            return getattr(module, attr)
        except (ImportError, AttributeError) as e:
            raise KeyError(f"Cannot resolve target '{target}': {e}") from e
    raise KeyError(f"Unknown target '{target}'")


_DEFAULTS_INSTALLED = False


def _install_default_aliases() -> None:
    """Install reference-parity aliases lazily (avoids import cycles)."""
    global _DEFAULTS_INSTALLED
    if _DEFAULTS_INSTALLED:
        return
    _DEFAULTS_INSTALLED = True

    from tante_tpu import models as _models
    from tante_tpu import train as _train
    from tante_tpu.data import datamodule as _dm
    from tante_tpu.train import optimizers as _optim
    from tante_tpu.train import schedules as _sched

    # Data (reference: data.TanteDataModule)
    for name in ("data.TanteDataModule", "tante_tpu.data.TanteDataModule"):
        register_alias(name, _dm.TanteDataModule)

    # Models (reference: models.<Name>, models/__init__.py:1-10)
    for model_name in (
        "TANTE",
        "FNO",
        "TFNO",
        "AFNO",
        "UNO",
        "DPOT",
        "AViT",
        "CViT",
        "UNetConvNext",
        "AttentionUNet",
    ):
        ctor = getattr(_models, model_name, None)
        if ctor is not None:
            register_alias(f"models.{model_name}", ctor)
            register_alias(f"tante_tpu.models.{model_name}", ctor)

    # Metrics (reference: trainer.MSE etc., trainer/__init__.py:5)
    for metric_name in (
        "MSE",
        "NMSE",
        "L2RE",
        "NNMSE",
        "RMSE",
        "NRMSE",
        "VMSE",
        "VRMSE",
    ):
        ctor = getattr(_train, metric_name)
        register_alias(f"trainer.{metric_name}", ctor)
        register_alias(f"tante_tpu.train.{metric_name}", ctor)

    # Trainers / evalers
    for cls_name in ("Trainer", "R_Trainer", "Evaler", "R_Evaler"):
        ctor = getattr(_train, cls_name, None)
        if ctor is not None:
            register_alias(f"trainer.{cls_name}", ctor)
            register_alias(f"tante_tpu.train.{cls_name}", ctor)

    # Optimizer (reference: torch.optim.AdamW -> our optax AdamW factory)
    register_alias("torch.optim.AdamW", _optim.AdamW)
    register_alias("optax.adamw", _optim.AdamW)
    register_alias("tante_tpu.train.AdamW", _optim.AdamW)

    # LR scheduler (reference: optim.schedulers.LinearWarmupCosineAnnealingLR)
    register_alias(
        "optim.schedulers.LinearWarmupCosineAnnealingLR",
        _sched.LinearWarmupCosineAnnealingLR,
    )
    register_alias(
        "tante_tpu.train.LinearWarmupCosineAnnealingLR",
        _sched.LinearWarmupCosineAnnealingLR,
    )
