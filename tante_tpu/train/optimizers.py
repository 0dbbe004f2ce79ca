"""Optimizer factories (optax) with the reference's config surface.

The reference instantiates ``torch.optim.AdamW`` with ``lr`` and
``weight_decay`` from YAML (``configs/tante.yaml:37-40``).  Here ``AdamW``
returns a lightweight spec; the trainer combines it with the LR schedule and
the gradient-clipping transform (norm-clip for ``Trainer``
(``trainer/trainer.py:193``), value-clip for ``R_Trainer``
(``trainer/r_trainer.py:155``)) into one ``optax.chain``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

import optax


@dataclass
class AdamW:
    lr: float = 5e-5
    weight_decay: float = 1e-5
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def make(
        self,
        learning_rate: Optional[Union[float, Callable]] = None,
        grad_clip: Optional[str] = "norm",
        clip_value: float = 1.0,
    ) -> optax.GradientTransformation:
        lr = self.lr if learning_rate is None else learning_rate
        transforms = []
        if grad_clip == "norm":
            transforms.append(optax.clip_by_global_norm(clip_value))
        elif grad_clip == "value":
            transforms.append(optax.clip(clip_value))
        transforms.append(
            optax.adamw(
                learning_rate=lr,
                b1=self.b1,
                b2=self.b2,
                eps=self.eps,
                weight_decay=self.weight_decay,
            )
        )
        return optax.chain(*transforms)
