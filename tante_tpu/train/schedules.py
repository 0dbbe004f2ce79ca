"""LR schedules as pure functions of the epoch (optax-compatible).

``LinearWarmupCosineAnnealingLR`` reproduces the closed form of the
reference scheduler (``optim/schedulers.py:99-123``, itself from Microsoft
PDE Arena): linear warmup from ``warmup_start_lr`` to ``lr`` over
``warmup_epochs``, then cosine anneal to ``eta_min``.

The reference steps the scheduler once per *epoch* (``trainer/trainer.py:205``)
and epoch ``e`` (1-indexed) trains with ``closed_form(e - 1)``.  Here the
schedule is a function of the optimizer step; the trainer converts with
``steps_per_epoch`` so the per-epoch staircase is identical.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


class LinearWarmupCosineAnnealingLR:
    """Callable epoch -> lr. Construct with reference-config kwargs."""

    def __init__(
        self,
        warmup_epochs: int,
        max_epochs: int,
        lr: float = 1e-3,
        warmup_start_lr: float = 0.0,
        eta_min: float = 0.0,
    ):
        self.warmup_epochs = warmup_epochs
        self.max_epochs = max_epochs
        self.base_lr = lr
        self.warmup_start_lr = warmup_start_lr
        self.eta_min = eta_min

    def __call__(self, epoch):
        """Closed-form LR at integer ``epoch`` (0-indexed; traced-safe)."""
        epoch = jnp.asarray(epoch, dtype=jnp.float32)
        warm = self.warmup_start_lr + epoch * (self.base_lr - self.warmup_start_lr) / max(
            1, self.warmup_epochs - 1
        )
        denom = max(1, self.max_epochs - self.warmup_epochs)
        cos = self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
            1.0 + jnp.cos(math.pi * (epoch - self.warmup_epochs) / denom)
        )
        return jnp.where(epoch < self.warmup_epochs, warm, cos)

    def as_step_schedule(self, steps_per_epoch: int) -> Callable:
        """optax schedule: optimizer step -> lr (per-epoch staircase)."""
        spe = max(1, int(steps_per_epoch))

        def schedule(step):
            return self(jnp.asarray(step) // spe)

        return schedule
