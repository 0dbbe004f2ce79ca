"""Closed-form LR schedule parity (reference optim/schedulers.py:99-123)."""

import math

import numpy as np

from tante_tpu.train import LinearWarmupCosineAnnealingLR


def reference_closed_form(epoch, warmup, max_epochs, base, warm_start, eta_min):
    if epoch < warmup:
        return warm_start + epoch * (base - warm_start) / max(1, warmup - 1)
    return eta_min + 0.5 * (base - eta_min) * (
        1 + math.cos(math.pi * (epoch - warmup) / (max_epochs - warmup))
    )


def test_schedule_matches_reference_closed_form():
    base, warm, maxe = 5e-5, 2, 34
    sched = LinearWarmupCosineAnnealingLR(
        warmup_epochs=warm,
        max_epochs=maxe,
        lr=base,
        warmup_start_lr=0.1 * base,
        eta_min=0.1 * base,
    )
    for epoch in range(maxe):
        want = reference_closed_form(epoch, warm, maxe, base, 0.1 * base, 0.1 * base)
        np.testing.assert_allclose(float(sched(epoch)), want, rtol=1e-6)


def test_step_schedule_staircase():
    sched = LinearWarmupCosineAnnealingLR(2, 10, lr=1.0, warmup_start_lr=0.1, eta_min=0.1)
    step_fn = sched.as_step_schedule(steps_per_epoch=5)
    # First epoch (steps 0-4) at warmup_start_lr, second epoch at base lr.
    np.testing.assert_allclose(float(step_fn(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(step_fn(4)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(step_fn(5)), 1.0, rtol=1e-6)
    assert float(step_fn(5)) == float(step_fn(9))
