"""A/B: 8 separately-dispatched rollouts vs one jit scanning all 8.

The bench's measured per-call time (4.11 ms at 1948 f/s) exceeds the
profiled full model call (3.47 ms) by ~0.6 ms; if that gap is host-side
per-dispatch cost on the tunneled backend (not device work), folding the
measured batch of rollouts into ONE dispatched program recovers it
without changing the workload (same 8 x 16-step autoregressive rollouts,
sequential semantics).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench


def main():
    rollout, params, x = bench.build()

    @jax.jit
    def probe(y):
        return jnp.sum(y[..., 0, 0, 0])

    inputs = [x + 0.001 * i for i in range(bench.MEASURE_ITERS)]
    stacked = jnp.stack(inputs)

    @jax.jit
    def rollout_all(params, xs):
        def body(_, xi):
            return (), rollout(params, xi)

        _, ys = jax.lax.scan(body, (), xs)
        return ys

    # warm both
    y = rollout(params, x)
    float(probe(y))
    ys = rollout_all(params, stacked)
    float(probe(ys[-1]))

    for name, fn in [
        ("8 separate dispatches", None),
        ("one scanned dispatch", None),
    ]:
        pass

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [rollout(params, xi) for xi in inputs]
        float(probe(ys[-1]))
        best = min(best, time.perf_counter() - t0)
    frames = bench.MEASURE_ITERS * bench.BATCH * bench.N_STEPS
    print(f"separate dispatches: {best*1e3:7.1f} ms  -> {frames/best:7.1f} f/s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = rollout_all(params, stacked)
        float(probe(ys[-1]))
        best = min(best, time.perf_counter() - t0)
    print(f"one scanned dispatch: {best*1e3:6.1f} ms  -> {frames/best:7.1f} f/s", flush=True)


if __name__ == "__main__":
    main()
