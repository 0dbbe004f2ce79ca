"""A/B: AxisPropagator formulations on chip (round 3).

The einsum form ('bthwc,hj->btjwc') is lowered by XLA to a CONVOLUTION
emitter at ~100 us per dot (trace: fusion.893 etc.), ~0.3 ms/call for the
three propagators whose bandwidth floor is ~60 us each.  Tests collapsed
2-D views and dot_general forms that should hit the plain matmul emitter.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B, T, H, W, C = 8, 4, 16, 48, 256
DTYPE = jnp.bfloat16
ITERS = 300


def timed(name, fn, x, *w):
    @jax.jit
    def run(x, *w):
        return jax.lax.fori_loop(0, ITERS, lambda i, y: fn(y, *w), x)

    @jax.jit
    def probe(y):
        return jnp.sum(y[0, 0, 0, 0, :4].astype(jnp.float32))

    y = run(x, *w)
    float(probe(y))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x, *w)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best/ITERS*1e3:7.4f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32) * 0.1, DTYPE)
    w1 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.1, DTYPE)
    w2 = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.1, DTYPE)

    def einsum_form(x, w1, w2):
        y = jnp.einsum("bthwc,hj->btjwc", x, w1)
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("btjwc,jh->bthwc", y, w2)
        return x + y

    def view2d_form(x, w1, w2):
        z = x.reshape(B * T, H, W * C)
        y = jnp.einsum("ahm,hj->ajm", z, w1)
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("ajm,jh->ahm", y, w2)
        return x + y.reshape(x.shape)

    def dotgen_form(x, w1, w2):
        z = x.reshape(B * T, H, W * C)
        dn = (((2,), (0,)), ((), ()))
        y = jax.lax.dot_general(z.transpose(0, 2, 1), w1, dn)  # (A, M, j)
        y = jax.nn.gelu(y, approximate=False)
        y = jax.lax.dot_general(y, w2, dn)  # (A, M, h)
        return x + y.transpose(0, 2, 1).reshape(x.shape)

    def batched_dot_form(x, w1, w2):
        # (A, h, M) with h contracted from the LEFT: W^T @ z per batch elem.
        z = x.reshape(B * T, H, W * C)
        y = jnp.einsum("hj,ahm->ajm", w1, z)
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("jh,ajm->ahm", w2, y)
        return x + y.reshape(x.shape)

    ref = einsum_form(x, w1, w2)
    for name, fn in [
        ("view2d", view2d_form),
        ("dotgen+transpose", dotgen_form),
        ("batched_dot_left", batched_dot_form),
    ]:
        got = fn(x, w1, w2)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"{name} max|err| {err:.2e}", flush=True)

    timed("H-prop einsum (shipped)", einsum_form, x, w1, w2)
    timed("H-prop view2d", view2d_form, x, w1, w2)
    timed("H-prop dotgen+transpose", dotgen_form, x, w1, w2)
    timed("H-prop batched_dot_left", batched_dot_form, x, w1, w2)


if __name__ == "__main__":
    main()
