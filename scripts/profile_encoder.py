"""Stage-level profile of the CNN encoder at the bench geometry (round 3).

The 1-frame encode costs ~0.39 ms while its matmul bound is ~10 us — the
three 2x2/stride-2 convs are layout-bound, not FLOP-bound.  This script
times each stage and A/Bs XLA's conv emitter against a space-to-depth +
dense formulation done with ONE small transpose per stage (the (2, W/2)
axis swap; the failed round-2 _PatchDense did the s2d on the 4-lane
physical tensor with a worse axis order — re-tested here per stage).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = 8
DTYPE = jnp.bfloat16
ITERS = 200


def timed(name, fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def probe(y):
        return jnp.sum(y.ravel()[:4].astype(jnp.float32))

    @jax.jit
    def run(*a):
        def body(i, y):
            out = f(*((y,) + a[1:]))
            # carry-through: fold output into the input's leading entries
            return y + 0.0 * jnp.mean(out).astype(y.dtype)

        return jax.lax.fori_loop(0, ITERS, body, a[0])

    y = run(*args)
    float(probe(y))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(*args)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/ITERS*1e3:7.4f} ms", flush=True)


def conv2x2(x, w, b):
    # NHWC 2x2 stride-2 conv via XLA conv emitter.
    out = jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + b


def s2d_dense(x, w2, b):
    # space-to-depth + one dense: (B,H,W,C) -> (B,H/2,W/2,4C) @ (4C,Co).
    bb, hh, ww, cc = x.shape
    z = x.reshape(bb, hh // 2, 2, ww // 2, 2 * cc)
    z = z.transpose(0, 1, 3, 2, 4).reshape(bb, hh // 2, ww // 2, 4 * cc)
    return z @ w2 + b


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("stage1 4->64   (128x384)", (B, 128, 384, 4), 64),
        ("stage2 64->128 (64x192)", (B, 64, 192, 64), 128),
        ("stage3 128->256 (32x96)", (B, 32, 96, 128), 256),
    ]
    for name, shp, co in shapes:
        ci = shp[-1]
        x = jnp.asarray(rng.normal(size=shp).astype(np.float32), DTYPE)
        w = jnp.asarray(rng.normal(size=(2, 2, ci, co)).astype(np.float32) * 0.05, DTYPE)
        b = jnp.asarray(np.zeros(co, np.float32), DTYPE)
        # dense weight with matching element order: (2h, 2w, ci) -> rows
        w2 = jnp.asarray(np.asarray(w, np.float32).reshape(4 * ci, co), DTYPE)

        got = jax.jit(s2d_dense)(x, w2, b)
        want = jax.jit(conv2x2)(x, w, b)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
        print(f"{name} s2d-vs-conv max|err| {err:.2e}", flush=True)

        timed(f"{name} conv", conv2x2, x, w, b)
        timed(f"{name} s2d+dense", s2d_dense, x, w2, b)


if __name__ == "__main__":
    main()
