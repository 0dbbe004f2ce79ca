"""A/B depthwise-7x7 lowering candidates on chip at UNetConvNext stage
geometries (reference ``models/unet_convnext.py:103-111``).

Variants:
  grouped   — XLA grouped conv (nn.Conv feature_group_count=C), the original
  laneflat  — (W*C)-flat shift-and-add (ops/convs.py:depthwise_conv2d_lanes)
  nchw      — transpose to (B,C,H,W), 49 shifted H/W slices, transpose back
  dense     — block-diagonal (7,7,C,C) kernel -> regular conv on the MXU

Usage: python scripts/dwconv_ab.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tante_tpu.ops.convs import depthwise_conv2d_lanes  # noqa: E402

K = 7
GEOMS = [  # (H, W, C) per UNetConvNext stage at the bench 128x384 geometry
    (128, 384, 15),
    (64, 192, 30),
    (32, 96, 60),
    (16, 48, 120),
    (8, 24, 240),
]
B = 8


def grouped(x, kern, bias):
    # bias in x.dtype so every variant is timed producing identical bf16
    # outputs (an f32 bias would promote this variant's output to f32).
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), ((K // 2, K // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    ) + bias.astype(x.dtype)


def laneflat(x, kern, bias):
    return depthwise_conv2d_lanes(x, kern, bias)


def nchw(x, kern, bias):
    b, h, w, c = x.shape
    xt = jnp.transpose(x, (0, 3, 1, 2))
    xp = jnp.pad(xt, ((0, 0), (0, 0), (K // 2, K // 2), (K // 2, K // 2)))
    acc = None
    for i in range(K):
        for j in range(K):
            seg = xp[:, :, i : i + h, j : j + w]
            wij = kern[i, j, 0].astype(x.dtype)[None, :, None, None]
            term = (seg * wij).astype(jnp.float32)
            acc = term if acc is None else acc + term
    y = jnp.transpose(acc, (0, 2, 3, 1)) + bias
    return y.astype(x.dtype)


def dense(x, kern, bias):
    c = x.shape[-1]
    kd = kern[:, :, 0, :, None].astype(x.dtype) * jnp.eye(c, dtype=x.dtype)
    return jax.lax.conv_general_dilated(
        x, kd, (1, 1), ((K // 2, K // 2),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(x.dtype)


def timeit(fn, *args, n=30):
    f = jax.jit(fn)
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1e6  # us


def main():
    variants = {"grouped": grouped, "laneflat": laneflat, "nchw": nchw, "dense": dense}
    print(f"{'geom':>16} " + " ".join(f"{k:>10}" for k in variants))
    totals = {k: 0.0 for k in variants}
    for h, w, c in GEOMS:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, c), jnp.bfloat16)
        kern = jax.random.normal(jax.random.PRNGKey(1), (K, K, 1, c), jnp.float32)
        bias = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
        row = []
        for name, fn in variants.items():
            us = timeit(fn, x, kern, bias)
            totals[name] += us
            row.append(f"{us:10.1f}")
        print(f"{str((h, w, c)):>16} " + " ".join(row))
    print(f"{'TOTAL us':>16} " + " ".join(f"{totals[k]:10.1f}" for k in variants))


if __name__ == "__main__":
    main()
