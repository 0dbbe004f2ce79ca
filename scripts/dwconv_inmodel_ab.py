"""In-model A/B of depthwise-7x7 lowerings for UNetConvNext: the isolated
A/B (scripts/dwconv_ab.py) ranks laneflat/dense ~2.2x over XLA grouped, but
the full-model zoo number REGRESSED 358 -> 234 f/s when laneflat landed —
the lowering behaves differently inside the per-stage ``nn.scan`` while
bodies.  This measures the whole zoo_bench rollout per variant.

Usage: python scripts/dwconv_inmodel_ab.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    _cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

from tante_tpu.ops import convs as convs_mod  # noqa: E402


def dw_grouped(x, kernel, bias=None):
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        (1, 1),
        ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def dw_dense(x, kernel, bias=None):
    c = x.shape[-1]
    kd = kernel[:, :, 0, :, None].astype(x.dtype) * jnp.eye(c, dtype=x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kd,
        (1, 1),
        ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


VARIANTS = {
    "lanes": convs_mod.depthwise_conv2d_lanes,
    "grouped": dw_grouped,
    "dense": dw_dense,
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        convs_mod.depthwise_conv2d_lanes = VARIANTS[name]
        # zoo_bench imports convs symbols indirectly through the model,
        # which calls convs_mod.depthwise_conv2d_lanes at trace time via
        # DepthwiseConv2d -> module-global lookup.
        import importlib

        import zoo_bench

        importlib.reload(zoo_bench)
        rollout, params, x, chunk, probe = zoo_bench.build_rollout("unet_convnext")
        y = rollout(params, x)
        float(probe(y))
        reps = 16
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ys = [rollout(params, x + 0.001 * i) for i in range(reps)]
            float(probe(ys[-1]))
            dt = min(dt, time.perf_counter() - t0)
        fps = reps * zoo_bench.BATCH * zoo_bench.N_STEPS / dt
        print(json.dumps({"variant": name, "frames_per_sec_per_chip": round(fps, 1)}))


if __name__ == "__main__":
    main()
