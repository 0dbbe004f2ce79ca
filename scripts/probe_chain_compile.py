"""Measure axon remote-compile wall time + runtime for the sub-chain fused
kernel at the flagship bench geometry (B=8, dims (4,16,48), C=256, 8 heads).

Round-2 data points (docs/PERF.md): 1 block + 1 P-dot = 30 s; 3 blocks +
3 P-dots > 9 min; 9 blocks > 56 min.  The sub-chain formulation needs only
1 P-dot for a TH pair and 2 for a THW triple (input arrives in T order,
output leaves in W order), so this probes whether pairs/triples fit a
usable compile budget — and what they actually save at runtime.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tante_tpu.ops.pallas_block import (
    BlockParams,
    _pallas_block,
    default_row_tile,
    default_seq_pack,
    fused_chain_apply,
)

DIMS = (4, 16, 48)
B, C, HEADS = 8, 256, 8
M = DIMS[0] * DIMS[1] * DIMS[2]
DTYPE = jnp.bfloat16


def mk_params(rng):
    c = C
    return BlockParams(
        *[
            jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05, DTYPE)
            for s in [
                (c,), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,),
                (c,), (c,), (c, c), (c,), (c, c), (c,),
            ]
        ]
    )


def main():
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(
        rng.normal(size=(B * DIMS[1] * DIMS[2], DIMS[0], C)).astype(np.float32) * 0.1,
        DTYPE,
    )  # T-layout rows

    @jax.jit
    def probe(y):
        return jnp.sum(y[:4, :4].astype(jnp.float32))

    def timed_runs(fn, *args):
        y = fn(*args)
        float(probe(y.reshape(-1, C)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                y = fn(*args)
            float(probe(y.reshape(-1, C)))
            best = min(best, time.perf_counter() - t0)
        return best / 20 * 1e3

    for axes in ["TH", "THW"]:
        params = tuple(mk_params(rng) for _ in axes)
        f = jax.jit(
            lambda a, ps, _axes=axes: fused_chain_apply(a, ps, _axes, HEADS, DIMS)
        )
        t0 = time.perf_counter()
        y = f(x3, params)
        float(probe(y.reshape(-1, C)))
        compile_s = time.perf_counter() - t0
        per_call = timed_runs(f, x3, params)
        print(
            f"chain {axes:4s} compile {compile_s:7.1f} s   run {per_call:7.3f} ms",
            flush=True,
        )

    # Reference: the same blocks through the per-block kernel path, with the
    # XLA rearranges between them (what the chain replaces).
    from einops import rearrange

    params3 = tuple(mk_params(rng) for _ in "THW")

    def per_block(x3, ps):
        t, h, w = DIMS
        sp_t = default_seq_pack(t)
        y = _pallas_block(
            x3.reshape(-1, C), ps[0], t, HEADS, True, sp_t, 1024
        ).reshape(-1, t, C)
        y5 = rearrange(y, "(b h w) t c -> b t h w c", b=B, h=h, w=w)
        y = rearrange(y5, "b t h w c -> (b t w) h c")
        y = _pallas_block(
            y.reshape(-1, C), ps[1], h, HEADS, False, default_seq_pack(h), 1024
        ).reshape(-1, h, C)
        y5 = rearrange(y, "(b t w) h c -> b t h w c", b=B, t=t, w=w)
        y = rearrange(y5, "b t h w c -> (b t h) w c")
        y = _pallas_block(
            y.reshape(-1, C), ps[2], w, HEADS, False, default_seq_pack(w), 768
        ).reshape(-1, w, C)
        return y

    f_ref = jax.jit(per_block)
    t0 = time.perf_counter()
    y = f_ref(x3, params3)
    float(probe(y.reshape(-1, C)))
    compile_s = time.perf_counter() - t0
    per_call = timed_runs(f_ref, x3, params3)
    print(
        f"per-block THW (ref) compile {compile_s:5.1f} s   run {per_call:7.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
