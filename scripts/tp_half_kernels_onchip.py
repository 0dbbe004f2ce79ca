"""On-chip validation + timing of the tensor-parallel half kernels.

A single tunneled chip can't run tp=2, but it CAN prove the two things the
tp fused path needs from the hardware:

1. the Megatron half kernels (ops/pallas_block.py:_attn_half_kernel /
   _mlp_half_kernel) compile and their COMPOSITION (residual adds at the
   XLA level, no psum at tp=1) is as accurate as the unsplit fused kernel
   against an f32 reference (the partials round once to the activation
   dtype at the kernel boundary — the same rounding class as any other
   bf16 activation; measured: mean |err| 0.0114 split vs 0.0116 whole);
2. the per-shard cost at tp=2 local shapes (heads/2, hidden/2): measured
   directly by slicing the weights the way the Megatron specs shard them.
   tp=2 block cost ~= max-shard time + 2 ICI all-reduces of the
   activation-dtype (M, C) partial.

Flagship-ish geometry: H/W-axis block, l=64, seq_pack 2, C=256, heads=8,
hidden=256 (mlp_ratio 1), M=98304 rows, bf16.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.ops.pallas_block import (
    AttnHalfParams,
    BlockParams,
    MlpHalfParams,
    _ATTN_FIELDS,
    _LOG2E,
    _MLP_FIELDS,
    _attn_half_kernel,
    _mlp_half_kernel,
    _pallas_rowtile,
    _tile_plan,
    fused_block_apply,
)
import functools

DTYPE = jnp.bfloat16
C, HEADS, HIDDEN, L = 256, 8, 256, 64
S = 98304 // L  # rows of l-length sequences
CAUSAL = False


def make_params(rng, c_att, hidden):
    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1, DTYPE)

    return BlockParams(
        ln1_scale=jnp.ones((C,), DTYPE), ln1_bias=jnp.zeros((C,), DTYPE),
        wq=arr(C, c_att), bq=arr(c_att), wk=arr(C, c_att), bk=arr(c_att),
        wv=arr(C, c_att), bv=arr(c_att), wo=arr(c_att, C), bo=arr(C),
        ln2_scale=jnp.ones((C,), DTYPE), ln2_bias=jnp.zeros((C,), DTYPE),
        w1=arr(C, hidden), b1=arr(hidden), w2=arr(hidden, C), b2=arr(C),
    )


def split_block(x, params, heads, c_att):
    """The two half kernels composed at the XLA level (tp=1: no psum)."""
    s, l, c = x.shape
    sp_factor, row_tile = _tile_plan(s, l, c)
    qs = (c_att // heads) ** -0.5 * _LOG2E
    ap = AttnHalfParams(*(getattr(params, f) for f in _ATTN_FIELDS))
    ap = ap._replace(
        wq=(ap.wq.astype(jnp.float32) * qs).astype(ap.wq.dtype),
        bq=(ap.bq.astype(jnp.float32) * qs).astype(ap.bq.dtype),
    )
    mp = MlpHalfParams(*(getattr(params, f) for f in _MLP_FIELDS))
    x2 = x.reshape(s * l, c)
    out = _pallas_rowtile(
        functools.partial(_attn_half_kernel, l, heads, sp_factor, CAUSAL),
        x2, ap, c, row_tile,
    )
    xm = x2 + (out + params.bo).astype(x2.dtype)
    h2 = _pallas_rowtile(_mlp_half_kernel, xm, mp, c, row_tile)
    return (xm + (h2 + params.b2).astype(x2.dtype)).reshape(s, l, c)


def timed(block_fn, x, params, scan=32, k=16):
    """ms per block application.  Two axon-tunnel rules (bench.py
    "Measurement methodology"): block_until_ready does NOT wait on this
    backend (materialize a jitted scalar probe), and per-program dispatch
    + the ~25 ms RTT must amortize over many executions — so each program
    scans ``scan`` chained applications and ``k`` programs pipeline per
    sync."""

    @jax.jit
    def prog(a, p):
        def bd(c, _):
            return block_fn(c, p), ()

        out, _ = jax.lax.scan(bd, a, None, length=scan)
        return out

    @jax.jit
    def probe(y):
        return jnp.sum(y.ravel()[:1])

    y = prog(x, params)
    float(probe(y))
    xs = [x + 0.001 * i for i in range(k)]
    for xi in xs:
        xi.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [prog(xi, params) for xi in xs]
        float(probe(ys[-1]))
        best = min(best, (time.perf_counter() - t0) / (scan * k))
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, L, C)).astype(np.float32) * 0.5, DTYPE)
    params = make_params(np.random.default_rng(1), C, HIDDEN)

    whole = jax.jit(lambda a, p: fused_block_apply(a, p, L, HEADS, CAUSAL))
    halves = jax.jit(lambda a, p: split_block(a, p, HEADS, C))

    y_whole = whole(x, params)
    y_half = halves(x, params)
    same = bool(jnp.all(y_whole == y_half))
    print(f"halves == whole kernel bitwise: {same}")
    # accuracy vs an f32 reference of the same math: the split is only a
    # regression if ITS error exceeds the whole kernel's bf16 error
    from tante_tpu.ops.pallas_block import _xla_block as _xb

    pf = BlockParams(*(a.astype(jnp.float32) for a in params))
    ref = jax.jit(lambda a, p: _xb(a, p, L, HEADS, CAUSAL))(
        x.astype(jnp.float32), pf
    )
    for name, y in (("whole", y_whole), ("halves", y_half)):
        d = jnp.abs(y.astype(jnp.float32) - ref)
        print(f"  |{name} - f32 ref|: max {float(jnp.max(d)):.3e} "
              f"mean {float(jnp.mean(d)):.3e}")

    t_whole = timed(lambda a, p: fused_block_apply(a, p, L, HEADS, CAUSAL), x, params)
    t_half = timed(lambda a, p: split_block(a, p, HEADS, C), x, params)
    print(f"whole kernel:        {t_whole:.3f} ms/block")
    print(f"half kernels (tp=1): {t_half:.3f} ms/block (split overhead "
          f"{(t_half - t_whole) * 1e3:.0f} us)")

    from tante_tpu.ops.pallas_block import _xla_block

    t_xla = timed(lambda a, p: _xla_block(a, p, L, HEADS, CAUSAL), x, params)
    print(f"XLA block (full C):  {t_xla:.3f} ms/block (the pre-round-2 path)")

    # tp=2 local-shard compute: heads/2 attention + hidden/2 MLP
    p_shard = make_params(np.random.default_rng(1), C // 2, HIDDEN // 2)
    halves2 = jax.jit(lambda a, p: split_block(a, p, HEADS // 2, C // 2))
    y2 = halves2(x, p_shard)
    t_shard = timed(lambda a, p: split_block(a, p, HEADS // 2, C // 2), x, p_shard)
    nbytes = jnp.dtype(DTYPE).itemsize
    print(f"tp=2 per-shard halves: {t_shard:.3f} ms/block "
          f"(+ 2 psums of {jnp.dtype(DTYPE).name} ({S*L}, {C}) = "
          f"{S*L*C*nbytes/2**20:.0f} MiB each over ICI)")

    # what tp=2 pays per shard when it FORFEITS the kernel (round-2 design):
    # the XLA block math at local widths, as the SPMD partitioner runs it
    from tante_tpu.ops.pallas_block import _xla_attn_half, _xla_mlp_half

    def xla_shard(a, p):
        out = _xla_attn_half(a, p, L, HEADS // 2, CAUSAL)
        xm = a + (out + p.bo).astype(a.dtype)
        h2 = _xla_mlp_half(xm, p)
        return xm + (h2 + p.b2).astype(a.dtype)

    t_xla2 = timed(xla_shard, x, p_shard)
    print(f"tp=2 per-shard XLA:    {t_xla2:.3f} ms/block (fused-kernel forfeit)")
    print(f"tp=2 kernel keep-win:  {t_xla2 / t_shard:.2f}x per block")


if __name__ == "__main__":
    main()
