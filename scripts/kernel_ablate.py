"""In-kernel ablation: where does the fused block's non-matmul time go?

The tp half-kernel measurement (scripts/tp_half_kernels_onchip.py) showed
per-block tp=2 scaling efficiency of only 0.63 (1.21 -> 0.96 ms at half
the FLOPs) — a large FLOP-width-independent cost.  This script times the
whole kernel with pieces surgically removed (timing-only variants — the
math is intentionally wrong) to attribute that time:

  full        the production _kernel_body
  no-exp      softmax replaced by raw masked scores (VPU exp/bias/recip gone)
  bf16-exp    the mask-add/min/exp2/sum sweep on bf16 scores (half-width VPU)
  no-norm     exp kept, row-sum + reciprocal normalization removed
  mxu-norm    denominator via an MXU ones-column dot instead of the VPU
              row-sum reduction (correct math, numerator-consistent)
  no-mask     softmax without the additive mask bias (mask build + add gone)
  no-headloop per-head attention replaced by ONE (M, C) @ (C, C) dot
              (upper bound: what if heads/scores were free)
  no-ln       both LayerNorms replaced by identity
  no-gelu     GELU replaced by identity (VPU tanh poly gone)
  matmul-only qkv + out + 2 MLP dots and nothing else

Bench geometry: M=24576 rows (the flagship per-call H-block), l=16,
seq_pack 8 (sp=128), C=256, heads=8, hidden=256, bf16.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tante_tpu.ops.pallas_block import (
    BlockParams,
    _LOG2E,
    _gelu_tanh_f32,
    _ln,
    _tile_plan,
)

DTYPE = jnp.bfloat16
C, HEADS, HIDDEN, L = 256, 8, 256, 16
M = 24576
SEQ_PACK = 8
CAUSAL = False


def body(x, p, mode):
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // HEADS
    sp = SEQ_PACK * L
    b_att = m_rows // sp
    dn2 = (((1,), (0,)), ((), ()))

    def ln(v, s, b):
        return v if mode == "no-ln" else _ln(v, s, b)

    xn = ln(x, p.ln1_scale, p.ln1_bias)

    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p.wq, p.bq)
    k = proj(p.wk, p.bk)
    v = proj(p.wv, p.bv)

    if mode in ("no-headloop", "matmul-only"):
        # one full-width dot stands in for the whole attention stage
        attn = jax.lax.dot_general(
            q, p.wk, dn2, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        mask = (row // L) == (col // L)
        mask_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
        dn_qk = (((2,), (2,)), ((0,), (0,)))
        dn_av = (((2,), (1,)), ((0,), (0,)))
        q3 = q.reshape(b_att, sp, c)
        k3 = k.reshape(b_att, sp, c)
        v3 = v.reshape(b_att, sp, c)
        heads_out = []
        recips = []
        if mode == "two-pass":
            # pass 1: all score/exp/sum work; pass 2: dependency-free AV
            # stream + per-head scale (the ablation said the denominator's
            # dependency serializes the pipeline — test the reorder)
            w_list, r_list = [], []
            for h in range(HEADS):
                qh = q3[:, :, h * d : (h + 1) * d]
                kh = k3[:, :, h * d : (h + 1) * d]
                scores = jax.lax.dot_general(
                    qh, kh, dn_qk, preferred_element_type=jnp.float32
                )
                unnorm = jax.lax.exp2(
                    jnp.minimum(scores + mask_bias[None], 60.0 * _LOG2E)
                )
                w_list.append(unnorm.astype(x.dtype))
                r_list.append(
                    1.0 / (jnp.sum(unnorm, axis=-1, keepdims=True) + 1e-30)
                )
            for h in range(HEADS):
                vh = v3[:, :, h * d : (h + 1) * d]
                ah = jax.lax.dot_general(
                    w_list[h], vh, dn_av, preferred_element_type=jnp.float32
                )
                heads_out.append((ah * r_list[h]).astype(x.dtype))
            attn = jnp.concatenate(heads_out, axis=2).reshape(m_rows, c)
            out = jax.lax.dot_general(
                attn, p.wo, dn2, preferred_element_type=jnp.float32
            )
            x = x + (out + p.bo).astype(x.dtype)
            yn = ln(x, p.ln2_scale, p.ln2_bias)
            h1 = jax.lax.dot_general(
                yn, p.w1, dn2, preferred_element_type=jnp.float32
            )
            h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
            h2 = jax.lax.dot_general(
                h1, p.w2, dn2, preferred_element_type=jnp.float32
            )
            return x + (h2 + p.b2).astype(x.dtype)
        for h in range(HEADS):
            qh = q3[:, :, h * d : (h + 1) * d]
            kh = k3[:, :, h * d : (h + 1) * d]
            vh = v3[:, :, h * d : (h + 1) * d]
            scores = jax.lax.dot_general(
                qh, kh, dn_qk, preferred_element_type=jnp.float32
            )
            if mode == "no-exp":
                unnorm = scores + mask_bias[None]
            elif mode == "bf16-exp":
                s16 = (scores + mask_bias[None]).astype(jnp.bfloat16)
                unnorm = jax.lax.exp2(jnp.minimum(s16, jnp.bfloat16(60.0 * _LOG2E)))
            elif mode == "no-mask":
                unnorm = jax.lax.exp2(jnp.minimum(scores, 60.0 * _LOG2E))
            else:
                unnorm = jax.lax.exp2(
                    jnp.minimum(scores + mask_bias[None], 60.0 * _LOG2E)
                )
            w_un = unnorm.astype(x.dtype)
            if mode == "deferred-norm":
                recip = 1.0 / (jnp.sum(unnorm, axis=-1, keepdims=True) + 1e-30)
            elif mode == "mxu-norm":
                # denominator as an MXU dot over the SAME bf16 weights the
                # AV dot consumes (numerator-consistent); the (sp, 8) ones
                # operand rides the lane-padded output tile
                ones_col = jnp.ones((sp, 8), x.dtype)
                denom = jax.lax.dot_general(
                    w_un, ones_col,
                    (((2,), (0,)), ((0,) if w_un.ndim == 3 else (), ())) if False else (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                recip = 1.0 / (denom[:, :, :1] + 1e-30)
            elif mode in ("no-exp", "no-norm"):
                recip = 1.0
            elif mode == "bf16-exp":
                recip = 1.0 / (
                    jnp.sum(unnorm, axis=-1, keepdims=True).astype(jnp.float32)
                    + 1e-30
                )
            else:
                recip = 1.0 / (jnp.sum(unnorm, axis=-1, keepdims=True) + 1e-30)
            ah = jax.lax.dot_general(
                w_un, vh, dn_av, preferred_element_type=jnp.float32
            )
            if mode == "deferred-norm":
                recips.append(recip)  # (b_att, sp, 1) f32
            else:
                ah = ah * recip
            heads_out.append(ah.astype(x.dtype))
        attn = jnp.concatenate(heads_out, axis=2).reshape(m_rows, c)
        if mode == "deferred-norm":
            # ONE normalization after the loop: per-head recips lane-expand
            # via a fixed 0/1 MXU dot, then a single (M, C) multiply —
            # the 8 AV dots flow back-to-back with no per-head VPU stall
            r_all = jnp.concatenate(recips, axis=2).reshape(m_rows, HEADS)
            hh = jax.lax.broadcasted_iota(jnp.int32, (HEADS, c), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (HEADS, c), 1)
            expand = (jj // d == hh).astype(jnp.float32)  # built in-kernel
            scale = jax.lax.dot_general(
                r_all, expand, dn2, preferred_element_type=jnp.float32
            )
            attn = (attn.astype(jnp.float32) * scale).astype(x.dtype)

    out = jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)
    x = x + (out + p.bo).astype(x.dtype)

    yn = ln(x, p.ln2_scale, p.ln2_bias)
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    if mode in ("no-gelu", "matmul-only"):
        h1 = (h1 + p.b1).astype(x.dtype)
    else:
        h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
    h2 = jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p.b2).astype(x.dtype)


def kernel(mode, x_ref, *refs):
    p = BlockParams(*[r[:] for r in refs[:-1]])
    refs[-1][:] = body(x_ref[:], p, mode)


def run_mode(mode, x2, params, row_tile):
    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    xspec = pl.BlockSpec((row_tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def one(a, w):
        return pl.pallas_call(
            functools.partial(kernel, mode),
            grid=(M // row_tile,),
            in_specs=[xspec] + [wspec(p.shape) for p in params],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((M, C), a.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        )(a, *w)

    # ONE program scanning 32 chained kernel applications: per-program
    # tunnel dispatch (~1.2 ms) amortizes away, matching how the production
    # rollout runs the kernel (many launches inside one jit program).
    SCAN = 32

    @jax.jit
    def f(a, *w):
        def body(carry, _):
            return one(carry, w), ()

        out, _ = jax.lax.scan(body, a, None, length=SCAN)
        return out

    # axon sync caveat (bench.py): block_until_ready does NOT wait on the
    # tunneled backend — materialize a jitted scalar probe instead.
    @jax.jit
    def _probe(y):
        return jnp.sum(y[0, :1])

    y = f(x2, *params)
    float(_probe(y))
    # 16 pipelined programs per sync: the ~25 ms tunnel RTT amortizes over
    # 512 block executions (bench.py "Measurement methodology").
    K = 16
    xs = [x2 + 0.001 * i for i in range(K)]
    for xi in xs:
        xi.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [f(xi, *params) for xi in xs]
        float(_probe(ys[-1]))
        best = min(best, (time.perf_counter() - t0) / (SCAN * K))
    return best * 1e3


def main():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1, DTYPE)

    params = BlockParams(
        ln1_scale=jnp.ones((C,), DTYPE), ln1_bias=jnp.zeros((C,), DTYPE),
        wq=arr(C, C), bq=arr(C), wk=arr(C, C), bk=arr(C),
        wv=arr(C, C), bv=arr(C), wo=arr(C, C), bo=arr(C),
        ln2_scale=jnp.ones((C,), DTYPE), ln2_bias=jnp.zeros((C,), DTYPE),
        w1=arr(C, HIDDEN), b1=arr(HIDDEN), w2=arr(HIDDEN, C), b2=arr(C),
    )
    x2 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32) * 0.5, DTYPE)
    _, row_tile = _tile_plan(M // L, L, C)
    print(f"geometry: M={M} C={C} heads={HEADS} sp={SEQ_PACK * L} row_tile={row_tile}")

    base = None
    for mode in ("full", "two-pass", "deferred-norm", "mxu-norm", "bf16-exp",
                 "no-exp", "no-norm", "no-mask", "no-headloop", "no-ln",
                 "no-gelu", "matmul-only"):
        t = run_mode(mode, x2, params, row_tile)
        if mode == "full":
            base = t
            print(f"{mode:12s}: {t:.3f} ms/block")
        else:
            print(f"{mode:12s}: {t:.3f} ms/block  (saves {base - t:+.3f})")


if __name__ == "__main__":
    main()
