"""Component profile of the fused transformer-block kernel (round 3).

The shipped kernel runs ~0.29-0.31 ms/block at the flagship geometry while
its matmul lower bound is ~0.11 ms (docs/PERF.md).  This script compiles
ABLATED kernel variants (same I/O shape, pieces of the math removed) and
times each end-to-end on the TPU, isolating where the extra ~0.19 ms goes:
LayerNorms (f32 cross-lane reductions), the f32 score softmax, the tanh
GELU, the per-head unrolled dots, or grid/pipeline overhead.

Methodology per docs/PERF.md: sync by materializing a jitted scalar probe
(block_until_ready lies on the tunneled backend), best-of-3, N inner
iterations per timing to amortize the ~25 ms tunnel RTT.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tante_tpu.ops.pallas_block import (
    BlockParams,
    _gelu_tanh_f32,
    _ln,
    default_row_tile,
    default_seq_pack,
)

# Flagship T-axis geometry: B=8, T=4, Hp=16, Wp=48, C=256 -> rows 24576.
import os as _os
M, C, HEADS = 24576, 256, 8
L = int(_os.environ.get("PBK_L", "4"))
CAUSAL = L == 4
DTYPE = jnp.bfloat16
ITERS = 500


def make_params(rng):
    c = C
    hidden = c
    arrs = []
    for shape in [
        (c,), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,),
        (c,), (c,), (c, hidden), (hidden,), (hidden, c), (c,),
    ]:
        arrs.append(jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05, DTYPE))
    return BlockParams(*arrs)


def kernel_body(x, p, seq_pack, flags):
    """Ablated copy of pallas_block._kernel_body controlled by ``flags``."""
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // HEADS
    sp = seq_pack * L
    b_att = m_rows // sp
    dn2 = (((1,), (0,)), ((), ()))

    if "ln" in flags:
        xn = _ln(x, p.ln1_scale, p.ln1_bias)
    else:
        xn = x

    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p.wq, p.bq) * (d**-0.5)
    k = proj(p.wk, p.bk)
    v = proj(p.wv, p.bv)

    if "attn" in flags:
        row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        mask = (row // L) == (col // L)
        if CAUSAL:
            mask = mask & ((row % L) >= (col % L))  # causal T axis
        dn_qk = (((2,), (2,)), ((0,), (0,)))
        dn_av = (((2,), (1,)), ((0,), (0,)))
        heads_out = []
        for h in range(HEADS):
            qh = q[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
            kh = k[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
            vh = v[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
            scores = jax.lax.dot_general(
                qh, kh, dn_qk, preferred_element_type=jnp.float32
            )
            if "softmax" in flags:
                scores = jnp.where(mask[None], scores, -1e30)
                smax = jnp.max(scores, axis=-1, keepdims=True)
                unnorm = jnp.exp(scores - smax)
                w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(x.dtype)
            elif "softmax_fast" in flags:
                bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
                unnorm = jnp.exp(jnp.minimum(scores + bias[None], 60.0))
                w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(x.dtype)
            elif "softmax_nomax" in flags:
                bias = jnp.where(mask[None], 0.0, -1e30)
                unnorm = jnp.exp(scores + bias)
                w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(x.dtype)
            else:
                w = scores.astype(x.dtype)
            ah = jax.lax.dot_general(w, vh, dn_av, preferred_element_type=jnp.float32)
            heads_out.append(ah.astype(x.dtype).reshape(m_rows, d))
        if "split_wo" in flags:
            # Skip the lane concat: accumulate sum_h ah @ wo[hd:(h+1)d, :].
            acc = None
            for h, ah in enumerate(heads_out):
                part = jax.lax.dot_general(
                    ah,
                    p.wo[h * d : (h + 1) * d, :],
                    dn2,
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            x = x + (acc + p.bo).astype(x.dtype)
            attn = None
        else:
            attn = jnp.concatenate(heads_out, axis=1)
    else:
        attn = v

    if attn is not None:
        out = jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)
        x = x + (out + p.bo).astype(x.dtype)

    if "ln" in flags:
        yn = _ln(x, p.ln2_scale, p.ln2_bias)
    else:
        yn = x
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    if "gelu" in flags:
        h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
    else:
        h1 = (h1 + p.b1).astype(x.dtype)
    h2 = jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p.b2).astype(x.dtype)


def build_variant(flags, seq_pack=None, row_tile=None):
    sp_factor = seq_pack if seq_pack is not None else default_seq_pack(L)
    sp = sp_factor * L
    rt = row_tile if row_tile is not None else default_row_tile(C, sp)

    def kern(x_ref, *refs):
        if "copy" in flags:  # floor: stream x through VMEM untouched
            refs[-1][:] = x_ref[:] + jnp.asarray(1e-6, x_ref.dtype)
            return
        p = BlockParams(*[r[:] for r in refs[:-1]])
        refs[-1][:] = kernel_body(x_ref[:], p, sp_factor, flags)

    def apply(x2, params):
        m_total, c = x2.shape
        m_pad = (m_total + rt - 1) // rt * rt
        if m_pad != m_total:
            x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
        xspec = pl.BlockSpec((rt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(
                shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
            )

        out = pl.pallas_call(
            kern,
            grid=(m_pad // rt,),
            in_specs=[xspec] + [wspec(a.shape) for a in params],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct((m_pad, c), x2.dtype),
        )(x2, *params)
        return out[:m_total]

    return apply


def time_variant(name, apply, x2, params, probe):
    # fori_loop: compile the kernel ONCE regardless of ITERS, so ITERS can
    # be large enough (500) that the ~25-50 ms tunnel RTT floor is <2% of
    # the measurement (the unrolled 50x version carried a ~0.5 ms/block
    # additive floor that swamped the ablation deltas).
    @jax.jit
    def run(x2, params):
        return jax.lax.fori_loop(0, ITERS, lambda i, y: apply(y, params), x2)

    y = run(x2, params)
    float(probe(y))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x2, params)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    per_call = (best) / ITERS * 1e3
    print(f"{name:38s} {per_call:7.4f} ms/block", flush=True)
    return per_call


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x2 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32) * 0.1, DTYPE)

    @jax.jit
    def probe(y):
        return jnp.sum(y[:8, :8].astype(jnp.float32))

    variants = [
        ("floor (VMEM copy kernel)", frozenset({"copy"})),
        ("full (ln+attn+softmax+gelu)", frozenset({"ln", "attn", "softmax", "gelu"})),
        ("no-ln", frozenset({"attn", "softmax", "gelu"})),
        ("no-softmax (scores direct)", frozenset({"ln", "attn", "gelu"})),
        ("softmax-nomax (bias add, no max-sub)", frozenset({"ln", "attn", "softmax_nomax", "gelu"})),
        ("no-gelu", frozenset({"ln", "attn", "softmax"})),
        ("no-attn (v passthrough)", frozenset({"ln", "gelu"})),
        ("matmuls-only", frozenset()),
    ]
    if _os.environ.get("PBK_SWEEP_ONLY"):
        variants = variants[:1]
    for name, flags in variants:
        try:
            time_variant(name, build_variant(flags), x2, params, probe)
        except Exception as e:
            print(f"{name:38s} FAILED: {str(e)[:120]}", flush=True)

    # Cross-check: the SHIPPED kernel in the same harness.
    from tante_tpu.ops.pallas_block import _pallas_block

    def shipped(x2, params):
        return _pallas_block(
            x2, params, L, HEADS, CAUSAL, default_seq_pack(L), default_row_tile(C, 32)
        )

    time_variant("shipped _pallas_block", shipped, x2, params, probe)

    # (seq_pack x row_tile) sweep at the shipped math (fast softmax), plus
    # the split-wo (no head concat) variant at the best tile.
    full_fast = frozenset({"ln", "attn", "softmax_fast", "gelu"})
    sp_opts = {4: (8, 16, 32), 16: (2, 4, 8), 48: (1, 2, 4)}[L]
    for sp_factor in sp_opts:
        for rt in (768, 1024, 1536, 2048):
            if rt % (sp_factor * L) or M % rt:
                continue
            name = f"fast sp={sp_factor*L:3d} rt={rt}"
            try:
                time_variant(
                    name, build_variant(full_fast, sp_factor, rt), x2, params, probe
                )
            except Exception as e:
                print(f"{name:38s} FAILED: {str(e)[:100]}", flush=True)
    extras = [] if _os.environ.get("PBK_SWEEP_ONLY") else [
        ("split_wo sp=32 rt=1024", full_fast | {"split_wo"}, 8, 1024),
        ("no-ln fast sp=32 rt=1024", frozenset({"attn", "softmax_fast", "gelu"}), 8, 1024),
    ]
    for name, flags, spf, rt in extras:
        try:
            time_variant(name, build_variant(flags, spf, rt), x2, params, probe)
        except Exception as e:
            print(f"{name:38s} FAILED: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
