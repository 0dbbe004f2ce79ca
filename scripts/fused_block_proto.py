"""Prototype: fully fused axial transformer block as ONE Pallas kernel.

v5 design (after Mosaic shape-op probing, see docs/PERF.md):
- x block is 2-D (M, C) with M = rows*L -> every dense matmul (qkv, out,
  MLP) runs with a full-MXU M dimension.
- Mosaic supports SUBLANE reshapes ((M, C) <-> (M/S', S', C)) and LANE
  slicing/concat at offset 0, but not lane *splits* ((M, C) -> (M, H, D))
  nor concat of offset-carrying slices.  So: per head, lane-slice q/k/v
  (M, D), sublane-reshape to (B', S', D), run the score/AV core batched,
  reshape back, lane-concat the 8 offset-0 head outputs.
- seq_pack packs several short sequences into one score matrix (block-diagonal
  mask) so S' stays 32-48 even for L=4.

A/B against the XLA TransformerBlock math at the three TANTE layouts and
as a 9-block THWTHWTHW backbone chain.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DTYPE = jnp.bfloat16
HEADS, D = 8, 32
C = HEADS * D
SCAN = 16


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _fused_kernel(
    l: int,
    heads: int,
    seq_pack: int,
    causal: bool,
    x_ref,
    ln1s_ref,
    ln1b_ref,
    wq_ref,
    bq_ref,
    wk_ref,
    bk_ref,
    wv_ref,
    bv_ref,
    wo_ref,
    bo_ref,
    ln2s_ref,
    ln2b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    o_ref,
):
    x = x_ref[:]  # (M, C)
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // heads
    sp = seq_pack * l
    b_att = m_rows // sp

    xn = _ln(x, ln1s_ref[:], ln1b_ref[:])
    dn2 = (((1,), (0,)), ((), ()))  # (M, C) @ (C, N)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(xn, w_ref[:], dn2, preferred_element_type=jnp.float32)
        return (y + b_ref[:]).astype(x.dtype)

    q = proj(wq_ref, bq_ref) * (d**-0.5)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    # Block-diagonal (+causal) mask over seq_pack packed sequences.
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = (row // l) == (col // l)
    if causal:
        mask = mask & ((row % l) >= (col % l))

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    heads_out = []
    for h in range(heads):
        qh = q[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        kh = k[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        vh = v[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        scores = jax.lax.dot_general(qh, kh, dn_qk, preferred_element_type=jnp.float32)
        scores = jnp.where(mask[None], scores, -1e30)
        smax = jnp.max(scores, axis=-1, keepdims=True)
        unnorm = jnp.exp(scores - smax)
        w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(x.dtype)
        ah = jax.lax.dot_general(w, vh, dn_av, preferred_element_type=jnp.float32)
        heads_out.append(ah.astype(x.dtype).reshape(m_rows, d))
    attn = jnp.concatenate(heads_out, axis=1)  # (M, C) lane concat

    out = jax.lax.dot_general(attn, wo_ref[:], dn2, preferred_element_type=jnp.float32)
    x = x + (out + bo_ref[:]).astype(x.dtype)

    yn = _ln(x, ln2s_ref[:], ln2b_ref[:])
    h1 = jax.lax.dot_general(yn, w1_ref[:], dn2, preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[:]
    # tanh-GELU ("NewGELU", the reference Mlp nonlinearity) in f32
    h1 = 0.5 * h1 * (1.0 + jnp.tanh(0.7978845608028654 * (h1 + 0.044715 * h1**3)))
    h1 = h1.astype(x.dtype)
    h2 = jax.lax.dot_general(h1, w2_ref[:], dn2, preferred_element_type=jnp.float32)
    o_ref[:] = x + (h2 + b2_ref[:]).astype(x.dtype)


PARAM_ORDER = [
    "ln1s",
    "ln1b",
    "wq",
    "bq",
    "wk",
    "bk",
    "wv",
    "bv",
    "wo",
    "bo",
    "ln2s",
    "ln2b",
    "w1",
    "b1",
    "w2",
    "b2",
]


def fused_block(x, params, l, heads, causal, seq_pack=0, row_tile=0):
    """x: (S, L, C) -> (S, L, C); computed 2-D as (S*L, C)."""
    s, l_, c = x.shape
    assert l_ == l
    if seq_pack <= 0:
        seq_pack = max(1, 32 // l)
    x2 = x.reshape(s * l, c)
    m_total = s * l
    sp = seq_pack * l
    if row_tile <= 0:
        # budget ~12 f32 (M-tile, C) intermediates + per-head f32 scores
        per_m_row = 12 * max(c, 128) * 4 + max(sp, 128) * 4
        row_tile = max(sp, min(4096, 6 * 2**20 // per_m_row // sp * sp))
    m_pad = (m_total + row_tile - 1) // row_tile * row_tile
    if m_pad != m_total:
        x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
    grid = (m_pad // row_tile,)
    xspec = pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    args = [params[kname] for kname in PARAM_ORDER]
    out = pl.pallas_call(
        functools.partial(_fused_kernel, l, heads, seq_pack, causal),
        grid=grid,
        in_specs=[xspec] + [wspec(a.shape) for a in args],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
    )(x2, *args)
    return out[:m_total].reshape(s, l, c)


def xla_block(x, params, l, heads, causal):
    """Reference math in XLA (unpacked per-head attention, f32 softmax)."""
    c = x.shape[-1]
    d = c // heads
    xn = _ln(x, params["ln1s"], params["ln1b"])
    q = (xn @ params["wq"] + params["bq"]) * (d**-0.5)
    k = xn @ params["wk"] + params["bk"]
    v = xn @ params["wv"] + params["bv"]

    def split(t):
        return t.reshape(*t.shape[:-1], heads, d)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32)
    if causal:
        m = jnp.tril(jnp.ones((l, l), dtype=bool))
        logits = jnp.where(m, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(*x.shape)
    x = x + attn @ params["wo"] + params["bo"]
    yn = _ln(x, params["ln2s"], params["ln2b"])
    h1 = jax.nn.gelu((yn @ params["w1"] + params["b1"]).astype(jnp.float32), approximate=True)
    return x + (h1.astype(x.dtype) @ params["w2"] + params["b2"])


def make_params(rng, c):
    def t(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape) * scale, DTYPE)

    return {
        "ln1s": jnp.ones((c,), DTYPE),
        "ln1b": jnp.zeros((c,), DTYPE),
        "wq": t(c, c),
        "bq": t(c),
        "wk": t(c, c),
        "bk": t(c),
        "wv": t(c, c),
        "bv": t(c),
        "wo": t(c, c),
        "bo": t(c),
        "ln2s": jnp.ones((c,), DTYPE),
        "ln2b": jnp.zeros((c,), DTYPE),
        "w1": t(c, c),
        "b1": t(c),
        "w2": t(c, c),
        "b2": t(c),
    }


def timed(fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def probe(y):
        return jnp.sum(y.ravel()[:1])

    y = f(*args)
    float(probe(y))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = f(*args)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_wrap(op, n=SCAN):
    def fn(x):
        def body(c, _):
            return op(c), ()

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    return fn


def main():
    rng = np.random.default_rng(0)
    rtt = timed(scan_wrap(lambda c: c + 1.0, 4), jnp.ones((8, 8), DTYPE))
    print(f"rtt {rtt*1e3:.1f} ms")

    layouts = {"T": (6144, 4, True), "H": (1536, 16, False), "W": (512, 48, False)}
    params = make_params(rng, C)

    # correctness first (on-chip, small)
    for name, (s, l, causal) in layouts.items():
        xs = jnp.asarray(rng.normal(size=(64, l, C)), DTYPE)
        want = xla_block(xs, params, l, HEADS, causal)
        got = fused_block(xs, params, l, HEADS, causal)
        err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"{name} max|diff| = {err:.4f} (scale ~{float(jnp.std(want)):.2f})")

    for name, (s, l, causal) in layouts.items():
        x = jnp.asarray(rng.normal(size=(s, l, C)), DTYPE)
        dt_x = timed(
            scan_wrap(lambda c, l=l, causal=causal: xla_block(c, params, l, HEADS, causal)), x
        )
        dt_f = timed(
            scan_wrap(lambda c, l=l, causal=causal: fused_block(c, params, l, HEADS, causal)), x
        )
        print(
            f"{name}: xla {(dt_x-rtt)/SCAN*1e3:6.3f} ms   fused {(dt_f-rtt)/SCAN*1e3:6.3f} ms"
        )

    # 9-block chain with rearranges, canonical (B,T,H,W,C) carry
    from einops import rearrange

    B, T, HP, WP = 8, 4, 16, 48
    x5 = jnp.asarray(rng.normal(size=(B, T, HP, WP, C)), DTYPE)

    def chain(block_fn):
        def op(c):
            for axis in "THWTHWTHW":
                if axis == "T":
                    y = rearrange(c, "b t h w c -> (b h w) t c")
                    y = block_fn(y, 4, True)
                    c = rearrange(y, "(b h w) t c -> b t h w c", b=B, h=HP, w=WP)
                elif axis == "H":
                    y = rearrange(c, "b t h w c -> (b t w) h c")
                    y = block_fn(y, HP, False)
                    c = rearrange(y, "(b t w) h c -> b t h w c", b=B, t=T, w=WP)
                else:
                    y = rearrange(c, "b t h w c -> (b t h) w c")
                    y = block_fn(y, WP, False)
                    c = rearrange(y, "(b t h) w c -> b t h w c", b=B, t=T, h=HP)
            return c

        return op

    dt_x = timed(scan_wrap(chain(lambda y, l, causal: xla_block(y, params, l, HEADS, causal))), x5)
    dt_f = timed(scan_wrap(chain(lambda y, l, causal: fused_block(y, params, l, HEADS, causal))), x5)
    print(f"chain9: xla {(dt_x-rtt)/SCAN*1e3:6.2f} ms   fused {(dt_f-rtt)/SCAN*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
