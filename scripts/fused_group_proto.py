"""Prototype (HISTORICAL): first group-fusion attempt with in-kernel 4-D
transposes. Superseded by ops/pallas_block.py:fused_group_apply, which uses
permutation MATMULS instead (in-kernel transposes cost ~170 s of remote
Mosaic compile time EACH — see docs/PERF.md "Group fusion" for the full
compile-time isolation matrix and the final >56-minute negative result).

Prototype: a GROUP of axial transformer blocks (THW / THWTHWTHW) fused
into ONE Pallas kernel, grid over batch elements.

Between blocks, tokens are re-ordered with in-VMEM 4-D transposes (probed
supported on Mosaic) instead of HBM rearranges; each block body is the
proven v5 design (2-D matmuls, lane-sliced heads, sublane reshapes,
seq_pack for short axes).
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

from scripts.fused_block_proto import make_params, timed, scan_wrap, xla_block

DTYPE = jnp.bfloat16
HEADS, D = 8, 32
C = HEADS * D
SCAN = 16
B, T, HP, WP = 8, 4, 16, 48


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _block_body(x, p, l, heads, seq_pack, causal):
    """x: (M, C) tokens, axis-contiguous. p: dict of one block's params."""
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // heads
    sp = seq_pack * l
    b_att = m_rows // sp

    xn = _ln(x, p["ln1s"], p["ln1b"])
    dn2 = (((1,), (0,)), ((), ()))

    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p["wq"], p["bq"]) * (d**-0.5)
    k = proj(p["wk"], p["bk"])
    v = proj(p["wv"], p["bv"])

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
    attn = jnp.concatenate(heads_out, axis=1)

    out = jax.lax.dot_general(attn, p["wo"], dn2, preferred_element_type=jnp.float32)
    x = x + (out + p["bo"]).astype(x.dtype)

    yn = _ln(x, p["ln2s"], p["ln2b"])
    h1 = jax.lax.dot_general(yn, p["w1"], dn2, preferred_element_type=jnp.float32)
    h1 = h1 + p["b1"]
    h1 = (0.5 * h1 * (1.0 + jnp.tanh(0.7978845608028654 * (h1 + 0.044715 * h1**3)))).astype(
        x.dtype
    )
    h2 = jax.lax.dot_general(h1, p["w2"], dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p["b2"]).astype(x.dtype)


PARAM_KEYS = [
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

# Row orders: which (t,h,w) permutation makes the axis contiguous.
# canonical = (t, h, w).
ORDER = {"T": ("h", "w", "t"), "H": ("t", "w", "h"), "W": ("t", "h", "w")}
DIMS = {"t": T, "h": HP, "w": WP}
SEQ = {"T": T, "H": HP, "W": WP}


def _perm_between(cur, dst):
    """Permutation mapping a (*cur, C) 4-D view to (*dst, C)."""
    return tuple(cur.index(a) for a in dst) + (3,)


def _group_kernel(axes: str, heads: int, x_ref, *refs):
    o_ref = refs[-1]
    prefs = refs[:-1]  # stacked params: 16 arrays, each (n_blocks, ...)
    x = x_ref[:]  # (T*H*W, C) canonical, one batch element
    c = x.shape[-1]
    cur = ("t", "h", "w")
    for i, axis in enumerate(axes):
        dst = ORDER[axis]
        if dst != cur:
            shape4 = tuple(DIMS[a] for a in cur) + (c,)
            x = x.reshape(shape4).transpose(_perm_between(cur, dst)).reshape(-1, c)
            cur = dst
        p = {kname: prefs[j][i] for j, kname in enumerate(PARAM_KEYS)}
        l = SEQ[axis]
        seq_pack = max(1, 32 // l) if l < 32 else 1
        x = _block_body(x, p, l, heads, seq_pack, causal=(axis == "T"))
    if cur != ("t", "h", "w"):
        shape4 = tuple(DIMS[a] for a in cur) + (c,)
        x = x.reshape(shape4).transpose(_perm_between(cur, ("t", "h", "w"))).reshape(-1, c)
    o_ref[:] = x


def fused_group(x5, stacked, axes: str, heads: int):
    """x5: (B, T, H, W, C); stacked: dict key -> (n_blocks, ...) arrays."""
    b, t, hp, wp, c = x5.shape
    m = t * hp * wp
    x2 = x5.reshape(b * m, c)
    grid = (b,)
    xspec = pl.BlockSpec((m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM)

    args = [stacked[k] for k in PARAM_KEYS]
    out = pl.pallas_call(
        functools.partial(_group_kernel, axes, heads),
        grid=grid,
        in_specs=[xspec] + [wspec(a.shape) for a in args],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b * m, c), x5.dtype),
    )(x2, *args)
    return out.reshape(b, t, hp, wp, c)


def main():
    rng = np.random.default_rng(0)
    rtt = timed(scan_wrap(lambda c: c + 1.0, 4), jnp.ones((8, 8), DTYPE))
    print(f"rtt {rtt*1e3:.1f} ms")

    for axes in ("THW", "THWTHWTHW"):
        n = len(axes)
        per_block = [make_params(np.random.default_rng(i), C) for i in range(n)]
        stacked = {k: jnp.stack([pb[k] for pb in per_block]) for k in PARAM_KEYS}

        # XLA reference: same math via rearranges + xla_block
        from einops import rearrange

        def xla_chain(c5):
            c = c5
            for i, axis in enumerate(axes):
                pb = per_block[i]
                if axis == "T":
                    y = rearrange(c, "b t h w c -> (b h w) t c")
                    y = xla_block(y, pb, T, HEADS, True)
                    c = rearrange(y, "(b h w) t c -> b t h w c", b=B, h=HP, w=WP)
                elif axis == "H":
                    y = rearrange(c, "b t h w c -> (b t w) h c")
                    y = xla_block(y, pb, HP, HEADS, False)
                    c = rearrange(y, "(b t w) h c -> b t h w c", b=B, t=T, w=WP)
                else:
                    y = rearrange(c, "b t h w c -> (b t h) w c")
                    y = xla_block(y, pb, WP, HEADS, False)
                    c = rearrange(y, "(b t h) w c -> b t h w c", b=B, t=T, h=HP)
            return c

        x5 = jnp.asarray(rng.normal(size=(B, T, HP, WP, C)), DTYPE)
        try:
            got = fused_group(x5, stacked, axes, HEADS)
        except Exception as e:
            print(f"{axes}: COMPILE FAIL {str(e)[:160]}")
            continue
        want = xla_chain(x5)
        err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"{axes}: max|diff| = {err:.4f} (std {float(jnp.std(want)):.3f})")

        dt_f = timed(scan_wrap(lambda c5: fused_group(c5, stacked, axes, HEADS)), x5)
        dt_x = timed(scan_wrap(xla_chain), x5)
        print(
            f"{axes}: xla {(dt_x-rtt)/SCAN*1e3:7.3f} ms   group-fused {(dt_f-rtt)/SCAN*1e3:7.3f} ms"
        )


if __name__ == "__main__":
    main()
