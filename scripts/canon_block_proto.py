"""Prototype: canonical-layout fused block kernels (round 3).

Today's per-block kernel consumes rows pre-rearranged into the attention
axis's token order, so the 9-block chain pays ~9 XLA transposes
(~0.7 ms/call).  Key observation: the kernel does NOT need contiguous
sequences — it already computes a masked sp x sp score matrix over packed
rows.  If rows stay in CANONICAL (t, h, w) order:

- W groups are contiguous (w minor): today's block-diag mask;
- H groups are INTERLEAVED with stride w_b inside a (16*w_b)-row span:
  mask (i % st == j % st) — same dot shapes, same cost, no reorder;
- T groups (l=4, causal) interleave with stride h_b*w_b: either a big-span
  mask, or a roll-based formulation with NO score matrix at all
  (k/v shifted by delta*st rows, per-head segment sums via one (c,8) dot).

Each variant reads/writes rectangular 5-D tiles of the canonical array via
BlockSpec index maps — no XLA transpose, no in-kernel transpose (which is
compile-blocked in Mosaic: >9.5 min for one tile transpose, measured).
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
    _LOG2E,
    BlockParams,
    _gelu_tanh_f32,
    _ln,
    fused_block_apply,
)

B, T, H, W, C = 8, 4, 16, 48, 256
HEADS = 8
D = C // HEADS
DTYPE = jnp.bfloat16
ITERS = 300


def make_params(rng):
    c = C
    arrs = []
    for shape in [
        (c,), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,), (c, c), (c,),
        (c,), (c,), (c, c), (c,), (c, c), (c,),
    ]:
        arrs.append(jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05, DTYPE))
    return BlockParams(*arrs)


def _prescale(params):
    qs = D**-0.5 * _LOG2E
    return params._replace(
        wq=(params.wq.astype(jnp.float32) * qs).astype(params.wq.dtype),
        bq=(params.bq.astype(jnp.float32) * qs).astype(params.bq.dtype),
    )


def _strided_body(x, p, l, heads, sp, causal, stride):
    """Block math on (M, C) rows where attention groups within each
    contiguous sp-row span are interleaved with ``stride`` (stride=None:
    contiguous groups of l).  q arrives prescaled (log2 units)."""
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // heads
    b_att = m_rows // sp
    dn2 = (((1,), (0,)), ((), ()))

    xn = _ln(x, p.ln1_scale, p.ln1_bias)

    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p.wq, p.bq)
    k = proj(p.wk, p.bk)
    v = proj(p.wv, p.bv)

    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    if stride is None:
        mask = (row // l) == (col // l)
        if causal:
            mask = mask & ((row % l) >= (col % l))
    else:
        mask = (row % stride) == (col % stride)
        if causal:
            mask = mask & ((row // stride) >= (col // stride))
    mask_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    clamp = 60.0 * _LOG2E

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    heads_out = []
    for h in range(heads):
        qh = q[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        kh = k[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        vh = v[:, h * d : (h + 1) * d].reshape(b_att, sp, d)
        scores = jax.lax.dot_general(qh, kh, dn_qk, preferred_element_type=jnp.float32)
        unnorm = jax.lax.exp2(jnp.minimum(scores + mask_bias[None], clamp))
        w_un = unnorm.astype(x.dtype)
        recip = 1.0 / jnp.sum(unnorm, axis=-1, keepdims=True)
        ah = jax.lax.dot_general(w_un, vh, dn_av, preferred_element_type=jnp.float32)
        ah = ah * recip
        heads_out.append(ah.astype(x.dtype).reshape(m_rows, d))
    attn = jnp.concatenate(heads_out, axis=1)

    out = jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)
    x = x + (out + p.bo).astype(x.dtype)
    yn = _ln(x, p.ln2_scale, p.ln2_bias)
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
    h2 = jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p.b2).astype(x.dtype)


def _roll_body(x, p, l, heads, causal, stride):
    """T-axis block via rolled k/v: no score matrix.  Rows in canonical
    order with the T axis at ``stride``; causal, l steps."""
    m_rows = x.shape[0]
    c = x.shape[-1]
    d = c // heads
    dn2 = (((1,), (0,)), ((), ()))

    xn = _ln(x, p.ln1_scale, p.ln1_bias)

    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p.wq, p.bq)
    k = proj(p.wk, p.bk)
    v = proj(p.wv, p.bv)

    # Head-segment sum matrix (c, heads) and its transpose broadcaster.
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // d
        == jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    )
    S = seg.astype(jnp.float32)
    St = S.T  # (heads, c)
    t_of_row = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0) // stride
    clamp = 60.0 * _LOG2E

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)  # Mosaic rotate supports 32-bit only
    vf = v.astype(jnp.float32)
    denom = None
    acc = None
    for delta in range(l):
        kd = pltpu.roll(kf, delta * stride, 0) if delta else kf
        vd = pltpu.roll(vf, delta * stride, 0) if delta else vf
        prod = qf * kd  # (m, c)
        s_d = jax.lax.dot_general(prod, S, dn2, preferred_element_type=jnp.float32)
        bias = jnp.where(t_of_row >= delta, 0.0, -1e30)
        e_d = jax.lax.exp2(jnp.minimum(s_d + bias, clamp))  # (m, heads)
        ef = jax.lax.dot_general(e_d, St, dn2, preferred_element_type=jnp.float32)
        term = ef * vd
        denom = e_d if denom is None else denom + e_d
        acc = term if acc is None else acc + term
    rec = jax.lax.dot_general(
        1.0 / denom, St, dn2, preferred_element_type=jnp.float32
    )
    attn = (acc * rec).astype(x.dtype)

    out = jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)
    x = x + (out + p.bo).astype(x.dtype)
    yn = _ln(x, p.ln2_scale, p.ln2_bias)
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
    h2 = jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p.b2).astype(x.dtype)


def canon_block(axis: str, variant: str = "mask", tile: dict | None = None):
    """Canonical-in/canonical-out single-block apply."""
    tile = tile or {}
    if axis == "T":
        t_b = T
        h_b = tile.get("h_b", H)
        w_b = tile.get("w_b", 24 if variant == "roll" else 8)
        st = h_b * w_b
        l, causal = T, True
        sp = T * st  # one span per tile for the mask variant
    elif axis == "H":
        t_b = tile.get("t_b", T)
        h_b = H
        w_b = tile.get("w_b", 8)
        st = w_b
        l, causal = H, False
        sp = H * w_b
    else:
        t_b = tile.get("t_b", T)
        h_b = tile.get("h_b", 8)
        w_b = W
        st = None
        l, causal = W, False
        sp = 96 if W == 48 else W
    rows = t_b * h_b * w_b

    def kern(x_ref, *refs):
        p = BlockParams(*[r[:] for r in refs[:-1]])
        o_ref = refs[-1]
        x = x_ref[0].reshape(rows, C)
        if variant == "roll" and axis == "T":
            y = _roll_body(x, p, l, HEADS, causal, st)
        else:
            y = _strided_body(x, p, l, HEADS, sp, causal, st)
        o_ref[0] = y.reshape(t_b, h_b, w_b, C)

    grid = (B, T // t_b, H // h_b, W // w_b)
    xspec = pl.BlockSpec(
        (1, t_b, h_b, w_b, C),
        lambda b, i, j, kk: (b, i, j, kk, 0),
        memory_space=pltpu.VMEM,
    )

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda *_, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    def apply(x5, params):
        params = _prescale(params)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[xspec] + [wspec(a.shape) for a in params],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x5.shape, x5.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(x5, *params)

    return apply


def today_block(axis):
    """The shipped path: rearrange -> per-block kernel -> rearrange."""

    def apply(x5, params):
        b = x5.shape[0]
        if axis == "T":
            y = x5.transpose(0, 2, 3, 1, 4).reshape(b * H * W, T, C)
            y = fused_block_apply(y, params, T, HEADS, True)
            return y.reshape(b, H, W, T, C).transpose(0, 3, 1, 2, 4)
        if axis == "H":
            y = x5.transpose(0, 1, 3, 2, 4).reshape(b * T * W, H, C)
            y = fused_block_apply(y, params, H, HEADS, False)
            return y.reshape(b, T, W, H, C).transpose(0, 1, 3, 2, 4)
        y = x5.reshape(b * T * H, W, C)
        y = fused_block_apply(y, params, W, HEADS, False)
        return y.reshape(b, T, H, W, C)

    return apply


def time_chain(name, applies, x5, params, n_blocks, iters=ITERS):
    @jax.jit
    def run(x5, params):
        def body(i, y):
            for ap in applies:
                y = ap(y, params)
            return y

        return jax.lax.fori_loop(0, iters, body, x5)

    @jax.jit
    def probe(y):
        return jnp.sum(y[0, 0, 0, :2].astype(jnp.float32))

    t0 = time.perf_counter()
    y = run(x5, params)
    float(probe(y))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x5, params)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    per_block = best / iters / n_blocks * 1e3
    print(f"{name:52s} {per_block:7.4f} ms/block  (compile {compile_s:5.1f}s)", flush=True)
    return per_block


def check(axis, variant, tile, x5, params):
    ref = today_block(axis)(x5, params)
    got = canon_block(axis, variant, tile)(x5, params)
    r32 = ref.astype(jnp.float32)
    g32 = got.astype(jnp.float32)
    err = float(jnp.max(jnp.abs(r32 - g32)))
    mean = float(jnp.mean(jnp.abs(r32 - g32)))
    print(f"canon {axis}/{variant} {tile}: max|err| {err:.3e} mean {mean:.2e}", flush=True)




# ---------------------------------------------------------------------------
# Multi-block kernels on full-element tiles: [T H] and [W T H].
# T rides the roll body (canonical order); the canonical->H-order switch is
# a per-plane (768x768) permutation MATMUL in VMEM (~7 us on the MXU, vs
# two HBM-round-trip XLA transposes); H runs contiguous (l=16, sp=128).
# ---------------------------------------------------------------------------


def _plane_perm(h, w):
    """(h*w, h*w) 0/1 matrix reordering one (h, w) plane to (w, h)."""
    m = h * w
    idx = np.arange(m).reshape(h, w).T.reshape(m)  # new-row -> old-row
    P = np.zeros((m, m), np.float32)
    P[np.arange(m), idx] = 1.0
    return P


def fused_run(axes: str):
    """Canonical-in/out kernel running the given T/H/W axes back to back
    on one full batch element; one BlockParams per axis char."""
    rows = T * H * W
    plane = H * W
    P = jnp.asarray(_plane_perm(H, W), DTYPE)
    Pt = jnp.asarray(_plane_perm(H, W).T, DTYPE)
    n_p = len(axes)

    def kern(x_ref, p_ref, pt_ref, *refs):
        o_ref = refs[-1]
        prefs = refs[:-1]
        x = x_ref[0].reshape(rows, C)
        dn2 = (((1,), (0,)), ((), ()))

        def perm(x, mat):
            xr = x.reshape(T, plane, C)
            outs = [
                jax.lax.dot_general(
                    mat[:], xr[i], dn2, preferred_element_type=jnp.float32
                ).astype(x.dtype)
                for i in range(T)
            ]
            return jnp.concatenate(outs, axis=0)

        order = "c"  # canonical
        for i, axis in enumerate(axes):
            p = BlockParams(*(r[i] for r in prefs))
            if axis == "T":
                assert order == "c"
                x = _roll_body(x, p, T, HEADS, causal=True, stride=plane)
            elif axis == "W":
                assert order == "c"
                x = _strided_body(x, p, W, HEADS, 96, False, None)
            else:  # H: switch to (w, h)-minor order, contiguous groups
                if order == "c":
                    x = perm(x, p_ref)
                    order = "h"
                x = _strided_body(x, p, H, HEADS, 128, False, None)
        if order == "h":
            x = perm(x, pt_ref)
        o_ref[0] = x.reshape(T, H, W, C)

    xspec = pl.BlockSpec(
        (1, T, H, W, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    def apply_run(x5, params_list):
        params_list = [_prescale(p) for p in params_list]
        stacked = [jnp.stack(arrs) for arrs in zip(*params_list)]
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[xspec, wspec(P.shape), wspec(Pt.shape)]
            + [wspec(a.shape) for a in stacked],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x5.shape, x5.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )(x5, P, Pt, *stacked)

    return apply_run




def fused_hw_pair():
    """[H W] pair: one kernel per (b, t) PLANE (flat 2-D tiles, 768 rows).

    In-kernel: perm (h,w)->(w,h) via a 768x768 permutation matmul, H body
    (contiguous l=16, sp=128), perm back, W body (contiguous l=48, sp=96).
    Replaces: 2 XLA transposes around H + one kernel launch + one HBM
    round trip per pair."""
    plane = H * W
    P = jnp.asarray(_plane_perm(H, W), DTYPE)
    Pt = jnp.asarray(_plane_perm(H, W).T, DTYPE)

    def kern(x_ref, p_ref, pt_ref, *refs):
        o_ref = refs[-1]
        prefs = refs[:-1]
        x = x_ref[:]
        dn2 = (((1,), (0,)), ((), ()))

        def perm(v, mat):
            return jax.lax.dot_general(
                mat[:], v, dn2, preferred_element_type=jnp.float32
            ).astype(v.dtype)

        ph = BlockParams(*(r[0] for r in prefs))
        pw = BlockParams(*(r[1] for r in prefs))
        y = perm(x, p_ref)                      # (w, h) order
        y = _strided_body(y, ph, H, HEADS, 128, False, None)
        y = perm(y, pt_ref)                     # back to canonical (h, w)
        y = _strided_body(y, pw, W, HEADS, 96, False, None)
        o_ref[:] = y

    xspec = pl.BlockSpec((plane, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    def apply_pair(x5, params_h, params_w):
        params_h = _prescale(params_h)
        params_w = _prescale(params_w)
        stacked = [jnp.stack(arrs) for arrs in zip(params_h, params_w)]
        b = x5.shape[0]
        x2 = x5.reshape(b * T * plane, C)
        out = pl.pallas_call(
            kern,
            grid=(b * T,),
            in_specs=[xspec, wspec(P.shape), wspec(Pt.shape)]
            + [wspec(a.shape) for a in stacked],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        )(x2, P, Pt, *stacked)
        return out.reshape(x5.shape)

    return apply_pair




def fused_hw_pair2():
    """[H W] pair on TWO-plane tiles (1536 rows, grid 16): per-plane perms
    via two (768,768) dots + sublane concat; bigger tiles restore the MXU
    pipelining the one-plane variant lost."""
    plane = H * W
    P = jnp.asarray(_plane_perm(H, W), DTYPE)
    Pt = jnp.asarray(_plane_perm(H, W).T, DTYPE)
    rows = 2 * plane

    def kern(x_ref, p_ref, pt_ref, *refs):
        o_ref = refs[-1]
        prefs = refs[:-1]
        x = x_ref[:]
        dn2 = (((1,), (0,)), ((), ()))

        def perm(v, mat):
            vr = v.reshape(2, plane, C)
            outs = [
                jax.lax.dot_general(
                    mat[:], vr[i], dn2, preferred_element_type=jnp.float32
                ).astype(v.dtype)
                for i in range(2)
            ]
            return jnp.concatenate(outs, axis=0)

        ph = BlockParams(*(r[0] for r in prefs))
        pw = BlockParams(*(r[1] for r in prefs))
        y = perm(x, p_ref)
        y = _strided_body(y, ph, H, HEADS, 128, False, None)
        y = perm(y, pt_ref)
        y = _strided_body(y, pw, W, HEADS, 96, False, None)
        o_ref[:] = y

    xspec = pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    def apply_pair(x5, params_h, params_w):
        params_h = _prescale(params_h)
        params_w = _prescale(params_w)
        stacked = [jnp.stack(arrs) for arrs in zip(params_h, params_w)]
        b = x5.shape[0]
        x2 = x5.reshape(b * T * plane, C)
        out = pl.pallas_call(
            kern,
            grid=(b * T * plane // rows,),
            in_specs=[xspec, wspec(P.shape), wspec(Pt.shape)]
            + [wspec(a.shape) for a in stacked],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        )(x2, P, Pt, *stacked)
        return out.reshape(x5.shape)

    return apply_pair


def fused_wt_pair():
    """[W T] pair, perm-free: full-element flat tiles (3072 rows, grid 8),
    W strided-contiguous body then the T roll body."""
    rows = T * H * W

    def kern(x_ref, *refs):
        o_ref = refs[-1]
        prefs = refs[:-1]
        x = x_ref[:]
        pw = BlockParams(*(r[0] for r in prefs))
        pt = BlockParams(*(r[1] for r in prefs))
        y = _strided_body(x, pw, W, HEADS, 96, False, None)
        y = _roll_body(y, pt, T, HEADS, causal=True, stride=H * W)
        o_ref[:] = y

    xspec = pl.BlockSpec((rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    def apply_pair(x5, params_w, params_t):
        params_w = _prescale(params_w)
        params_t = _prescale(params_t)
        stacked = [jnp.stack(arrs) for arrs in zip(params_w, params_t)]
        b = x5.shape[0]
        x2 = x5.reshape(b * rows, C)
        out = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[xspec] + [wspec(a.shape) for a in stacked],
            out_specs=xspec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(x2, *stacked)
        return out.reshape(x5.shape)

    return apply_pair


def run_fused_chain(which, x5, params):
    import time as _t

    if "pairHW" in which:
        ap = fused_hw_pair()
        ref = today_block("W")(today_block("H")(x5, params), params)
        got = ap(x5, params, params)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"fused [HW] max|err| {err:.3e}", flush=True)
        time_chain("fused [HW] (flat planes, grid 32)",
                   [lambda y, pp: ap(y, pp, pp)], x5, params, 2, iters=150)
    if "chainE" in which:
        ap = fused_hw_pair()
        tb = canon_block("T", "roll", {"h_b": 16, "w_b": 48})
        chain = [tb, lambda y, pp: ap(y, pp, pp)] * 3
        time_chain("chainE: [canonT][HW-pair] x3 (6 launches)", chain, x5, params, 9, iters=100)
    if "pairHW2" in which:
        ap = fused_hw_pair2()
        ref = today_block("W")(today_block("H")(x5, params), params)
        got = ap(x5, params, params)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"fused [HW2] max|err| {err:.3e}", flush=True)
        time_chain("fused [HW] (2-plane tiles, grid 16)",
                   [lambda y, pp: ap(y, pp, pp)], x5, params, 2, iters=150)
    if "pairWT" in which:
        ap = fused_wt_pair()
        ref = today_block("T")(today_block("W")(x5, params), params)
        got = ap(x5, params, params)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"fused [WT] max|err| {err:.3e}", flush=True)
        time_chain("fused [WT] (full-elem flat, grid 8)",
                   [lambda y, pp: ap(y, pp, pp)], x5, params, 2, iters=150)
    if "pairTH" in which:
        ap = fused_run("TH")
        ref = today_block("H")(today_block("T")(x5, params), params)
        got = ap(x5, [params, params])
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"fused [TH] max|err| {err:.3e}", flush=True)
        time_chain("fused [TH] (2 blocks, grid 8)", 
                   [lambda y, pp: ap(y, [pp, pp])], x5, params, 2, iters=150)
    if "tripleWTH" in which:
        ap = fused_run("WTH")
        ref = today_block("H")(today_block("T")(today_block("W")(x5, params), params), params)
        got = ap(x5, [params, params, params])
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        print(f"fused [WTH] max|err| {err:.3e}", flush=True)
        time_chain("fused [WTH] (3 blocks, grid 8)",
                   [lambda y, pp: ap(y, [pp, pp, pp])], x5, params, 3, iters=100)
    if "chainD" in which:
        th = fused_run("TH")
        wth = fused_run("WTH")
        chain = [
            lambda y, pp: th(y, [pp, pp]),
            lambda y, pp: wth(y, [pp, pp, pp]),
            lambda y, pp: wth(y, [pp, pp, pp]),
            today_block("W"),
        ]
        time_chain("chainD: [TH][WTH][WTH][W] (4 launches)", chain, x5, params, 9, iters=100)


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x5 = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(np.float32) * 0.1, DTYPE)

    which = set(sys.argv[1:]) or {"today", "T", "H", "W", "chain"}

    if "T" in which:
        check("T", "roll", {"h_b": 16, "w_b": 24}, x5, params)
        time_chain("canon T roll (16x24; rows 1536, grid 16)",
                   [canon_block("T", "roll", {"h_b": 16, "w_b": 24})], x5, params, 1)
        time_chain("canon T roll (16x16; rows 1024, grid 24)",
                   [canon_block("T", "roll", {"h_b": 16, "w_b": 16})], x5, params, 1)
        check("T", "mask", {"h_b": 4, "w_b": 8}, x5, params)
        time_chain("canon T mask (4x8; rows 128, grid 192)",
                   [canon_block("T", "mask", {"h_b": 4, "w_b": 8})], x5, params, 1)
    if "H" in which:
        check("H", "mask", {"t_b": 4, "w_b": 8}, x5, params)
        time_chain("canon H mask (t4,w8; rows 512, grid 48)",
                   [canon_block("H", "mask", {"t_b": 4, "w_b": 8})], x5, params, 1)
        time_chain("canon H mask (t2,w8; rows 256, grid 96)",
                   [canon_block("H", "mask", {"t_b": 2, "w_b": 8})], x5, params, 1)
    if "W" in which:
        check("W", "mask", {"t_b": 4, "h_b": 8}, x5, params)
        time_chain("canon W mask (t4,h8; rows 1536, grid 16)",
                   [canon_block("W", "mask", {"t_b": 4, "h_b": 8})], x5, params, 1)
        time_chain("canon W mask (t2,h8; rows 768, grid 32)",
                   [canon_block("W", "mask", {"t_b": 2, "h_b": 8})], x5, params, 1)
    if "W2" in which:
        time_chain("canon W mask (t1,h16: full plane, contiguous, grid 32)",
                   [canon_block("W", "mask", {"t_b": 1, "h_b": 16})], x5, params, 1)
        time_chain("canon W mask (t2,h16; rows 1536, grid 16)",
                   [canon_block("W", "mask", {"t_b": 2, "h_b": 16})], x5, params, 1)
    if "T2" in which:
        time_chain("canon T roll (16x48: full elem, contiguous, grid 8)",
                   [canon_block("T", "roll", {"h_b": 16, "w_b": 48})], x5, params, 1)
        time_chain("canon T roll (8x48; rows 1536 contiguous-h? grid 16)",
                   [canon_block("T", "roll", {"h_b": 8, "w_b": 48})], x5, params, 1)
    if "H2" in which:
        time_chain("canon H mask (t4,w16; rows 1024, sp 256, grid 24)",
                   [canon_block("H", "mask", {"t_b": 4, "w_b": 16})], x5, params, 1)

    if "today" in which:
        chain = [today_block(a) for a in "THWTHWTHW"]
        time_chain("today: 9x (rearrange + kernel)", chain, x5, params, 9, iters=100)

    run_fused_chain(which, x5, params)

    if "chainB" in which:
        chain = []
        for a in "THWTHWTHW":
            if a == "T":
                chain.append(canon_block("T", "roll", {"h_b": 16, "w_b": 48}))
            else:
                chain.append(today_block(a))
        time_chain("chainB: canonT-roll + rearrange H + flat W", chain, x5, params, 9, iters=100)
    if "chainC" in which:
        chain = []
        for a in "THWTHWTHW":
            if a == "T":
                chain.append(canon_block("T", "roll", {"h_b": 16, "w_b": 48}))
            elif a == "H":
                chain.append(canon_block("H", "mask", {"t_b": 4, "w_b": 8}))
            else:
                chain.append(today_block(a))
        time_chain("chainC: canonT-roll + canonH + flat W", chain, x5, params, 9, iters=100)
    if "chain" in which:
        chain = []
        for a in "THWTHWTHW":
            if a == "T":
                chain.append(canon_block("T", "roll", {"h_b": 16, "w_b": 24}))
            elif a == "H":
                chain.append(canon_block("H", "mask", {"t_b": 4, "w_b": 8}))
            else:
                chain.append(canon_block("W", "mask", {"t_b": 4, "h_b": 8}))
        time_chain("canon 9-chain (no XLA transposes)", chain, x5, params, 9, iters=100)


if __name__ == "__main__":
    main()
