"""A/B attention-variant timings at the three TANTE axial layouts.

Each variant is scanned 32x inside one jit (carry-through), probe-synced,
RTT-subtracted — the methodology from docs/PERF.md.

Layouts at bench geometry (B8, latent 4x16x48, C=256, 8 heads x d32):
  T: rows=6144  l=4   (causal)
  H: rows=1536  l=16
  W: rows=512   l=48
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16
HEADS, D = 8, 32
C = HEADS * D
SCAN = 32

LAYOUTS = {
    "T": (6144, 4, True),
    "H": (1536, 16, False),
    "W": (512, 48, False),
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


def scan_wrap(op):
    def fn(x, *rest):
        def body(c, _):
            return op(c, *rest), ()

        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return out

    return fn


# ---- variants: (B, L, H, D) q,k,v -> (B, L, H, D) --------------------------


def packed_f32(q, k, v, causal):
    from tante_tpu.ops.attention import packed_head_attention

    return packed_head_attention(q, k, v, causal=causal)


def packed_bf16sm(q, k, v, causal):
    b, l, h, d = q.shape
    scale = d**-0.5

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(b, h * l, d)

    qp, kp, vp = pack(q * scale), pack(k), pack(v)
    logits = jnp.einsum("bpd,bqd->bpq", qp, kp)
    row = jax.lax.broadcasted_iota(jnp.int32, (h * l, h * l), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h * l, h * l), 1)
    mask = (row // l) == (col // l)
    if causal:
        mask = mask & ((row % l) >= (col % l))
    logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits, axis=-1)  # bf16 softmax
    out = jnp.einsum("bpq,bqd->bpd", weights, vp)
    return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)


def unpacked_f32(q, k, v, causal):
    d = q.shape[-1]
    scale = d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def unpacked_bf16(q, k, v, causal):
    d = q.shape[-1]
    scale = d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def xla_dpa(q, k, v, causal):
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)


def pallas_core(q, k, v, causal):
    from tante_tpu.ops.pallas_attention import packed_attention_core

    b, l, h, d = q.shape

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(b, h * l, d)

    qp, kp, vp = pack(q), pack(k), pack(v)
    out = packed_attention_core(qp, kp, vp, l, causal=causal)
    return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)


VARIANTS = {
    "packed_f32": packed_f32,
    "packed_bf16": packed_bf16sm,
    "unpacked_f32": unpacked_f32,
    "unpacked_bf16": unpacked_bf16,
    "xla_dpa": xla_dpa,
    "pallas_core": pallas_core,
}


def main():
    rng = np.random.default_rng(0)
    rtt = timed(scan_wrap(lambda c: c + 1.0), jnp.ones((8, 8), DTYPE))
    print(f"rtt {rtt*1e3:.1f} ms")

    names = sys.argv[1:] or list(VARIANTS)
    for lname, (rows, l, causal) in LAYOUTS.items():
        q = jnp.asarray(rng.normal(size=(rows, l, HEADS, D)), DTYPE)
        k = jnp.asarray(rng.normal(size=(rows, l, HEADS, D)), DTYPE)
        v = jnp.asarray(rng.normal(size=(rows, l, HEADS, D)), DTYPE)
        for vname in names:
            fn = VARIANTS[vname]
            try:
                # carry is q; k,v fixed (close enough for timing)
                op = lambda c, k=k, v=v, fn=fn, causal=causal: fn(c, k, v, causal)
                dt = timed(scan_wrap(op), q)
                per = (dt - rtt) / SCAN * 1e3
                print(f"{lname} rows={rows:5d} l={l:2d} {vname:13s} {per:7.3f} ms")
            except Exception as e:
                print(f"{lname} {vname}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
