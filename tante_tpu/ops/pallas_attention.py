"""Pallas TPU kernel: fused head-packed attention core.

Companion to ``ops/attention.py:packed_head_attention``: the packing
transposes stay in XLA (Mosaic cannot reshape through the (L, NH) fold —
see docs/PERF.md), but the core

    scores = qp @ kp^T ; block-diag(+causal) mask ; softmax ; @ vp

is fused into one VMEM pass.  The XLA path materializes the (S, P, P)
scores twice in HBM (f32 write + read around the softmax: ~200 MB per
backbone block at the flagship geometry); here scores never leave VMEM.

qp, kp, vp: (S, P, D) with P = num_heads * L (heads folded into the
sequence); grid over S tiles.  All dot_generals batch over dim 0 in both
operands (the one batching layout Mosaic supports).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(l: int, causal: bool, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[:]  # (G, P, D), already scaled by D^-0.5
    k = k_ref[:]
    v = v_ref[:]
    p = q.shape[1]

    dn_qk = (((2,), (2,)), ((0,), (0,)))  # contract D, batch G
    scores = jax.lax.dot_general(q, k, dn_qk, preferred_element_type=jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    mask = (row // l) == (col // l)
    if causal:
        mask = mask & ((row % l) >= (col % l))
    scores = jnp.where(mask[None], scores, -1e30)

    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax)
    weights = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)

    dn_av = (((2,), (1,)), ((0,), (0,)))  # (G,P,P) @ (G,P,D)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, dn_av, preferred_element_type=jnp.float32
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def default_seq_tile(p: int, d: int) -> int:
    """Largest row tile fitting the kernel's VMEM working set in ~10 MB.

    VMEM is ~16 MB/core.  Minor dims pad to (8, 128) tiles, so a (tile, P,
    D=32) bf16 block really occupies tile*P*128*2 bytes; the working set is
    3 double-buffered operands + the f32 (tile, P, P-padded) scores + the
    double-buffered output.
    """

    def pad(n: int, m: int) -> int:
        return (n + m - 1) // m * m

    d_pad = pad(d, 128)
    p_pad = pad(p, 128)
    per_row = (
        3 * 2 * p * d_pad * 2  # q, k, v blocks, double-buffered, bf16
        + p * p_pad * 4  # f32 scores + softmax intermediates
        + 2 * p * d_pad * 2  # output block, double-buffered
    )
    budget = 10 * 2**20
    return max(8, min(256, budget // per_row // 8 * 8))


@functools.partial(
    jax.jit, static_argnames=("l", "causal", "seq_tile", "interpret")
)
def packed_attention_core(
    qp: jnp.ndarray,
    kp: jnp.ndarray,
    vp: jnp.ndarray,
    l: int,
    causal: bool = False,
    seq_tile: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, P, D) head-packed q/k/v (q pre-scaled) -> (S, P, D) attention."""
    s, p, d = qp.shape
    if seq_tile <= 0:
        seq_tile = default_seq_tile(p, d)
    s_p = _round_up(s, seq_tile)
    if s_p != s:
        pad = ((0, s_p - s), (0, 0), (0, 0))
        qp, kp, vp = (jnp.pad(t, pad) for t in (qp, kp, vp))

    grid = (s_p // seq_tile,)
    spec = pl.BlockSpec(
        (seq_tile, p, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, l, causal),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((s_p, p, d), qp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s_p * p * p * d,
            bytes_accessed=2 * 4 * s_p * p * d,
            transcendentals=s_p * p * p,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:s]


def _xla_packed_core(
    qp: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray, l: int, causal: bool
) -> jnp.ndarray:
    """Same math as the kernel in plain XLA (f32 scores + softmax).

    Used (a) off-TPU, (b) as the VJP recompute so the packed attention is
    trainable without a hand-written kernel backward.
    """
    p = qp.shape[1]
    scores = jnp.einsum(
        "spd,sqd->spq", qp, kp, preferred_element_type=jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    mask = (row // l) == (col // l)
    if causal:
        mask = mask & ((row % l) >= (col % l))
    scores = jnp.where(mask[None], scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("spq,sqd->spd", weights.astype(vp.dtype), vp).astype(qp.dtype)


from tante_tpu.ops.backend import on_tpu as _on_tpu  # shared helper


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_attention(
    qp: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray, l: int, causal: bool = False
) -> jnp.ndarray:
    """Differentiable head-packed attention core: Pallas forward on TPU
    (scores never leave VMEM), XLA math elsewhere and for the backward
    pass (recompute-based VJP — exact gradients of the XLA formulation).
    """
    if _on_tpu():
        return packed_attention_core(qp, kp, vp, l, causal=causal)
    return _xla_packed_core(qp, kp, vp, l, causal)


def _packed_attention_fwd(qp, kp, vp, l, causal):
    return packed_attention(qp, kp, vp, l, causal), (qp, kp, vp)


def _packed_attention_bwd(l, causal, res, g):
    qp, kp, vp = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_packed_core(a, b, c, l, causal), qp, kp, vp)
    return vjp(g)


packed_attention.defvjp(_packed_attention_fwd, _packed_attention_bwd)
