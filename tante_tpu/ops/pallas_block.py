"""Fused axial transformer block: one Pallas TPU kernel per block.

The TANTE backbone spends ~84% of a forward call in its 9 axial
transformer blocks, and XLA's lowering of each block makes ~14 HBM
round-trips of the (rows, L, C) activation (measured ~0.62 ms/block at the
flagship geometry while the matmul lower bound is ~0.11 ms).  This kernel
computes the whole pre-LN block

    ln1 -> qkv -> per-head attention (f32 scores+softmax in VMEM) ->
    out-proj -> +residual -> ln2 -> MLP (tanh-GELU) -> +residual

in one VMEM pass per row tile: ~0.29-0.31 ms/block, 9-block chain 3.9 ms
vs 7.9 ms in XLA (docs/PERF.md round 2).

Mosaic shape-op constraints that shaped the design (probed on v5e):
- lane splits ((M, C) -> (M, H, D)) are UNSUPPORTED -> heads are handled
  by lane-slicing (M, D) views out of q/k/v;
- sublane reshapes ((M, C) <-> (M/S, S, C)) are supported -> each head's
  slice reshapes to (B', S', D) for the batched score/AV dot_generals;
- concat of offset-carrying slices is unsupported, but the head outputs
  reshape back to offset-0 (M, D) and lane-concat into (M, C);
- `seq_pack` packs several short sequences into one score matrix with a
  block-diagonal mask so S' stays 32-48 even for the T axis (L=4).

Gradients: `fused_block_apply` carries a custom VJP that recomputes the
block in plain XLA math (`_xla_block`) — exact gradients of the same
formulation, no hand-written kernel backward.  Off-TPU (tests, the
multi-chip CPU dryrun) the forward also uses `_xla_block`.

Reference being accelerated: models/attn_backbone.py:38-83 (TransformerBlock)
driven by the rollout hot loop trainer/trainer.py:144-159.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BlockParams(NamedTuple):
    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    wq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


# Tuning knobs (chain-level A/B on v5e, scripts/ab_block_tuning.py):
#  - row_tile: None = default_row_tile heuristic.  A divisor of the row
#    count avoids the XLA pad+slice around every kernel call.
#  - softmax: "fast" (default) = additive-bias mask, no max-subtract,
#    scores clamped at +60 before exp — mathematically identical whenever
#    scores < 60 (exp stays finite), and the clamp keeps adversarial
#    activations from producing inf/inf = NaN.  "safe" = masked f32 softmax
#    with max-subtraction (bitwise the _xla_block formulation).  Measured:
#    fast is ~0.45 ms/call faster at the flagship geometry (8%), and its
#    on-chip numerics vs XLA are asserted in tests/test_pallas_tpu.py.
_TUNE = {
    "row_tile": int(os.environ["TANTE_BLOCK_ROW_TILE"])
    if os.environ.get("TANTE_BLOCK_ROW_TILE")
    else None,
    "softmax": os.environ.get("TANTE_BLOCK_SOFTMAX", "fast"),
}


def set_block_tuning(row_tile: int | None = None, softmax: str | None = None):
    """Override kernel tuning at runtime (takes effect on next trace)."""
    if row_tile is not None:
        _TUNE["row_tile"] = row_tile or None
    if softmax is not None:
        assert softmax in ("safe", "fast"), softmax
        _TUNE["softmax"] = softmax


def _ln(x, scale, bias, eps=1e-5):
    # One-pass moments (E[x^2] - mu^2) instead of the two-reduction
    # E[(x - mu)^2] form: one fewer f32 cross-lane reduction sweep per LN
    # (~15 us/block at the flagship geometry).  Safe here: LN inputs are
    # O(1) activations, so the cancellation error is ~f32 eps — and the
    # same function feeds both the kernel and the XLA fallback/VJP, so
    # kernel-vs-XLA equivalence is unchanged by construction.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _gelu_tanh_f32(h):
    return 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h**3)))


def _kernel(
    l: int,
    heads: int,
    seq_pack: int,
    causal: bool,
    x_ref,
    *refs,
):
    p = BlockParams(*[r[:] for r in refs[:-1]])
    o_ref = refs[-1]
    o_ref[:] = _kernel_body(x_ref[:], p, l, heads, seq_pack, causal, q_prescaled=True)


def default_seq_pack(l: int) -> int:
    """Pack short sequences so the score matrix is ~128 wide — full MXU
    column width.  Re-swept on v5e under bf16 activations (round 3,
    scripts/profile_block_kernel.py): sp=128 runs 0.320 ms/block vs 0.348
    at the old sp=32 target (which had been tuned in the f32-promotion
    era)."""
    return max(1, 128 // l) if l < 128 else 1


def default_row_tile(c: int, sp: int) -> int:
    """Row-tile heuristic, re-swept under bf16 (round 3): bigger tiles won
    at every seq_pack (rt=2048 beat 1024/512 across the sweep) — the VMEM
    working set halved when the f32 promotion was fixed, so the old ~940
    optimum is stale.  Scale inversely with channel width past 256."""
    per_m_row = 6 * max(c, 128) * 2 + max(sp, 128) * 2
    budget = 7 * 2**20
    return max(sp, min(4096, budget // per_m_row // sp * sp))


def _pallas_block(x2, params: BlockParams, l, heads, causal, seq_pack, row_tile):
    m_total, c = x2.shape
    # Fold the attention scale AND log2(e) into wq/bq (one (c, c) elementwise
    # op per kernel LAUNCH, not per row tile): the kernel then skips the
    # per-element q scale and uses the native exp2 in the softmax.
    qs = (c // heads) ** -0.5 * _LOG2E
    params = params._replace(
        wq=(params.wq.astype(jnp.float32) * qs).astype(params.wq.dtype),
        bq=(params.bq.astype(jnp.float32) * qs).astype(params.bq.dtype),
    )
    m_pad = (m_total + row_tile - 1) // row_tile * row_tile
    if m_pad != m_total:
        x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
    grid = (m_pad // row_tile,)
    xspec = pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_kernel, l, heads, seq_pack, causal),
        grid=grid,
        in_specs=[xspec] + [wspec(a.shape) for a in params],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x2.dtype),
        # The round-3 tiles (row_tile 2048, sp 128) put the double-buffered
        # working set just over Mosaic's 16 MB default scoped-VMEM limit
        # (18.5 MB measured); v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
    )(x2, *params)
    return out[:m_total]


def _xla_block(x, params: BlockParams, l: int, heads: int, causal: bool):
    """Identical block math in plain XLA (used off-TPU and for the VJP)."""
    p = params
    c = x.shape[-1]
    d = c // heads
    xn = _ln(x, p.ln1_scale, p.ln1_bias)
    q = ((xn @ p.wq.astype(x.dtype)) + p.bq.astype(x.dtype)) * (d**-0.5)
    k = (xn @ p.wk.astype(x.dtype)) + p.bk.astype(x.dtype)
    v = (xn @ p.wv.astype(x.dtype)) + p.bv.astype(x.dtype)

    def split(t):
        return t.reshape(*t.shape[:-1], heads, d)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32)
    if causal:
        m = jnp.tril(jnp.ones((l, l), dtype=bool))
        logits = jnp.where(m, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(*x.shape)
    x = x + (attn @ p.wo.astype(x.dtype)) + p.bo.astype(x.dtype)
    yn = _ln(x, p.ln2_scale, p.ln2_bias)
    h1 = ((yn @ p.w1.astype(x.dtype)) + p.b1.astype(x.dtype)).astype(jnp.float32)
    h1 = _gelu_tanh_f32(h1).astype(x.dtype)
    return x + (h1 @ p.w2.astype(x.dtype)) + p.b2.astype(x.dtype)


from tante_tpu.ops.backend import on_tpu as _on_tpu  # shared helper


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_block_apply(
    x: jnp.ndarray, params: BlockParams, l: int, heads: int, causal: bool
) -> jnp.ndarray:
    """(rows, L, C) -> (rows, L, C) full transformer block.

    Pallas kernel on a single-device TPU, XLA math elsewhere; gradients via
    XLA recompute.
    """
    if _on_tpu():
        s, l_, c = x.shape
        sp_factor, row_tile = _tile_plan(s, l, c)
        x2 = x.reshape(s * l, c)
        out = _pallas_block(x2, params, l, heads, causal, sp_factor, row_tile)
        return out.reshape(s, l, c)
    return _xla_block(x, params, l, heads, causal)


def _tile_plan(s: int, l: int, c: int) -> tuple[int, int]:
    """(seq_pack factor, row tile) for an (s, l, c) block input — the
    heuristics + divisor snapping shared by the fused kernel and its
    tensor-parallel halves."""
    sp_factor = default_seq_pack(l)
    # the packed batch must divide evenly; shrink the pack if not
    while (s * l) % (sp_factor * l) != 0:
        sp_factor //= 2
    sp = sp_factor * l
    if _TUNE["row_tile"]:
        # keep the packed-sequence divisibility invariant
        row_tile = max(sp, _TUNE["row_tile"] // sp * sp)
    else:
        row_tile = default_row_tile(c, sp)
        # Snap to a divisor of the row count when one is close: avoids
        # the XLA pad+slice copies around every kernel call (2 extra
        # HBM passes of the activation).
        m_rows = s * l
        if m_rows % row_tile:
            for cand in (2048, 1536, 1024, 768, 512):
                if cand % sp == 0 and m_rows % cand == 0 and cand <= 2 * row_tile:
                    row_tile = cand
                    break
    return sp_factor, row_tile


def _fwd(x, params, l, heads, causal):
    return fused_block_apply(x, params, l, heads, causal), (x, params)


def _bwd(l, heads, causal, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda a, p: _xla_block(a, p, l, heads, causal), x, params)
    return vjp(g)


fused_block_apply.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Canonical-layout T-axis block: the whole block on (B, T, H, W, C) tensors
# with NO rearrange/transpose on either side.
#
# The T axis is short (in_T, typically 4) and causal.  Instead of packing
# T-sequences into a masked score matrix (which first requires an XLA
# transpose to (b h w) t order — ~2 HBM round-trips per T block at the
# flagship geometry), the kernel takes one FULL batch element
# (T*H*W, C) as its tile (a fully contiguous HBM slice) and computes
# causal attention by ROLLING k/v down by delta * (H*W) rows for
# delta = 0..T-1: row i's delta-step-back key lives exactly H*W*delta rows
# above it in canonical order.  Per-head score reduction and the
# head-broadcast both ride tiny (C, heads) matmuls, so no (sp, sp) score
# matrix is materialized at all.  Measured (scripts/canon_block_proto.py,
# v5e): 0.299 ms/block vs 0.334 for the packed kernel BEFORE its two
# layout transposes; the 9-block THWTHWTHW chain drops 3.21 -> 2.70 ms.
# ---------------------------------------------------------------------------


def _roll_body(x, p, l, heads, stride):
    """Causal T-attention block on (M, C) canonical rows via rolled k/v.

    ``stride`` = rows per time step (H*W); q arrives prescaled (log2
    units, see ``_kernel_body``).  Mosaic's rotate supports 32-bit lanes
    only, so k/v roll as f32 (they are consumed in f32 immediately).
    """
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

    # (C, heads) head-segment indicator: one matmul sums each head's lane
    # segment (scores), its transpose broadcasts per-head scalars back.
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // d
        == jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    )
    S = seg.astype(jnp.float32)
    St = S.T
    t_of_row = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0) // stride
    clamp = 60.0 * _LOG2E

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    denom = None
    acc = None
    from jax.experimental.pallas import tpu as _pltpu

    for delta in range(l):
        kd = _pltpu.roll(kf, delta * stride, 0) if delta else kf
        vd = _pltpu.roll(vf, delta * stride, 0) if delta else vf
        s_d = jax.lax.dot_general(qf * kd, S, dn2, preferred_element_type=jnp.float32)
        bias = jnp.where(t_of_row >= delta, 0.0, -1e30)
        e_d = jax.lax.exp2(jnp.minimum(s_d + bias, clamp))  # (M, heads)
        ef = jax.lax.dot_general(e_d, St, dn2, preferred_element_type=jnp.float32)
        term = ef * vd
        denom = e_d if denom is None else denom + e_d
        acc = term if acc is None else acc + term
    # +1e-30: all-underflow guard, bitwise invisible for normal denominators
    # (see _kernel_body's softmax note).
    rec = jax.lax.dot_general(
        1.0 / (denom + 1e-30), St, dn2, preferred_element_type=jnp.float32
    )
    attn = (acc * rec).astype(x.dtype)

    out = jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)
    x = x + (out + p.bo).astype(x.dtype)
    yn = _ln(x, p.ln2_scale, p.ln2_bias)
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    h1 = _gelu_tanh_f32(h1 + p.b1).astype(x.dtype)
    h2 = jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)
    return x + (h2 + p.b2).astype(x.dtype)


def canon_t_supported(t: int, h: int, w: int, c: int, heads: int):
    """Geometry gate for the canonical T-block kernel."""
    if os.environ.get("TANTE_CANON_T", "1") != "1":
        return False
    # The roll kernel only implements the fast (exp2, no-max-sub) softmax;
    # honor the TANTE_BLOCK_SOFTMAX=safe escape hatch by falling back to
    # the packed kernel, which has both variants.
    if _TUNE["softmax"] != "fast":
        return False
    if t < 2 or t > 8 or c % heads or c % 128:
        return False
    m = t * h * w
    # VMEM estimate is dtype-independent: q/k/v, their rolled copies and
    # the accumulators are f32 by construction (pltpu.roll is 32-bit only)
    # — ~8 f32 M x C buffers regardless of the activation dtype.
    return m * c * 4 * 8 <= 44 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_block_canon_t(x5, params, heads: int):
    """(B, T, H, W, C) -> same: one causal T-axis transformer block applied
    directly on the canonical tensor (no rearrange on either side).

    Pallas roll-kernel on TPU; identical XLA math (transpose + `_xla_block`
    + transpose back) elsewhere and for gradients.
    """
    b, t, h, w, c = x5.shape
    if not _on_tpu():
        return _canon_t_ref(x5, params, heads)

    qs = (c // heads) ** -0.5 * _LOG2E
    params = params._replace(
        wq=(params.wq.astype(jnp.float32) * qs).astype(params.wq.dtype),
        bq=(params.bq.astype(jnp.float32) * qs).astype(params.bq.dtype),
    )
    rows = t * h * w

    def kern(x_ref, *refs):
        p = BlockParams(*[r[:] for r in refs[:-1]])
        o_ref = refs[-1]
        y = _roll_body(x_ref[0].reshape(rows, c), p, t, heads, h * w)
        o_ref[0] = y.reshape(t, h, w, c)

    xspec = pl.BlockSpec(
        (1, t, h, w, c), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[xspec] + [wspec(a.shape) for a in params],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x5.shape, x5.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x5, *params)


def _canon_t_ref(x5, params, heads):
    """Shared XLA reference for the canon-T kernel: off-TPU forward AND the
    VJP recompute use this single definition, so the layout convention can
    never drift between them."""
    b, t, h, w, c = x5.shape
    y = x5.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
    y = _xla_block(y, params, t, heads, True)
    return y.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


def _canon_t_fwd(x5, params, heads):
    return fused_block_canon_t(x5, params, heads), (x5, params)


def _canon_t_bwd(heads, res, g):
    x5, params = res
    _, vjp = jax.vjp(lambda a, p: _canon_t_ref(a, p, heads), x5, params)
    return vjp(g)


fused_block_canon_t.defvjp(_canon_t_fwd, _canon_t_bwd)


# ---------------------------------------------------------------------------
# Group fusion: a whole T/H/W axial block chain in ONE kernel per batch item.
#
# The per-block kernel still pays an HBM round-trip (plus an XLA transpose)
# between consecutive blocks whose attention axes differ.  For chains over
# the T/H/W axes the activation of a single batch element (T*H*W, C) fits
# comfortably in VMEM, so one kernel instance can run every block back to
# back, re-ordering tokens with in-VMEM transposes (probed supported by
# Mosaic for sublane-dim permutations).  Grid = batch; weights stay resident
# across grid steps.
# ---------------------------------------------------------------------------

# Token orders that make each attention axis contiguous; canonical (t, h, w).
_ORDER = {"T": ("h", "w", "t"), "H": ("t", "w", "h"), "W": ("t", "h", "w")}


def _perm_between(cur, dst):
    return tuple(cur.index(a) for a in dst) + (3,)


def fitted_seq_pack(m: int, l: int, target: int = 32) -> int:
    """Largest seq_pack packing sequences of length ``l`` into ~``target``
    rows such that the packed rows divide ``m`` evenly."""
    sp = max(1, target // l) if l < target else 1
    while sp > 1 and m % (sp * l):
        sp -= 1
    return sp


def _layout_plan(axes: str, dims, start=("t", "h", "w"), stop=("t", "h", "w")):
    """Static plan for the group/chain kernels: per block, which row
    permutation (as a new->old index vector) re-orders tokens so the
    attention axis is contiguous, plus the final permutation to ``stop``.

    ``start`` is the token order the input ALREADY has (canonical for the
    whole-model group kernel; the first block's own order for sub-chain
    fusion, where the XLA rearrange outside the kernel pays that cost once).

    Returns (perm_ids, final_id, perms) where perm_ids[i] indexes ``perms``
    (or is None), and perms are distinct permutation index vectors.
    """
    import numpy as np

    t, h, w = dims
    sizes = {"t": t, "h": h, "w": w}
    m = t * h * w

    def perm_indices(cur, dst):
        # new-row -> old-row: old rows laid out in ``cur`` order, viewed as
        # the (cur..) tensor and transposed into ``dst`` order.
        shape = tuple(sizes[a] for a in cur)
        return (
            np.arange(m)
            .reshape(shape)
            .transpose(tuple(cur.index(a) for a in dst))
            .reshape(m)
        )

    perms, keys = [], {}

    def intern(cur, dst):
        key = (cur, dst)
        if key not in keys:
            keys[key] = len(perms)
            perms.append(perm_indices(cur, dst))
        return keys[key]

    perm_ids = []
    cur = tuple(start)
    for axis in axes:
        dst = _ORDER[axis]
        perm_ids.append(None if dst == cur else intern(cur, dst))
        cur = dst
    final_id = None if cur == tuple(stop) else intern(cur, tuple(stop))
    return perm_ids, final_id, perms


def _group_kernel(axes, heads, dims, perm_ids, final_id, n_perms, x_ref, *refs):
    prefs = refs[:n_perms]  # permutation matrices (M, M)
    brefs = refs[n_perms:-1]  # 16 stacked arrays, each (n_blocks, ...)
    o_ref = refs[-1]
    x = x_ref[:]  # (T*H*W, C) canonical, one batch element
    seq = {"T": dims[0], "H": dims[1], "W": dims[2]}
    dn = (((1,), (0,)), ((), ()))

    def permute(x, pid):
        # Token re-order as a permutation MATMUL: rides the MXU and keeps
        # Mosaic compile time sane (~30 s vs ~200 s per in-kernel 4-D
        # transpose, measured on the axon remote compiler); exact for 0/1
        # weights (each output row copies one input row).
        y = jax.lax.dot_general(
            prefs[pid][:], x, dn, preferred_element_type=jnp.float32
        )
        return y.astype(x.dtype)

    for i, axis in enumerate(axes):
        if perm_ids[i] is not None:
            x = permute(x, perm_ids[i])
        p = BlockParams(*(r[i] for r in brefs))
        l = seq[axis]
        m = x.shape[0]
        x = _kernel_body(x, p, l, heads, fitted_seq_pack(m, l), axis == "T")
    if final_id is not None:
        x = permute(x, final_id)
    o_ref[:] = x


_LOG2E = 1.4426950408889634


def _attn_half_body(x, p, l, heads, seq_pack, causal, q_prescaled=False):
    """LN1 + qkv + per-head attention + out-projection DOT on an (M, C)
    VMEM tensor; returns the f32 partial ``(M, wo.shape[-1])`` BEFORE the
    ``bo`` bias / residual add (the caller owns those — under tensor
    parallelism a psum sits between).

    ``p`` may be a tensor-parallel shard: the attention width is taken from
    ``wq.shape[-1]`` (= C/tp lanes projected from full-C tokens) and
    ``heads`` is the LOCAL head count; see ``fused_block_apply_tp``.

    ``q_prescaled``: the caller already folded ``d**-0.5 * log2(e)`` into
    ``wq``/``bq`` (see ``_pallas_block``), so scores arrive in log2 units —
    the softmax exp becomes the native ``exp2`` and the per-q-element scale
    multiply disappears.  Mathematically identical: softmax(s) ==
    2^(s*log2e) / sum(2^(s*log2e)).
    """
    m_rows = x.shape[0]
    c_att = p.wq.shape[-1]
    d = c_att // heads
    sp = seq_pack * l
    b_att = m_rows // sp

    xn = _ln(x, p.ln1_scale, p.ln1_bias)
    dn2 = (((1,), (0,)), ((), ()))

    # NOTE: a fused (C, 3C) qkv projection dot was tried and REJECTED:
    # Mosaic cannot reshape lane slices taken past the first 128-lane tile
    # of the (M, 3C) result ("Input offsets outside of the first tile").
    def proj(w, b):
        y = jax.lax.dot_general(xn, w, dn2, preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    q = proj(p.wq, p.bq)
    if not q_prescaled:
        q = q * (d**-0.5)
    k = proj(p.wk, p.bk)
    v = proj(p.wv, p.bv)

    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = (row // l) == (col // l)
    if causal:
        mask = mask & ((row % l) >= (col % l))
    fast_softmax = _TUNE["softmax"] == "fast"
    if fast_softmax:
        mask_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    # Clamp keeping exp finite: e^60 in natural units, 2^86.56 in log2 units.
    exp_fn, clamp = (
        (jax.lax.exp2, 60.0 * _LOG2E) if q_prescaled else (jnp.exp, 60.0)
    )

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_av = (((2,), (1,)), ((0,), (0,)))
    # One sublane reshape per tensor (instead of one per head-slice): heads
    # are then plain lane slices of the 3-D views.
    q3 = q.reshape(b_att, sp, c_att)
    k3 = k.reshape(b_att, sp, c_att)
    v3 = v.reshape(b_att, sp, c_att)
    heads_out = []
    for h in range(heads):
        qh = q3[:, :, h * d : (h + 1) * d]
        kh = k3[:, :, h * d : (h + 1) * d]
        vh = v3[:, :, h * d : (h + 1) * d]
        scores = jax.lax.dot_general(qh, kh, dn_qk, preferred_element_type=jnp.float32)
        if fast_softmax:
            unnorm = exp_fn(jnp.minimum(scores + mask_bias[None], clamp))
        else:
            scores = jnp.where(mask[None], scores, -1e30)
            smax = jnp.max(scores, axis=-1, keepdims=True)
            unnorm = exp_fn(scores - smax)
        # Normalize AFTER the AV matmul: the divide shrinks from (sp, sp) to
        # (sp, d) — 4x fewer elements at d=32 — and becomes one reciprocal +
        # broadcast multiply.  Same math: (U/r) @ V == (U @ V) / r row-wise.
        # The +1e-30 is bitwise invisible whenever the denominator is normal
        # (f32 addition absorbs it above ~1e-23) and guards the
        # all-underflow row (every in-mask score < ~-87 nats -> denom 0 ->
        # recip inf -> 0*inf NaN in the fast-softmax path); the degenerate
        # row then outputs 0 attention instead of NaN.
        w_un = unnorm.astype(x.dtype)
        recip = 1.0 / (jnp.sum(unnorm, axis=-1, keepdims=True) + 1e-30)
        ah = jax.lax.dot_general(w_un, vh, dn_av, preferred_element_type=jnp.float32)
        ah = ah * recip
        heads_out.append(ah.astype(x.dtype))  # (b_att, sp, d)
    attn = jnp.concatenate(heads_out, axis=2).reshape(m_rows, c_att)

    return jax.lax.dot_general(attn, p.wo, dn2, preferred_element_type=jnp.float32)


def _mlp_half_body(x2, p):
    """LN2 + fc1 + tanh-GELU + fc2 DOT on an (M, C) VMEM tensor; returns
    the f32 partial ``(M, w2.shape[-1])`` BEFORE the ``b2`` bias / residual
    add.  ``p`` may be a tensor-parallel shard of the hidden dim (``w1``
    column- and ``w2`` row-sharded; ``b1`` sharded with the hidden dim)."""
    dn2 = (((1,), (0,)), ((), ()))
    yn = _ln(x2, p.ln2_scale, p.ln2_bias)
    h1 = jax.lax.dot_general(yn, p.w1, dn2, preferred_element_type=jnp.float32)
    h1 = _gelu_tanh_f32(h1 + p.b1).astype(x2.dtype)
    return jax.lax.dot_general(h1, p.w2, dn2, preferred_element_type=jnp.float32)


def _kernel_body(x, p, l, heads, seq_pack, causal, q_prescaled=False):
    """One block's math on an (M, C) VMEM tensor. Same formulation as
    ``_kernel``; returns the block output.  Composes the two halves the
    tensor-parallel path runs as separate kernels — bitwise the pre-split
    formulation (the halves return the pre-bias f32 dots and the residual
    adds here are unchanged)."""
    out = _attn_half_body(x, p, l, heads, seq_pack, causal, q_prescaled)
    x = x + (out + p.bo).astype(x.dtype)
    h2 = _mlp_half_body(x, p)
    return x + (h2 + p.b2).astype(x.dtype)


# ---------------------------------------------------------------------------
# Tensor-parallel fused block: the Megatron split of the SAME kernel.
#
# Under tp the block factors naturally into its two halves around the two
# all-reduces the Megatron layout requires (parallel/sharding.py): each
# device runs (a) LN1 + its local qkv head shard + attention + the
# out-projection partial dot, psum; (b) LN2 + its local MLP hidden shard +
# the fc2 partial dot, psum.  Both halves run as Pallas kernels on the
# device-local shapes — tp no longer forfeits the fused kernel (the round-2
# design cloned ``fused_blocks=False`` under tp, a measured ~2.9x
# single-chip backbone loss, docs/PERF.md).  The psums ride ICI at the XLA
# level between the two kernel launches; the comm pattern stays the asserted
# 2 all-reduces per block (tests/test_parallel.py::test_tp_collective_pattern).
#
# Reference counterpart: the reference has no tensor parallelism at all
# (its DDP is data-parallel only, trainer/trainer.py:60-98); this is the
# TPU-native extension of its block math to sharded execution.
# ---------------------------------------------------------------------------


class AttnHalfParams(NamedTuple):
    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    wq: jnp.ndarray
    bq: jnp.ndarray
    wk: jnp.ndarray
    bk: jnp.ndarray
    wv: jnp.ndarray
    bv: jnp.ndarray
    wo: jnp.ndarray


class MlpHalfParams(NamedTuple):
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray


def _attn_half_kernel(l, heads, seq_pack, causal, x_ref, *refs):
    p = AttnHalfParams(*[r[:] for r in refs[:-1]])
    o_ref = refs[-1]
    o_ref[:] = _attn_half_body(
        x_ref[:], p, l, heads, seq_pack, causal, q_prescaled=True
    ).astype(o_ref.dtype)


def _mlp_half_kernel(x_ref, *refs):
    p = MlpHalfParams(*[r[:] for r in refs[:-1]])
    o_ref = refs[-1]
    o_ref[:] = _mlp_half_body(x_ref[:], p).astype(o_ref.dtype)


def _pallas_rowtile(kernel_fn, x2, weights, out_cols, row_tile):
    """Row-tiled pallas_call shared by the two tp half kernels: (M, C) in,
    (M, out_cols) partial out IN THE ACTIVATION DTYPE (the partial is one
    f32-accumulated dot rounded once — same rounding class as every other
    bf16 activation, and it halves both the extra HBM round-trip and the
    psum volume vs f32 partials; f32 models keep exact f32 partials),
    weights resident across the grid."""
    m_total, c = x2.shape
    m_pad = (m_total + row_tile - 1) // row_tile * row_tile
    if m_pad != m_total:
        x2 = jnp.pad(x2, ((0, m_pad - m_total), (0, 0)))
    grid = (m_pad // row_tile,)
    xspec = pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((row_tile, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[xspec] + [wspec(a.shape) for a in weights],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((m_pad, out_cols), x2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
    )(x2, *weights)
    return out[:m_total]


def _xla_attn_half(x, p, l, heads, causal):
    """The attention half in plain XLA on (rows, l, C) — the `_xla_block`
    formulation cut at the out-projection dot.  Returns the partial in the
    ACTIVATION dtype (the wo matmul runs in x.dtype; under bf16 the partial
    is bf16 — same rounding class as the kernel path, see _pallas_rowtile)."""
    c_att = p.wq.shape[-1]
    d = c_att // heads
    xn = _ln(x, p.ln1_scale, p.ln1_bias)
    q = ((xn @ p.wq.astype(x.dtype)) + p.bq.astype(x.dtype)) * (d**-0.5)
    k = (xn @ p.wk.astype(x.dtype)) + p.bk.astype(x.dtype)
    v = (xn @ p.wv.astype(x.dtype)) + p.bv.astype(x.dtype)

    def split(t):
        return t.reshape(*t.shape[:-1], heads, d)

    q, k, v = split(q), split(k), split(v)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32)
    if causal:
        m = jnp.tril(jnp.ones((l, l), dtype=bool))
        logits = jnp.where(m, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(*x.shape[:-1], c_att)
    return attn @ p.wo.astype(x.dtype)


def _xla_mlp_half(x2, p):
    """The MLP half in plain XLA; partial in the activation dtype (the fc2
    matmul runs in x2.dtype, like _xla_attn_half)."""
    yn = _ln(x2, p.ln2_scale, p.ln2_bias)
    h1 = ((yn @ p.w1.astype(x2.dtype)) + p.b1.astype(x2.dtype)).astype(jnp.float32)
    h1 = _gelu_tanh_f32(h1).astype(x2.dtype)
    return h1 @ p.w2.astype(x2.dtype)


def tp_fusable(c: int, heads: int, hidden: int, tp: int) -> bool:
    """Whether the block geometry splits evenly over ``tp`` shards."""
    return (
        tp >= 1
        and heads % tp == 0
        and c % tp == 0
        and hidden % tp == 0
        and (c // tp) % (heads // tp) == 0
    )


_ATTN_FIELDS = AttnHalfParams._fields
_MLP_FIELDS = MlpHalfParams._fields


def _tp_block_impl(x, params: BlockParams, l, heads, causal, mesh):
    from jax.sharding import PartitionSpec as P

    tp = dict(zip(mesh.axis_names, mesh.devices.shape))["tp"]
    hidden = params.w1.shape[-1]
    c_full = x.shape[-1]
    if tp == 1 or not tp_fusable(c_full, heads, hidden, tp):
        # Geometry doesn't shard evenly (e.g. a channel-axis block with an
        # odd expanded width): run the unsplit math and let the jit
        # partitioner place it.  Same value either way.  The Mosaic custom
        # call has NO SPMD partitioning rule, so the single-device fused
        # kernel is only legal when the mesh really is one device; under a
        # multi-device mesh the fallback must be the XLA math, which the
        # partitioner can shard (it would otherwise fail to compile or
        # silently replicate with all-gathers).
        if _on_tpu() and mesh.devices.size == 1:
            s, l_, c = x.shape
            sp_factor, row_tile = _tile_plan(s, l, c)
            out = _pallas_block(
                x.reshape(s * l, c), params, l, heads, causal, sp_factor, row_tile
            )
            return out.reshape(s, l, c)
        return _xla_block(x, params, l, heads, causal)

    heads_l = heads // tp
    dp = "dp" if "dp" in mesh.axis_names else None
    # Keep the rows dp-sharded through the kernel whenever they divide
    # evenly (rows carry the batch outermost); otherwise replicate — the
    # spec is a static per-trace choice.
    dp_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    rows_axis = dp if (dp and x.shape[0] % dp_size == 0) else None
    if dp_size > 1 and rows_axis is None:
        # Replicated rows mean every dp shard recomputes the WHOLE batch —
        # a silent perf cliff.  Rows are batch-major, so this should
        # essentially never trigger; warn loudly if it does.
        import logging

        logging.getLogger(__name__).warning(
            "fused_block_apply_tp: %d rows do not divide dp=%d — activations "
            "replicated over dp, every shard recomputes the full batch",
            x.shape[0], dp_size,
        )
    x_spec = P(rows_axis, None, None)

    def col(a):
        return P(*([None] * (a.ndim - 1) + ["tp"]))

    def row(a):
        return P(*(["tp"] + [None] * (a.ndim - 1)))

    def rep(a):
        return P(*([None] * a.ndim))

    spec_of = dict(
        wq=col, bq=col, wk=col, bk=col, wv=col, bv=col, wo=row,
        w1=col, b1=col, w2=row,
    )
    p_specs = BlockParams(
        **{
            f: spec_of.get(f, rep)(getattr(params, f))
            for f in BlockParams._fields
        }
    )

    def body(xl, pl_):
        s, l_, c = xl.shape
        ap = AttnHalfParams(*(getattr(pl_, f) for f in _ATTN_FIELDS))
        mp = MlpHalfParams(*(getattr(pl_, f) for f in _MLP_FIELDS))
        if _on_tpu():
            sp_factor, row_tile = _tile_plan(s, l_, c)
            qs = (c // heads) ** -0.5 * _LOG2E
            ap = ap._replace(
                wq=(ap.wq.astype(jnp.float32) * qs).astype(ap.wq.dtype),
                bq=(ap.bq.astype(jnp.float32) * qs).astype(ap.bq.dtype),
            )
            x2 = xl.reshape(s * l_, c)
            out = _pallas_rowtile(
                functools.partial(
                    _attn_half_kernel, l_, heads_l, sp_factor, causal
                ),
                x2, ap, c, row_tile,
            )
            out = jax.lax.psum(out, "tp")
            xm = x2 + (out + pl_.bo).astype(x2.dtype)
            h2 = _pallas_rowtile(_mlp_half_kernel, xm, mp, c, row_tile)
            h2 = jax.lax.psum(h2, "tp")
            y = xm + (h2 + pl_.b2).astype(x2.dtype)
            return y.reshape(s, l_, c)
        out = jax.lax.psum(_xla_attn_half(xl, ap, l_, heads_l, causal), "tp")
        xm = xl + (out + pl_.bo).astype(xl.dtype)
        h2 = jax.lax.psum(_xla_mlp_half(xm, mp), "tp")
        return xm + (h2 + pl_.b2).astype(xl.dtype)

    f = jax.shard_map(
        body, mesh=mesh, in_specs=(x_spec, p_specs), out_specs=x_spec
    )
    return f(x, params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_block_apply_tp(
    x: jnp.ndarray, params: BlockParams, l: int, heads: int, causal: bool, mesh
) -> jnp.ndarray:
    """(rows, L, C) -> (rows, L, C) full transformer block, tensor-parallel.

    Forward: the two Megatron half kernels per tp shard with a psum after
    each (XLA half math off-TPU).  Gradients: XLA recompute of the unsplit
    block (`_xla_block`), partitioned by jit from the params' NamedShardings
    — the same recompute policy as `fused_block_apply`.
    """
    return _tp_block_impl(x, params, l, heads, causal, mesh)


def _tp_fwd(x, params, l, heads, causal, mesh):
    return fused_block_apply_tp(x, params, l, heads, causal, mesh), (x, params)


def _tp_bwd(l, heads, causal, mesh, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda a, p: _xla_block(a, p, l, heads, causal), x, params)
    return vjp(g)


fused_block_apply_tp.defvjp(_tp_fwd, _tp_bwd)


def _xla_group(x5, params_seq, axes, heads):
    """Reference chain in plain XLA: rearrange per axis + `_xla_block`."""
    b, t, hp, wp, c = x5.shape
    x = x5
    for axis, p in zip(axes, params_seq):
        if axis == "T":
            y = x.transpose(0, 2, 3, 1, 4).reshape(b * hp * wp, t, c)
            y = _xla_block(y, p, t, heads, True)
            x = y.reshape(b, hp, wp, t, c).transpose(0, 3, 1, 2, 4)
        elif axis == "H":
            y = x.transpose(0, 1, 3, 2, 4).reshape(b * t * wp, hp, c)
            y = _xla_block(y, p, hp, heads, False)
            x = y.reshape(b, t, wp, hp, c).transpose(0, 1, 3, 2, 4)
        else:
            y = x.reshape(b * t * hp, wp, c)
            y = _xla_block(y, p, wp, heads, False)
            x = y.reshape(b, t, hp, wp, c)
    return x


def group_fusable(axes: str, dims, c: int, heads: int, itemsize: int = 2) -> bool:
    """Whether the T/H/W chain can run in the group kernel: known axes,
    per-axis row counts divisible by the packed sequence length, and a
    per-batch-element activation that fits a VMEM budget.

    ``itemsize`` is the activation dtype's byte width (pass
    ``jnp.dtype(x.dtype).itemsize``); the permutation-matrix count comes
    from a dry ``_layout_plan`` call rather than an assumed maximum, so the
    estimate tracks the actual working set (non-cyclic axis strings can
    intern up to 6 distinct perms).
    """
    t, h, w = dims
    m = t * h * w
    if any(a not in _ORDER for a in axes):
        return False
    if c % heads:
        return False
    for a in set(axes):
        l = {"T": t, "H": h, "W": w}[a]
        if m % l:
            return False
    n_perms = len(_layout_plan(axes, dims)[2])
    # VMEM: activations/intermediates (~8 x-sized buffers) + the actual
    # (m, m) permutation matrices; keep under ~80 MiB of the 128 on v5e.
    return (m * c * itemsize * 8 + n_perms * m * m * itemsize) <= 80 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_group_apply(x5, params_seq, axes: str, heads: int):
    """(B, T, H, W, C) -> same, running the whole ``axes`` chain (one
    FusedTransformerBlock per char, T causal) in a single Pallas kernel per
    batch element on TPU; identical XLA math elsewhere and for gradients."""
    b, t, hp, wp, c = x5.shape
    if not _on_tpu():
        return _xla_group(x5, tuple(params_seq), axes, heads)
    import numpy as np

    m = t * hp * wp
    x2 = x5.reshape(b * m, c)
    perm_ids, final_id, perms = _layout_plan(axes, (t, hp, wp))
    p_mats = []
    for idx in perms:
        pm = np.zeros((m, m), dtype=np.float32)
        pm[np.arange(m), idx] = 1.0
        p_mats.append(jnp.asarray(pm, x5.dtype))
    stacked = [jnp.stack(arrs) for arrs in zip(*params_seq)]
    xspec = pl.BlockSpec((m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _group_kernel, axes, heads, (t, hp, wp), perm_ids, final_id, len(p_mats)
        ),
        grid=(b,),
        in_specs=[xspec]
        + [wspec(a.shape) for a in p_mats]
        + [wspec(a.shape) for a in stacked],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b * m, c), x5.dtype),
        # The whole-chain working set (weights + permutation matrices +
        # activations, ~75 MB at the flagship geometry) exceeds Mosaic's
        # 16 MB default scoped-VMEM limit; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(x2, *p_mats, *stacked)
    return out.reshape(b, t, hp, wp, c)


# ---------------------------------------------------------------------------
# Sub-chain fusion: a RUN of consecutive T/H/W blocks in one kernel, taking
# input already in the FIRST axis's token order and leaving output in the
# LAST axis's order.  The XLA rearranges at the run's boundary replace ones
# the per-block path already paid, so each INTERIOR axis switch trades an
# HBM-round-trip XLA transpose pair for one in-VMEM permutation matmul
# (~32 us at m=3072).  Exists because the whole-model group kernel is
# compile-blocked (docs/PERF.md: 9-block chain >56 min on the axon remote
# compiler) while short chains compile in tens of seconds.
# ---------------------------------------------------------------------------


def _axis_rows(axis: str, dims):
    t, h, w = dims
    return {"T": t, "H": h, "W": w}[axis]


def chain_fusable(axes: str, dims, c: int, heads: int, itemsize: int = 2) -> bool:
    """VMEM feasibility of a sub-chain run (mirrors ``group_fusable``)."""
    t, h, w = dims
    m = t * h * w
    if any(a not in _ORDER for a in axes):
        return False
    if c % heads:
        return False
    for a in set(axes):
        if m % _axis_rows(a, dims):
            return False
    start = _ORDER[axes[0]]
    stop = _ORDER[axes[-1]]
    n_perms = len(_layout_plan(axes, dims, start, stop)[2])
    return (m * c * itemsize * 8 + n_perms * m * m * itemsize) <= 80 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_chain_apply(x3, params_seq, axes: str, heads: int, dims):
    """(s, l, c) in ``axes[0]``'s token order -> (s', l', c) in
    ``axes[-1]``'s order, running every block of ``axes`` (T causal) in one
    Pallas kernel per batch element.  Off-TPU: identical XLA math."""
    t, hp, wp = dims
    m = t * hp * wp
    s, l, c = x3.shape
    b = (s * l) // m

    if not _on_tpu():
        return _chain_ref(x3, tuple(params_seq), axes, heads, dims)

    import numpy as np

    x2 = x3.reshape(b * m, c)
    start = _ORDER[axes[0]]
    stop = _ORDER[axes[-1]]
    perm_ids, final_id, perms = _layout_plan(axes, dims, start, stop)
    p_mats = []
    for idx in perms:
        pm = np.zeros((m, m), dtype=np.float32)
        pm[np.arange(m), idx] = 1.0
        p_mats.append(jnp.asarray(pm, x3.dtype))
    stacked = [jnp.stack(arrs) for arrs in zip(*params_seq)]
    xspec = pl.BlockSpec((m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(
            shape, lambda i, _s=shape: tuple(0 for _ in _s), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(
            _group_kernel, axes, heads, dims, perm_ids, final_id, len(p_mats)
        ),
        grid=(b,),
        in_specs=[xspec]
        + [wspec(a.shape) for a in p_mats]
        + [wspec(a.shape) for a in stacked],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b * m, c), x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(x2, *p_mats, *stacked)
    l_out = _axis_rows(axes[-1], dims)
    return out.reshape(b * m // l_out, l_out, c)


def _chain_ref(x3, params_seq, axes, heads, dims):
    """Shared XLA reference for the sub-chain kernel (off-TPU forward and
    VJP recompute) — one copy of the token-order convention."""
    t, hp, wp = dims
    m = t * hp * wp
    s, l, c = x3.shape
    b = (s * l) // m
    if axes[0] == "T":
        x5 = x3.reshape(b, hp, wp, t, c).transpose(0, 3, 1, 2, 4)
    elif axes[0] == "H":
        x5 = x3.reshape(b, t, wp, hp, c).transpose(0, 1, 3, 2, 4)
    else:
        x5 = x3.reshape(b, t, hp, wp, c)
    y5 = _xla_group(x5, tuple(params_seq), axes, heads)
    if axes[-1] == "T":
        return y5.transpose(0, 2, 3, 1, 4).reshape(b * hp * wp, t, c)
    if axes[-1] == "H":
        return y5.transpose(0, 1, 3, 2, 4).reshape(b * t * wp, hp, c)
    return y5.reshape(b * t * hp, wp, c)


def _chain_fwd(x3, params_seq, axes, heads, dims):
    return fused_chain_apply(x3, params_seq, axes, heads, dims), (x3, params_seq)


def _chain_bwd(axes, heads, dims, res, g):
    x3, params_seq = res
    _, vjp = jax.vjp(
        lambda a, ps: _chain_ref(a, ps, axes, heads, dims), x3, tuple(params_seq)
    )
    return vjp(g)


fused_chain_apply.defvjp(_chain_fwd, _chain_bwd)


def _group_fwd(x5, params_seq, axes, heads):
    return fused_group_apply(x5, params_seq, axes, heads), (x5, params_seq)


def _group_bwd(axes, heads, res, g):
    x5, params_seq = res
    _, vjp = jax.vjp(
        lambda a, ps: _xla_group(a, ps, axes, heads), x5, tuple(params_seq)
    )
    return vjp(g)


fused_group_apply.defvjp(_group_fwd, _group_bwd)
