"""Multi-head attention (flax), torch-``nn.MultiheadAttention`` semantics.

Used by the axial backbone (reference ``models/attn_backbone.py:48``) and the
CViT/AViT blocks.  Joint QKV projection with xavier-uniform init and zero
bias (torch MHA defaults), scaled dot-product attention, optional causal
masking, attention-weight dropout, output projection.

The sequence lengths in this framework are small-to-moderate (axial
factorization bounds them to max(T, H_p, W_p, H_p*W_p)); XLA's fused
attention is efficient here.  ``tante_tpu.ops.pallas_attention`` provides a
flash-attention Pallas kernel used automatically for long sequences.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tante_tpu.ops.initializers import torch_kernel_init, torch_xavier_init

# Use head-packed attention when num_heads * seq_len fits one score tile
# worth computing densely (see packed_head_attention).  Beyond this, the
# packed (S, H*L, H*L) scores' 8x FLOP/memory waste loses to the unpacked
# per-head path (measured on v5e: at H*L=384 packed costs 0.65 ms vs 0.09
# unpacked-bf16 at the TANTE W-axis geometry — docs/PERF.md round 2).
PACKED_ATTENTION_MAX_TOKENS = int(os.environ.get("TANTE_PACKED_MAX", "128"))
# 'pallas' (VMEM-fused scores on TPU) or 'xla' for the packed core.
# Default xla: the Pallas core wins isolated (0.147 vs 0.295 ms at the
# T-axis geometry) but LOSES end-to-end (690 vs 878 frames/s) — the custom
# call's operand layout constraints force extra transposes in-model.
PACKED_IMPL = os.environ.get("TANTE_PACKED_IMPL", "xla")
# softmax dtype on the unpacked self-attention path: 'f32' (default; also
# what torch does) or 'compute' (follow the model dtype).  Counter-intuitive
# but measured: end-to-end the f32 softmax is FASTER (915 vs 872 frames/s)
# even though isolated scans say the opposite — XLA fuses the upcast chain
# into the score matmul in-model.
UNPACKED_SOFTMAX = os.environ.get("TANTE_UNPACKED_SOFTMAX", "f32")


def packed_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Attention for SHORT sequences, TPU-packed across heads.

    q, k, v: (B, L, H, D) -> (B, L, H, D).

    The axial backbones attend along tiny axes (T=4, H_p=16, W_p=48) with
    small head dims (32), so per-head score matmuls are (L, D)x(D, L) —
    far below the 128x128 MXU tile and dominated by layout padding.  This
    path folds the head axis into the sequence: scores become ONE dense
    (H*L, H*L) matmul per batch row with a block-diagonal mask killing
    cross-head terms.  8x FLOP waste at H=8, but every matmul runs on full
    MXU tiles: measured 0.29 ms vs 0.85 ms for the standard path at
    (1536, 16, 8, 32) on v5e, bitwise-equal outputs.
    """
    b, l, h, d = q.shape
    scale = d**-0.5

    def pack(t):
        return t.transpose(0, 2, 1, 3).reshape(b, h * l, d)

    qp, kp, vp = pack(q * scale), pack(k), pack(v)
    logits = jnp.einsum("bpd,bqd->bpq", qp, kp)
    row = jax.lax.broadcasted_iota(jnp.int32, (h * l, h * l), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h * l, h * l), 1)
    mask = (row // l) == (col // l)  # same head
    if causal:
        mask = mask & ((row % l) >= (col % l))
    logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    out = jnp.einsum("bpq,bqd->bpd", weights, vp)
    return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,
        k_in: Optional[jnp.ndarray] = None,
        v_in: Optional[jnp.ndarray] = None,
        causal: bool = False,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """(B, L, C) -> (B, L, C); cross-attention when k_in/v_in differ."""
        k_in = q_in if k_in is None else k_in
        v_in = k_in if v_in is None else v_in
        c, h = self.embed_dim, self.num_heads
        head_dim = c // h
        assert c % h == 0, "embed_dim must be divisible by num_heads"

        dense = lambda name: nn.Dense(
            c,
            use_bias=self.use_bias,
            kernel_init=torch_xavier_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=name,
        )
        q = dense("q_proj")(q_in)
        k = dense("k_proj")(k_in)
        v = dense("v_proj")(v_in)

        def split(x):
            return x.reshape(*x.shape[:-1], h, head_dim)

        q, k, v = split(q), split(k), split(v)  # (B, L, H, D)

        self_attn = k_in is q_in and v_in is k_in
        simple = (
            self_attn
            and attn_bias is None
            and (self.dropout == 0.0 or deterministic)
            and q.ndim == 4
        )
        if simple and h * q.shape[-3] <= PACKED_ATTENTION_MAX_TOKENS:
            # Tiny sequences: fold heads into the sequence so score matmuls
            # run on full MXU tiles; Pallas keeps the f32 scores in VMEM on
            # TPU (ops/pallas_attention.py), XLA math elsewhere.
            if PACKED_IMPL == "pallas":
                from tante_tpu.ops.pallas_attention import packed_attention

                b, l, _, d = q.shape
                scale = d**-0.5

                def pack(t):
                    return t.transpose(0, 2, 1, 3).reshape(b, h * l, d)

                out = packed_attention(pack(q * scale), pack(k), pack(v), l, causal)
                out = out.reshape(b, h, l, d).transpose(0, 2, 1, 3)
            else:
                out = packed_head_attention(q, k, v, causal=causal)
        elif simple:
            # Moderate sequences: per-head scores; softmax dtype selected by
            # UNPACKED_SOFTMAX (default 'f32' — measured faster end to end
            # than the bf16 softmax despite the 2x score bytes; see the
            # constant's doc above for the measurements).
            scale = head_dim**-0.5
            logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
            if causal:
                lq, lk = logits.shape[-2], logits.shape[-1]
                mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
                logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
            if UNPACKED_SOFTMAX == "f32":
                weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                    logits.dtype
                )
            else:
                weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        else:
            scale = head_dim**-0.5
            logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
            if attn_bias is not None:
                logits = logits + attn_bias
            if causal:
                lq, lk = logits.shape[-2], logits.shape[-1]
                mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
                logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
            weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                logits.dtype
            )
            if self.dropout > 0.0 and not deterministic:
                weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
            out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(*out.shape[:-2], c)
        out = nn.Dense(
            c,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_proj",
        )(out)
        return out
