"""AViT baseline — MPP (PolymathicAI) axial space-time ViT.

Capabilities mirrored from reference ``models/avit.py:379-454``: per-batch
instance normalization inside forward (std/mean over (T, H, W) per
batch x channel, re-applied at the output, under stop-gradient),
state-variable-aware ``SubsampledLinear`` lift, 3-stage hMLP conv patch
embed/debed (4*2*2 = 16) with RMS instance norms, N space-time blocks
(temporal attention per pixel with a T5-bucketed relative position bias and
q/k LayerNorms, then axial row+col attention averaged, LayerScale,
stochastic depth), and the reference's output quirk: the last
``min(4, T)`` frames are emitted regardless of ``out_steps``
(``avit.py:450``), reproduced so rollout semantics match the published
numbers.

Layout notes: everything is channels-last; "1x1 conv heads" are Dense over
channels; RMSInstanceNorm divides by the spatial std WITHOUT subtracting
the mean (reference quirk at ``avit.py:134-139``, bias param unused).
The spatial blocks' unused RelativePositionBias (created but never called
in the reference's AxialAttentionBlock.forward) is not instantiated here.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.common import TorchDense
from tante_tpu.ops.activations import gelu


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


class RMSInstanceNorm(nn.Module):
    """x / (std over (H, W) + eps) * weight — no mean subtraction
    (reference avit.py:125-139; the bias parameter exists but is unused)."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        _ = self.param("bias", nn.initializers.zeros, (self.dim,))
        std = jnp.std(x, axis=(-3, -2), keepdims=True, ddof=1)
        return x / (std + self.eps) * weight


class InstanceNorm(nn.Module):
    """Standard instance norm over (H, W), affine per channel."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * weight + bias


def t5_relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bidirectional T5 bucketing (reference avit.py:57-80)."""
    num_buckets //= 2
    n = -relative_position
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    n_heads: int
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (self.num_buckets, self.n_heads)
        )
        ctx = jnp.arange(qlen)[:, None]
        mem = jnp.arange(klen)[None, :]
        buckets = t5_relative_position_bucket(
            mem - ctx, self.num_buckets, self.max_distance
        )
        values = table[buckets]  # (q, k, heads)
        return jnp.transpose(values, (2, 0, 1))[None]  # (1, heads, q, k)


class ContinuousPositionBias1D(nn.Module):
    """Swin-v2-style continuous position bias (reference avit.py:21-45);
    available for ``bias_type='continuous'``."""

    n_heads: int

    @nn.compact
    def __call__(self, h: int, h2: int) -> jnp.ndarray:
        rel = (jnp.arange(-(h - 1), h, dtype=jnp.float32) / (h - 1))[:, None]
        y = TorchDense(512)(rel)
        y = nn.relu(y)
        y = nn.Dense(self.n_heads, use_bias=False)(y)
        y = 16 * nn.sigmoid(y)  # (2h-1, heads)
        coords = jnp.arange(h)[None, :] - jnp.arange(h)[:, None] + (h - 1)
        biases = y[coords]  # (h, h, heads)
        return jnp.transpose(biases, (2, 0, 1))[None]


def _heads_attention(q, k, v, bias=None):
    """q, k, v: (B, L, H, D) -> (B, L, H, D); bias (1, H, Lq, Lk)."""
    from tante_tpu.ops.attention import (
        PACKED_ATTENTION_MAX_TOKENS,
        packed_head_attention,
    )

    if bias is None and q.shape[-2] * q.shape[-3] <= PACKED_ATTENTION_MAX_TOKENS:
        return packed_head_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


class TemporalAttentionBlock(nn.Module):
    """Attention over T per pixel (reference AttentionBlock, avit.py:288-331)."""

    hidden_dim: int
    num_heads: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, T, H, W, C)."""
        b, t, h, w, c = x.shape
        hd = c // self.num_heads
        residual = x
        y = InstanceNorm(c, name="norm1")(x)
        y = TorchDense(3 * c, dtype=self.dtype, name="input_head")(y)
        y = rearrange(y, "b t h w (he d) -> (b h w) t he d", he=self.num_heads)
        q, k, v = jnp.split(y, 3, axis=-1)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="qnorm")(q)
        k = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="knorm")(k)
        bias = RelativePositionBias(n_heads=self.num_heads, name="rel_pos_bias")(t, t)
        y = _heads_attention(q, k, v, bias.astype(q.dtype))
        y = rearrange(y, "(b h w) t he d -> b t h w (he d)", b=b, h=h, w=w)
        y = InstanceNorm(c, name="norm2")(y)
        y = TorchDense(c, dtype=self.dtype, name="output_head")(y)
        gamma = self.param(
            "gamma", lambda key: self.layer_scale_init_value * jnp.ones((c,))
        )
        y = DropPath(self.drop_path)(y * gamma, deterministic)
        return residual + y


class AxialAttentionBlock(nn.Module):
    """Row + column attention averaged (reference avit.py:223-286)."""

    hidden_dim: int
    num_heads: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B', H, W, C) with time folded into batch."""
        b, h, w, c = x.shape
        residual = x
        y = RMSInstanceNorm(c, name="norm1")(x)
        y = TorchDense(3 * c, dtype=self.dtype, name="input_head")(y)
        y = rearrange(y, "b h w (he d) -> b h w he d", he=self.num_heads)
        q, k, v = jnp.split(y, 3, axis=-1)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="qnorm")(q)
        k = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="knorm")(k)

        # Row (W-axis) attention
        qx, kx, vx = (rearrange(z, "b h w he d -> (b h) w he d") for z in (q, k, v))
        xx = _heads_attention(qx, kx, vx)
        xx = rearrange(xx, "(b h) w he d -> b h w (he d)", h=h)
        # Column (H-axis) attention
        qy, ky, vy = (rearrange(z, "b h w he d -> (b w) h he d") for z in (q, k, v))
        xy = _heads_attention(qy, ky, vy)
        xy = rearrange(xy, "(b w) h he d -> b h w (he d)", w=w)

        y = (xx + xy) / 2
        y = RMSInstanceNorm(c, name="norm2")(y)
        y = TorchDense(c, dtype=self.dtype, name="output_head")(y)
        gamma_att = self.param(
            "gamma_att", lambda key: self.layer_scale_init_value * jnp.ones((c,))
        )
        x = residual + DropPath(self.drop_path)(y * gamma_att, deterministic)

        residual = x
        z = TorchDense(4 * c, dtype=self.dtype)(x)
        z = gelu(z)
        z = TorchDense(c, dtype=self.dtype)(z)
        z = RMSInstanceNorm(c, name="mlp_norm")(z)
        gamma_mlp = self.param(
            "gamma_mlp", lambda key: self.layer_scale_init_value * jnp.ones((c,))
        )
        return residual + DropPath(self.drop_path)(z * gamma_mlp, deterministic)


class HMLPStem(nn.Module):
    """3-stage conv patch embed 4*2*2 with RMS instance norms."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        e4 = self.embed_dim // 4
        x = nn.Conv(e4, (4, 4), strides=(4, 4), use_bias=False, dtype=self.dtype)(x)
        x = RMSInstanceNorm(e4)(x)
        x = gelu(x)
        x = nn.Conv(e4, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        x = RMSInstanceNorm(e4)(x)
        x = gelu(x)
        x = nn.Conv(self.embed_dim, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        return RMSInstanceNorm(self.embed_dim)(x)


class HMLPOutput(nn.Module):
    out_chans: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NOTE: the _PatchDenseTranspose swap (see models/dpot.py) was
        # measured HERE and reverted: at hMLP_output's small kernels and
        # thin channels the depth-to-space transposes cost more than XLA's
        # dilated-conv lowering (1542 -> 1400 f/s end-to-end).
        e4 = self.embed_dim // 4
        x = nn.ConvTranspose(e4, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        x = RMSInstanceNorm(e4)(x)
        x = gelu(x)
        x = nn.ConvTranspose(e4, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(x)
        x = RMSInstanceNorm(e4)(x)
        x = gelu(x)
        return nn.ConvTranspose(self.out_chans, (4, 4), strides=(4, 4), dtype=self.dtype)(x)


class AViT(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    out_steps: int = 4
    patch_size: Tuple[int, int] = (16, 16)
    embed_dim: int = 768
    num_heads: int = 12
    processor_blocks: int = 8
    drop_path: float = 0.2
    # Remat both halves of each space-time block (the reference exposes the
    # same flag and checkpoints both halves, avit.py:341-372).
    gradient_checkpointing: bool = False

    @property
    def output_length(self) -> int:
        # Reference emits the last min(4, T) frames regardless of out_steps
        # (avit.py:450).
        return min(4, self.in_T)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, min(4, T), H, W, C)."""
        b, t, h, w, c = x.shape
        # Per-batch instance normalization over (T, H, W), stop-gradient
        # (reference avit.py:423-426).  Under data parallelism these stats
        # are per-shard of the batch, matching single-device semantics
        # per-sample since the reduction never crosses the batch axis.
        mean = jax.lax.stop_gradient(jnp.mean(x, axis=(1, 2, 3), keepdims=True))
        std = jax.lax.stop_gradient(jnp.std(x, axis=(1, 2, 3), keepdims=True, ddof=1) + 1e-7)
        z = (x - mean) / std

        # SubsampledLinear with all state labels present == plain Linear
        # (scale factor 1; reference avit.py:141-168).
        z = TorchDense(self.embed_dim // 4, name="space_bag")(z)

        z = z.reshape(b * t, h, w, self.embed_dim // 4)
        z = HMLPStem(self.embed_dim, name="embed")(z)
        hp, wp = z.shape[1], z.shape[2]
        z = z.reshape(b, t, hp, wp, self.embed_dim)

        temporal_cls, spatial_cls = TemporalAttentionBlock, AxialAttentionBlock
        if self.gradient_checkpointing:
            # deterministic (arg index 2, after the bound module) is a
            # Python bool and must stay static under jax.checkpoint.
            temporal_cls = nn.remat(TemporalAttentionBlock, static_argnums=(2,))
            spatial_cls = nn.remat(AxialAttentionBlock, static_argnums=(2,))
        dp_rates = np.linspace(0, self.drop_path, self.processor_blocks)
        for i in range(self.processor_blocks):
            z = temporal_cls(
                self.embed_dim,
                self.num_heads,
                drop_path=float(dp_rates[i]),
                name=f"temporal_{i}",
            )(z, deterministic)
            zz = z.reshape(b * t, hp, wp, self.embed_dim)
            zz = spatial_cls(
                self.embed_dim,
                self.num_heads,
                drop_path=float(dp_rates[i]),
                name=f"spatial_{i}",
            )(zz, deterministic)
            z = zz.reshape(b, t, hp, wp, self.embed_dim)

        z = z.reshape(b * t, hp, wp, self.embed_dim)
        z = HMLPOutput(c, self.embed_dim, name="debed")(z)
        z = z.reshape(b, t, h, w, c)
        z = z * std + mean
        return z[:, -self.output_length :]
