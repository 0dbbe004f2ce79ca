"""ConvNeXt U-Net baseline (reference ``models/unet_convnext.py:202-283``).

ConvNeXt blocks (7x7 depthwise conv -> LayerNorm -> 4x MLP -> LayerScale)
in a U-Net of Down/Upsample stages with channel-concat skips and 1x1 skip
projections.  Channels-last throughout — the reference's permute-heavy
"implementation (2)" collapses to straight-line NHWC code here.

The reference's channels-first "LayerNorm" inside Down/Upsample is actually
an L2 normalization over channels (``F.normalize(x, p=2, dim=1) * weight``,
``unet_convnext.py:69``) — reproduced faithfully since trained nets depend
on it.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init
from tante_tpu.ops.activations import gelu


class ChannelL2Norm(nn.Module):
    """x / max(||x||_2 over C, eps) * weight — the reference quirk."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, self.eps) * weight.astype(x.dtype)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32, groups=1, c_in=None):
    k = (kernel, kernel)
    fan_in = (c_in or features) * kernel * kernel // groups
    return nn.Conv(
        features,
        kernel_size=k,
        strides=(stride, stride),
        padding=((kernel // 2, (kernel - 1) // 2),) * 2 if kernel > 1 else "VALID",
        feature_group_count=groups,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class ConvNextBlock(nn.Module):
    dim: int
    layer_scale_init_value: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # XLA grouped conv, measured IN CONTEXT: the lane-flat shift-and-add
        # form (ops/convs.py:depthwise_conv2d_lanes) wins the isolated op A/B
        # 2.2x (scripts/dwconv_ab.py) but LOSES 2.7x inside the per-stage
        # nn.scan bodies where its 49-tap f32 chain doesn't fuse — whole-model
        # zoo rollout: grouped 636 / dense 546 / laneflat 233 f/s
        # (scripts/dwconv_inmodel_ab.py; docs/PERF.md round 5).
        y = _conv(
            self.dim, 7, dtype=self.dtype, groups=self.dim, c_in=self.dim,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
        y = nn.Dense(
            4 * self.dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.dim),
            dtype=self.dtype,
        )(y)
        y = gelu(y)
        y = nn.Dense(
            self.dim,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(4 * self.dim),
            dtype=self.dtype,
        )(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda key: self.layer_scale_init_value * jnp.ones((self.dim,)),
            )
            # Cast the (f32) scale param to the compute dtype: under bf16 the
            # f32*bf16 promotion would upcast the residual stream — and break
            # the depth>1 nn.scan carry dtype contract.
            y = gamma.astype(y.dtype) * y
        return (x + y).astype(x.dtype)


class _ConvNextScanCell(nn.Module):
    """One ConvNext block in (carry, _) -> (carry, None) form for nn.scan."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        return ConvNextBlock(self.dim, dtype=self.dtype)(carry), None


class Stage(nn.Module):
    dim_in: int
    dim_out: int
    depth: int = 1
    mode: str = "down"  # 'down' | 'up' | 'neck'
    skip_project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.skip_project:
            x = _conv(self.dim_in, 1, dtype=self.dtype, c_in=x.shape[-1], name="skip_proj")(x)
        if self.depth > 1:
            # lax.scan over the depth-stacked block params: the per-stage
            # blocks are shape-identical, so XLA compiles ONE block body per
            # stage instead of ``depth`` unrolled copies.  This is what
            # brings the whole-model TPU compile inside a practical window
            # (the shipped config has blocks_per_stage=4 over 9 stages; the
            # unrolled form exceeded the round-2 session compile budget).
            # NOTE checkpoint layout: depth>1 stores one depth-stacked
            # 'blocks' collection (leading scan axis), depth==1 a single
            # unstacked ConvNextBlock_0 — trees are per-config stable but a
            # blocks_per_stage change is a (loudly failing) restore break,
            # like any architecture change.
            x, _ = nn.scan(
                _ConvNextScanCell,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
            )(self.dim_in, dtype=self.dtype, name="blocks")(x, None)
        elif self.depth == 1:
            x = ConvNextBlock(self.dim_in, dtype=self.dtype)(x)
        if self.mode == "down":
            x = ChannelL2Norm()(x)
            x = _conv(self.dim_out, 2, stride=2, dtype=self.dtype, c_in=self.dim_in, name="down")(x)
        elif self.mode == "up":
            x = ChannelL2Norm()(x)
            # (_PatchDenseTranspose swap measured at parity here — 2x2
            # kernels are cheap either way; kept as nn.ConvTranspose.)
            x = nn.ConvTranspose(
                self.dim_out,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(self.dim_in * 4),
                dtype=self.dtype,
                name="up",
            )(x)
        return x


class UNetConvNext(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    stages: int = 4
    blocks_per_stage: int = 1
    blocks_at_neck: int = 1
    init_features: int = 32
    gradient_checkpointing: bool = False
    output_length: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, 1, H, W, C)."""
        b, t, h, w, c = x.shape
        z = jnp.moveaxis(x, 1, -2).reshape(b, h, w, t * c)
        feats = self.init_features
        enc_dims = [feats * 2**i for i in range(self.stages + 1)]
        dec_dims = [feats * 2**i for i in range(self.stages, -1, -1)]

        z = _conv(feats, 3, dtype=self.dtype, c_in=t * c, name="in_proj")(z)

        stage_cls = nn.remat(Stage) if self.gradient_checkpointing else Stage
        skips = []
        for i in range(self.stages):
            skips.append(z)
            z = stage_cls(
                dim_in=enc_dims[i],
                dim_out=enc_dims[i + 1],
                depth=self.blocks_per_stage,
                mode="down",
                dtype=self.dtype,
                name=f"enc_{i}",
            )(z)
        z = Stage(
            dim_in=enc_dims[-1],
            dim_out=enc_dims[-1],
            depth=self.blocks_at_neck,
            mode="neck",
            dtype=self.dtype,
            name="neck",
        )(z)
        for j in range(self.stages):
            if j > 0:
                z = jnp.concatenate([z, skips[-j]], axis=-1)
            z = stage_cls(
                dim_in=dec_dims[j],
                dim_out=dec_dims[j + 1],
                depth=self.blocks_per_stage,
                mode="up",
                skip_project=(j != 0),
                dtype=self.dtype,
                name=f"dec_{j}",
            )(z)
        z = _conv(c, 3, dtype=self.dtype, c_in=feats, name="out_proj")(z)
        return z[:, None]
