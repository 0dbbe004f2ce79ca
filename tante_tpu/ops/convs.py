"""Patchify / de-patchify convolutions (channels-last flax modules).

TPU-native re-design of the reference's ``RealConv2d`` / ``RealTransConv2d``
(``models/enc_dec_cnn.py:49-184``): strided conv with overlap-controlled
stride + 'same'-style symmetric padding, then an exact-grid enforcement step
(adaptive average pool down / bilinear resize up).  With ``overlap_ratio=0``
(every shipped config) the enforcement step is the identity and XLA sees a
plain strided conv that tiles directly onto the MXU.

Layout: NHWC in, NHWC out (no NCHW transposes anywhere).
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init
from tante_tpu.ops.pooling import adaptive_avg_pool2d, resize_bilinear


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _stride(p: int, overlap_ratio: float) -> int:
    return max(1, int(round(p * (1.0 - overlap_ratio))))


class RealConv2d(nn.Module):
    """Strided patch conv + adaptive-pool to an exact (H/P, W/P) grid."""

    out_channels: int
    patch_size: Union[int, Tuple[int, int]] = 1
    overlap_ratio: float = 0.0
    use_bias: bool = True
    enforce_patch_grid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = _pair(self.patch_size)
        s_h, s_w = _stride(p_h, self.overlap_ratio), _stride(p_w, self.overlap_ratio)
        pad_h, pad_w = (p_h - 1) // 2, (p_w - 1) // 2
        h, w = x.shape[-3], x.shape[-2]
        c_in = x.shape[-1]
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(p_h, p_w),
            strides=(s_h, s_w),
            padding=((pad_h, pad_h), (pad_w, pad_w)),
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(c_in * p_h * p_w),
            dtype=self.dtype,
        )(x)
        if not self.enforce_patch_grid:
            return y
        assert h % p_h == 0 and w % p_w == 0, (
            "To enforce (H//P, W//P), input H and W must be divisible by patch_size."
        )
        return adaptive_avg_pool2d(y, (h // p_h, w // p_w))


class RealTransConv2d(nn.Module):
    """Transposed patch conv + bilinear resize to an exact (H*P, W*P) grid."""

    out_channels: int
    patch_size: Union[int, Tuple[int, int]] = 1
    overlap_ratio: float = 0.0
    use_bias: bool = True
    enforce_patch_grid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = _pair(self.patch_size)
        s_h, s_w = _stride(p_h, self.overlap_ratio), _stride(p_w, self.overlap_ratio)
        pad_h, pad_w = (p_h - 1) // 2, (p_w - 1) // 2
        h, w = x.shape[-3], x.shape[-2]
        c_in = x.shape[-1]
        y = nn.ConvTranspose(
            features=self.out_channels,
            kernel_size=(p_h, p_w),
            strides=(s_h, s_w),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(c_in * p_h * p_w),
            dtype=self.dtype,
        )(x)
        # torch ConvTranspose2d 'padding' crops the full (VALID) output.
        if pad_h > 0:
            y = y[..., pad_h:-pad_h, :, :]
        if pad_w > 0:
            y = y[..., :, pad_w:-pad_w, :]
        if not self.enforce_patch_grid:
            return y
        tgt = (h * p_h, w * p_w)
        if y.shape[-3] == tgt[0] and y.shape[-2] == tgt[1]:
            return y
        return resize_bilinear(y, tgt)
