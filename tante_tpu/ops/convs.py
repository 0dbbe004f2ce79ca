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


# Space-to-depth fast path for non-overlapping patch convs
# (_PatchDense[Transpose]).  Measured chain-level on v5e and REJECTED as the
# default: the op-level analysis promised ~10x on the tiny stride==kernel
# convs, but end-to-end the 4-channel boundary transposes cost more than
# XLA's conv emitter (old928 A/B: 8.0 ms/call vs 4.4 baseline) — the
# micro-win != chain-win lesson of docs/PERF.md again.  Kept opt-in for
# geometries with fatter boundary channels.
import os

_PATCH_DENSE = os.environ.get("TANTE_PATCH_DENSE", "0") == "1"


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def pack_patches(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Space-to-depth: (..., H, W, C) -> (..., H/p, W/p, p*p*C).

    Channel order of the packed dim is (patch-row, patch-col, channel) —
    exactly the (kh, kw, ci) flattening of an HWIO conv kernel, so a
    non-overlapping stride-p pxp conv on x equals ``pack_patches(x, p) @
    kernel.reshape(p*p*ci, co)``.
    """
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    z = x.reshape(*lead, h // p, p, w // p, p, c)
    nd = z.ndim
    z = z.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return z.reshape(*lead, h // p, w // p, p * p * c)


def packed_patch_ok(p: int, overlap_ratio: float) -> bool:
    """Whether a pxp patch conv is a clean space-to-depth + dense (stride ==
    patch, zero symmetric padding) so the packed fast paths apply."""
    return overlap_ratio == 0.0 and (p - 1) // 2 == 0 and p > 1


def unpack_patches(z: jnp.ndarray, p: int) -> jnp.ndarray:
    """Depth-to-space inverse of ``pack_patches``."""
    hp, wp, pc = z.shape[-3], z.shape[-2], z.shape[-1]
    c = pc // (p * p)
    lead = z.shape[:-3]
    y = z.reshape(*lead, hp, wp, p, p, c)
    nd = y.ndim
    y = y.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return y.reshape(*lead, hp * p, wp * p, c)


def _stride(p: int, overlap_ratio: float) -> int:
    return max(1, int(round(p * (1.0 - overlap_ratio))))


class _PatchDense(nn.Module):
    """Non-overlapping patchify conv as space-to-depth + matmul.

    Parameter-compatible with the ``nn.Conv`` it replaces: ``kernel`` keeps
    the HWIO ``(p_h, p_w, c_in, features)`` shape (flattened in that order,
    which is exactly the patch layout), ``bias`` is ``(features,)``.
    """

    features: int
    patch: Tuple[int, int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # Input already packed ((..., H/p, W/p, p*p*c_in), pack_patches order):
    # skip the space-to-depth and go straight to the matmul.
    packed_in: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = self.patch
        if self.packed_in:
            c_in = x.shape[-1] // (p_h * p_w)
            z = x
        else:
            h, w, c_in = x.shape[-3], x.shape[-2], x.shape[-1]
            z = pack_patches(x, p_h) if p_h == p_w else None
            if z is None:
                lead = x.shape[:-3]
                z = x.reshape(*lead, h // p_h, p_h, w // p_w, p_w, c_in)
                nd = z.ndim
                z = z.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
                z = z.reshape(*lead, h // p_h, w // p_w, p_h * p_w * c_in)
        kernel = self.param(
            "kernel", torch_kernel_init, (p_h, p_w, c_in, self.features)
        )
        wmat = kernel.reshape(p_h * p_w * c_in, self.features)
        y = z.astype(self.dtype) @ wmat.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(c_in * p_h * p_w), (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


class _PatchDenseTranspose(nn.Module):
    """Non-overlapping de-patchify ConvTranspose as matmul + depth-to-space.

    Parameter-compatible with ``nn.ConvTranspose``: ``kernel`` keeps the
    ``(p_h, p_w, c_in, features)`` shape.
    """

    features: int
    patch: Tuple[int, int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # Return the packed (..., H, W, p*p*features) tensor (pack_patches
    # order) WITHOUT the depth-to-space — the inverse of _PatchDense's
    # packed_in, so a decode->encode round trip can stay packed.
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = self.patch
        h, w, c_in = x.shape[-3], x.shape[-2], x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (p_h, p_w, c_in, self.features)
        )
        # (ph, pw, ci, co) -> (ci, ph*pw*co): each input pixel expands to a
        # (ph, pw) patch of co-channel outputs.  lax.conv_transpose (flax's
        # backend, transpose_kernel=False) mirrors the kernel spatially, so
        # flip to match its convention exactly.
        wmat = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(
            c_in, p_h * p_w * self.features
        )
        y = x.astype(self.dtype) @ wmat.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(c_in * p_h * p_w), (self.features,)
            )
        else:
            bias = None
        if self.packed_out:
            if bias is not None:
                y = y + jnp.tile(bias.astype(self.dtype), p_h * p_w)
            return y
        lead = x.shape[:-3]
        y = y.reshape(*lead, h, w, p_h, p_w, self.features)
        nd = y.ndim
        y = y.transpose(*range(nd - 5), nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
        y = y.reshape(*lead, h * p_h, w * p_w, self.features)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class RealConv2d(nn.Module):
    """Strided patch conv + adaptive-pool to an exact (H/P, W/P) grid."""

    out_channels: int
    patch_size: Union[int, Tuple[int, int]] = 1
    overlap_ratio: float = 0.0
    use_bias: bool = True
    enforce_patch_grid: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed_in: bool = False) -> jnp.ndarray:
        p_h, p_w = _pair(self.patch_size)
        s_h, s_w = _stride(p_h, self.overlap_ratio), _stride(p_w, self.overlap_ratio)
        pad_h, pad_w = (p_h - 1) // 2, (p_w - 1) // 2
        if packed_in:
            # Input is pack_patches(x, p): the conv is exactly one dense
            # matmul (valid only for the clean stride==patch, pad-0 case —
            # callers gate on ``packed_patch_ok``).
            assert (s_h, s_w) == (p_h, p_w) and (pad_h, pad_w) == (0, 0)
            return _PatchDense(
                features=self.out_channels,
                patch=(p_h, p_w),
                use_bias=self.use_bias,
                dtype=self.dtype,
                packed_in=True,
                name="Conv_0",
            )(x)
        h, w = x.shape[-3], x.shape[-2]
        c_in = x.shape[-1]
        if (
            _PATCH_DENSE
            and (s_h, s_w) == (p_h, p_w)
            and (pad_h, pad_w) == (0, 0)
            and h % p_h == 0
            and w % p_w == 0
            and p_h * p_w > 1
        ):
            # Opt-in (see _PATCH_DENSE above): space-to-depth + one dense
            # matmul.  _PatchDense is named/parameterized exactly like the
            # nn.Conv it replaces, so checkpoints are interchangeable.
            return _PatchDense(
                features=self.out_channels,
                patch=(p_h, p_w),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
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
    def __call__(self, x: jnp.ndarray, packed_out: bool = False) -> jnp.ndarray:
        p_h, p_w = _pair(self.patch_size)
        s_h, s_w = _stride(p_h, self.overlap_ratio), _stride(p_w, self.overlap_ratio)
        pad_h, pad_w = (p_h - 1) // 2, (p_w - 1) // 2
        if packed_out:
            assert (s_h, s_w) == (p_h, p_w) and (pad_h, pad_w) == (0, 0)
            return _PatchDenseTranspose(
                features=self.out_channels,
                patch=(p_h, p_w),
                use_bias=self.use_bias,
                dtype=self.dtype,
                packed_out=True,
                name="ConvTranspose_0",
            )(x)
        h, w = x.shape[-3], x.shape[-2]
        c_in = x.shape[-1]
        if (
            _PATCH_DENSE
            and (s_h, s_w) == (p_h, p_w)
            and (pad_h, pad_w) == (0, 0)
            and p_h * p_w > 1
        ):
            # Mirror of the RealConv2d fast path (see _PatchDense notes).
            return _PatchDenseTranspose(
                features=self.out_channels,
                patch=(p_h, p_w),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="ConvTranspose_0",
            )(x)
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
