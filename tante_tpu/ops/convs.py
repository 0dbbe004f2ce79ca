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

from typing import Any, Tuple, Union

import flax.linen as nn
import jax
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


def morton_pack(x: jnp.ndarray, ps: Tuple[int, int, int]) -> jnp.ndarray:
    """Hierarchical (quad-tree / Morton) space-to-depth for a 3-stage patch
    pyramid: ``(..., H, W, C) -> (..., N, p0*p0*C)`` with ``N = H*W/p0**2``.

    ``ps = (p0, p1, p2)`` are the per-stage patch sizes (``PATCH_MAP``
    order: stage 0 consumes p0-patches of the physical frame).  Rows are
    ordered ``(h_c, w_c, h2, w2, h1, w1)`` where ``h = ((h_c*p2 + h2)*p1 +
    h1)*p0 + h0``; the p0-level lives in channels with order ``(h0, w0, c)``
    — the same channel order as ``pack_patches(x, p0)``.

    Why: with rows in this order, every interior boundary of the packed
    enc/dec pyramid (``EncCNN(packed_in='morton')`` /
    ``DecCNN(packed_out='morton')``) groups pi*pi CONSECUTIVE rows into one
    patch, so the re-pack between stages is a pure reshape instead of an
    XLA transpose, and the coarsest level comes out exactly row-major —
    i.e. equal to the (H_p, W_p) latent grid.  Measured at the bench
    geometry this removes ~0.35 ms/call of re-pack copies from the rollout
    hot loop (docs/PERF.md round 3).
    """
    p0, p1, p2 = ps
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    s = p0 * p1 * p2
    hc, wc = h // s, w // s
    z = x.reshape(*lead, hc, p2, p1, p0, wc, p2, p1, p0, c)
    l = z.ndim - 9
    z = z.transpose(
        *range(l), l, l + 4, l + 1, l + 5, l + 2, l + 6, l + 3, l + 7, l + 8
    )
    return z.reshape(*lead, hc * wc * p2 * p2 * p1 * p1, p0 * p0 * c)


def morton_pyramid_ok(ps: Tuple[int, int, int], overlap_ratio: float) -> bool:
    """Single gate for the morton constant-row pyramid: every stage is a
    clean space-to-depth (or pointwise) and the physical boundary stage is
    a real patch.  Shared by ``TANTE.morton_io_ok`` and the EncCNN/DecCNN
    morton branches so the model-level gate and the branch condition can
    never diverge."""
    return packed_patch_ok(ps[0], overlap_ratio) and all(
        pi == 1 or packed_patch_ok(pi, overlap_ratio) for pi in ps
    )


def morton_group_factor(ps: Tuple[int, int, int]) -> int:
    """Rows-per-latent-pixel grouping of the morton FRAME layout: one row
    per final latent pixel carrying its whole receptive field."""
    return (ps[1] * ps[2]) ** 2


def morton_pack_grouped(x: jnp.ndarray, ps: Tuple[int, int, int]) -> jnp.ndarray:
    """``morton_pack`` + the constant-row grouping: (..., H, W, C) ->
    (..., H_p*W_p, g*p0*p0*C) with g = (p1*p2)**2 — the frame layout the
    EncCNN/DecCNN morton branches consume/produce."""
    z = morton_pack(x, ps)
    g = morton_group_factor(ps)
    return z.reshape(*z.shape[:-2], z.shape[-2] // g, g * z.shape[-1])


def morton_unpack_grouped(
    z: jnp.ndarray, ps: Tuple[int, int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of ``morton_pack_grouped``."""
    g = morton_group_factor(ps)
    y = z.reshape(*z.shape[:-2], z.shape[-2] * g, z.shape[-1] // g)
    return morton_unpack(y, ps, hw)


def morton_unpack(
    z: jnp.ndarray, ps: Tuple[int, int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of ``morton_pack``: ``(..., N, p0*p0*C) -> (..., H, W, C)``.

    ``hw`` is the physical (H, W) (the flat row count alone cannot
    disambiguate the aspect ratio)."""
    p0, p1, p2 = ps
    h, w = hw
    c = z.shape[-1] // (p0 * p0)
    lead = z.shape[:-2]
    s = p0 * p1 * p2
    hc, wc = h // s, w // s
    y = z.reshape(*lead, hc, wc, p2, p2, p1, p1, p0, p0, c)
    l = y.ndim - 9
    y = y.transpose(
        *range(l), l, l + 2, l + 4, l + 6, l + 1, l + 3, l + 5, l + 7, l + 8
    )
    return y.reshape(*lead, h, w, c)


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
    # Morton row-grouping (see ``morton_group``): input rows carry ``group``
    # consecutive packed pixels, so the matmul weight is the block-diagonal
    # kron(I_g, W) — identical parameters, full-lane operands.
    group: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = self.patch
        if self.packed_in:
            c_in = x.shape[-1] // (p_h * p_w * self.group)
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
        wmat = kernel.reshape(p_h * p_w * c_in, self.features).astype(self.dtype)
        if self.group > 1:
            eye = jnp.eye(self.group, dtype=self.dtype)
            wmat = jnp.kron(eye, wmat)  # block-diag: (g*K, g*N)
            # Materialize the block-diag weight instead of letting XLA fuse
            # its construction into the dot (which demotes the matmul to a
            # VPU fusion); as a loop-invariant value it is then hoisted out
            # of rollout scan bodies and built once.
            wmat = jax.lax.optimization_barrier(wmat)
        y = z.astype(self.dtype) @ wmat
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(c_in * p_h * p_w), (self.features,)
            ).astype(self.dtype)
            if self.group > 1:
                bias = jnp.tile(bias, self.group)
            y = y + bias
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
    # Morton row-grouping (see ``morton_group``): only valid with
    # packed_out; each row carries ``group`` input pixels and emits
    # group*p*p*features packed output channels via kron(I_g, W).
    group: int = 1
    # Initializers default to the torch-parity forms; callers replacing an
    # nn.ConvTranspose with different inits (e.g. DPOT's trunc_normal)
    # override to stay checkpoint-compatible.
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p_h, p_w = self.patch
        c_in = x.shape[-1] // self.group
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_kernel_init,
            (p_h, p_w, c_in, self.features),
        )
        # (ph, pw, ci, co) -> (ci, ph*pw*co): each input pixel expands to a
        # (ph, pw) patch of co-channel outputs.  lax.conv_transpose (flax's
        # backend, transpose_kernel=False) mirrors the kernel spatially, so
        # flip to match its convention exactly.
        wmat = (
            kernel[::-1, ::-1]
            .transpose(2, 0, 1, 3)
            .reshape(c_in, p_h * p_w * self.features)
            .astype(self.dtype)
        )
        if self.group > 1:
            assert self.packed_out
            wmat = jnp.kron(jnp.eye(self.group, dtype=self.dtype), wmat)
            wmat = jax.lax.optimization_barrier(wmat)  # see _PatchDense
        y = x.astype(self.dtype) @ wmat
        if self.use_bias:
            bias = self.param(
                "bias",
                self.bias_init or torch_bias_init(c_in * p_h * p_w),
                (self.features,),
            )
        else:
            bias = None
        if self.packed_out:
            if bias is not None:
                y = y + jnp.tile(bias.astype(self.dtype), p_h * p_w * self.group)
            return y
        h, w = x.shape[-3], x.shape[-2]
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
    def __call__(
        self, x: jnp.ndarray, packed_in: bool = False, packed_group: int = 1
    ) -> jnp.ndarray:
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
                group=packed_group,
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
    def __call__(
        self, x: jnp.ndarray, packed_out: bool = False, packed_group: int = 1
    ) -> jnp.ndarray:
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
                group=packed_group,
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


def depthwise_conv2d_lanes(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depthwise KxK 'same' conv as shift-and-add over a (W*C)-flat minor axis.

    XLA's grouped-conv lowering for NHWC depthwise convs keeps C in the lane
    (minor) dimension — at ConvNeXt widths (C=15..240 here, reference
    ``models/unet_convnext.py:103-111``) that leaves most of the 128 VPU
    lanes idle (measured 864 us for the 128x384x15 7x7 block, ~12% lane
    utilization).  Flattening (W, C) into one minor axis fills the lanes and
    turns the conv into K*K fused multiply-adds: a shift by dx columns is a
    slice at offset dx*C of the padded flat axis, a shift by dy rows stays in
    the sublane axis.  Accumulation is f32 (like XLA's conv accumulator),
    output in x.dtype.

    MEASURED CONTEXT CAVEAT (round 5): this form wins the isolated op A/B
    2.2x over the grouped conv (scripts/dwconv_ab.py) but LOSES 2.7x inside
    UNetConvNext's per-stage ``nn.scan`` while bodies, where the K*K-tap
    f32 chain fails to fuse (scripts/dwconv_inmodel_ab.py: grouped 636 /
    dense 546 / lane-flat 233 f/s whole-model).  Measure in context before
    adopting; ConvNextBlock uses the grouped conv for exactly this reason.

    kernel: flax grouped-conv layout (kh, kw, 1, C); bias: (C,).
    """
    b, h, w, c = x.shape
    kh, kw, _, cc = kernel.shape
    if cc != c:
        raise ValueError(
            f"depthwise kernel channels {cc} != input channels {c} "
            f"(kernel {kernel.shape}, x {x.shape})"
        )
    if kh % 2 == 0 or kw % 2 == 0:
        # Even kernels: this pads (k//2, (k-1)//2) per side, the REVERSE of
        # flax/XLA 'SAME' ((k-1)//2, k//2) — drop-in parity with nn.Conv
        # holds for odd kernels only (all in-repo users are 3/5/7).
        raise ValueError(f"depthwise_conv2d_lanes requires odd kernels, got {(kh, kw)}")
    ph0, ph1 = kh // 2, (kh - 1) // 2
    pw0, pw1 = kw // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    xf = xp.reshape(b, h + kh - 1, (w + kw - 1) * c)
    acc = None
    for i in range(kh):
        row = xf[:, i : i + h]
        for j in range(kw):
            seg = row[:, :, j * c : j * c + w * c]
            wij = jnp.tile(kernel[i, j, 0].astype(x.dtype), w)
            term = (seg * wij).astype(jnp.float32)
            acc = term if acc is None else acc + term
    y = acc.reshape(b, h, w, c)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class DepthwiseConv2d(nn.Module):
    """Param-tree-compatible drop-in for ``nn.Conv(feature_group_count=C)``
    routed through :func:`depthwise_conv2d_lanes` (same 'kernel'/'bias'
    names and shapes, so checkpoints and torch transplants are unchanged)."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Any = torch_kernel_init
    bias_init: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.features:
            raise ValueError(
                f"DepthwiseConv2d(features={self.features}) got input with "
                f"{x.shape[-1]} channels (shape {x.shape})"
            )
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, 1, self.features)
        )
        bias_init = self.bias_init or torch_bias_init(kh * kw)
        bias = self.param("bias", bias_init, (self.features,))
        return depthwise_conv2d_lanes(x.astype(self.dtype), kernel, bias)
