"""CNN encoder/decoder pyramids for TANTE (channels-last).

TPU-native re-design of reference ``models/enc_dec_cnn.py:187-277``: a
3-stage strided-conv pyramid whose per-stage patch sizes come from
``PATCH_MAP[patch_scale]``; frames are folded into the batch axis so every
conv is one large NHWC convolution on the MXU.

Shape contract: encoder (B, T, H, W, C_in) -> (B, T, H_p, W_p, C_embed);
decoder mirrors back.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.ops.convs import RealConv2d, RealTransConv2d

def _gelu(z: jnp.ndarray) -> jnp.ndarray:
    """Inter-stage GELU (reference ``nn.GELU()`` = exact erf form).

    Under a bf16 compute dtype the tanh approximation is used instead: its
    deviation from exact erf-GELU (<= ~1.5e-3 relative) is below bf16's own
    quantization step (2^-8 ~= 3.9e-3), while erf costs ~2x on the VPU —
    measured ~0.1 ms per 12.6 MB pyramid intermediate at the bench
    geometry.  f32 runs keep the exact form (numerical-parity tests)."""
    approx = z.dtype == jnp.bfloat16
    return nn.gelu(z, approximate=approx)


# patch_scale -> per-stage patch sizes (reference enc_dec_cnn.py:39-46).
PATCH_MAP = {
    64: (4, 4, 4),
    32: (4, 4, 2),
    16: (4, 2, 2),
    8: (2, 2, 2),
    4: (2, 2, 1),
    2: (2, 1, 1),
}


class EncCNN(nn.Module):
    dset_metadata: Optional[TanteMetadata] = None
    embed_dim: int = 256
    patch_scale: int = 64
    overlap_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed_in: bool = False) -> jnp.ndarray:
        """packed_in: x is ``pack_patches(frames, p[0])`` — stage 1 becomes
        one dense matmul (no conv, no space-to-depth).  Used by the latent
        rollout so the decode->encode round trip never materializes the
        physical-layout frame (docs/PERF.md round 3)."""
        from tante_tpu.ops.convs import pack_patches, packed_patch_ok

        p = PATCH_MAP[self.patch_scale]
        b, t = x.shape[0], x.shape[1]
        z = x.reshape(b * t, *x.shape[2:])  # (B*T, H, W, C)
        stages = [
            RealConv2d(self.embed_dim // 4, p[0], self.overlap_ratio, dtype=self.dtype),
            RealConv2d(self.embed_dim // 2, p[1], self.overlap_ratio, dtype=self.dtype),
            RealConv2d(self.embed_dim, p[2], self.overlap_ratio, dtype=self.dtype),
        ]
        if packed_in == "morton":
            from tante_tpu.ops.convs import morton_pyramid_ok

            assert morton_pyramid_ok(p, self.overlap_ratio), (
                "packed_in='morton' requires a clean pyramid — gate with "
                "TANTE.morton_io_ok()"
            )
            # Morton-packed CONSTANT-ROW pyramid: frames arrive as
            # (B*T, H_p*W_p, g*p0*p0*C_in) quad-tree rows with
            # g = (p1*p2)**2 — one row per FINAL latent pixel, carrying all
            # of that pixel's receptive field in morton order.  Every stage
            # is then one matmul with the block-diagonal kron(I_gi, W) of
            # its own conv kernel (identical parameters, gi = remaining
            # sub-pixels per row), so the whole pyramid runs with ZERO
            # reshapes/relayouts and all operands keep >=128 lanes.  The
            # output rows ARE the row-major (H_p, W_p) latent grid.
            md = self.dset_metadata
            res = md.spatial_resolution if md else (128, 384)
            g = (p[1] * p[2]) ** 2
            z = stages[0](z, packed_in=True, packed_group=g)
            z = _gelu(z)
            z = stages[1](z, packed_in=True, packed_group=g // (p[1] * p[1]))
            z = _gelu(z)
            z = stages[2](z, packed_in=True, packed_group=1)
            hp, wp = res[0] // self.patch_scale, res[1] // self.patch_scale
            return z.reshape(b, t, hp, wp, self.embed_dim)
        if packed_in and all(packed_patch_ok(pi, self.overlap_ratio) or pi == 1 for pi in p):
            # All-dense pyramid: the input is already packed for stage 1,
            # and each interior boundary re-packs the (fat-channel) stage
            # output — every "conv" is one matmul, no conv emitter anywhere.
            # Only taken on the packed rollout path: for physical-layout
            # input the stage-1 space-to-depth on the thin-channel frame is
            # slower than XLA's conv (docs/PERF.md round 2/3).
            z = stages[0](z, packed_in=True)
            z = _gelu(z)
            z = stages[1](pack_patches(z, p[1]) if p[1] > 1 else z, packed_in=p[1] > 1)
            z = _gelu(z)
            z = stages[2](pack_patches(z, p[2]) if p[2] > 1 else z, packed_in=p[2] > 1)
            return z.reshape(b, t, *z.shape[1:])
        z = stages[0](z, packed_in=packed_in)
        z = _gelu(z)
        z = stages[1](z)
        z = _gelu(z)
        z = stages[2](z)
        return z.reshape(b, t, *z.shape[1:])  # (B, T, H_p, W_p, C)


class DecCNN(nn.Module):
    dset_metadata: Optional[TanteMetadata] = None
    embed_dim: int = 256
    patch_scale: int = 64
    overlap_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed_out: bool = False) -> jnp.ndarray:
        """packed_out: return ``pack_patches(frames, p[0])`` instead of the
        physical frame — the final depth-to-space is skipped (inverse of
        ``EncCNN(packed_in=True)``)."""
        from tante_tpu.ops.convs import packed_patch_ok, unpack_patches

        p = PATCH_MAP[self.patch_scale]
        out_channels = self.dset_metadata.n_fields if self.dset_metadata else 4
        b, t = x.shape[0], x.shape[1]
        z = x.reshape(b * t, *x.shape[2:])  # (B*T, H_p, W_p, C)
        stages = [
            RealTransConv2d(self.embed_dim // 2, p[2], self.overlap_ratio, dtype=self.dtype),
            RealTransConv2d(self.embed_dim // 4, p[1], self.overlap_ratio, dtype=self.dtype),
            RealTransConv2d(out_channels, p[0], self.overlap_ratio, dtype=self.dtype),
        ]
        if packed_out == "morton":
            from tante_tpu.ops.convs import morton_pyramid_ok

            assert morton_pyramid_ok(p, self.overlap_ratio), (
                "packed_out='morton' requires a clean pyramid — gate with "
                "TANTE.morton_io_ok()"
            )
            # Morton mirror of EncCNN(packed_in='morton'): the CONSTANT-ROW
            # pyramid in reverse.  Rows stay (H_p*W_p) throughout — each row
            # accumulates its latent pixel's expanding receptive field as
            # fat morton-ordered channels via kron(I_gi, W) block-diagonal
            # stage matmuls (identical conv parameters).  Zero reshapes,
            # all operands >=128 lanes.  Returns frames as
            # (B, T, H_p*W_p, g*p0*p0*C_out) with g = (p1*p2)**2.
            z = z.reshape(b * t, -1, z.shape[-1])  # (BT, H_p*W_p, C)
            z = stages[0](z, packed_out=True, packed_group=1)
            z = _gelu(z)
            z = stages[1](z, packed_out=True, packed_group=p[2] * p[2])
            z = _gelu(z)
            z = stages[2](
                z, packed_out=True, packed_group=(p[1] * p[2]) ** 2
            )
            return z.reshape(b, t, *z.shape[1:])
        if packed_out and all(packed_patch_ok(pi, self.overlap_ratio) or pi == 1 for pi in p):
            # All-dense mirror of EncCNN's packed pyramid: each stage is one
            # matmul emitting the packed layout; interior boundaries unpack
            # (a cheap fat-channel depth-to-space) because the next stage's
            # patches regroup pixels.  The FINAL stage stays packed — the
            # caller (latent rollout) consumes pack_patches frames.
            z = stages[0](z, packed_out=p[2] > 1)
            z = _gelu(z)
            if p[2] > 1:
                z = unpack_patches(z, p[2])
            z = stages[1](z, packed_out=p[1] > 1)
            z = _gelu(z)
            if p[1] > 1:
                z = unpack_patches(z, p[1])
            z = stages[2](z, packed_out=True)
            return z.reshape(b, t, *z.shape[1:])
        z = stages[0](z)
        z = _gelu(z)
        z = stages[1](z)
        z = _gelu(z)
        z = stages[2](z, packed_out=packed_out)
        return z.reshape(b, t, *z.shape[1:])  # (B, T, H, W, C_out)
