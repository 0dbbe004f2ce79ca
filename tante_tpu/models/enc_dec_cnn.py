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
        if packed_in and all(packed_patch_ok(pi, self.overlap_ratio) or pi == 1 for pi in p):
            # All-dense pyramid: the input is already packed for stage 1,
            # and each interior boundary re-packs the (fat-channel) stage
            # output — every "conv" is one matmul, no conv emitter anywhere.
            # Only taken on the packed rollout path: for physical-layout
            # input the stage-1 space-to-depth on the thin-channel frame is
            # slower than XLA's conv (docs/PERF.md round 2/3).
            z = stages[0](z, packed_in=True)
            z = nn.gelu(z, approximate=False)
            z = stages[1](pack_patches(z, p[1]) if p[1] > 1 else z, packed_in=p[1] > 1)
            z = nn.gelu(z, approximate=False)
            z = stages[2](pack_patches(z, p[2]) if p[2] > 1 else z, packed_in=p[2] > 1)
            return z.reshape(b, t, *z.shape[1:])
        z = stages[0](z, packed_in=packed_in)
        z = nn.gelu(z, approximate=False)
        z = stages[1](z)
        z = nn.gelu(z, approximate=False)
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
        if packed_out and all(packed_patch_ok(pi, self.overlap_ratio) or pi == 1 for pi in p):
            # All-dense mirror of EncCNN's packed pyramid: each stage is one
            # matmul emitting the packed layout; interior boundaries unpack
            # (a cheap fat-channel depth-to-space) because the next stage's
            # patches regroup pixels.  The FINAL stage stays packed — the
            # caller (latent rollout) consumes pack_patches frames.
            z = stages[0](z, packed_out=p[2] > 1)
            z = nn.gelu(z, approximate=False)
            if p[2] > 1:
                z = unpack_patches(z, p[2])
            z = stages[1](z, packed_out=p[1] > 1)
            z = nn.gelu(z, approximate=False)
            if p[1] > 1:
                z = unpack_patches(z, p[1])
            z = stages[2](z, packed_out=True)
            return z.reshape(b, t, *z.shape[1:])
        z = stages[0](z)
        z = nn.gelu(z, approximate=False)
        z = stages[1](z)
        z = nn.gelu(z, approximate=False)
        z = stages[2](z, packed_out=packed_out)
        return z.reshape(b, t, *z.shape[1:])  # (B, T, H, W, C_out)
