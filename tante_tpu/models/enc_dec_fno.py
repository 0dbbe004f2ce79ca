"""FNO-type encoder/decoder for TANTE (channels-last).

Re-design of reference ``models/enc_dec_fno.py:224-323``: the conv pyramid
interleaved with truncated-mode spectral layers; 2-stage patch factorization
(``FNO_PATCH_MAP``).  FFTs run through XLA's TPU FFT; the mode-space channel
mixing is a batched complex matmul (see ``ops/spectral.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.ops.convs import RealConv2d, RealTransConv2d
from tante_tpu.ops.spectral import SpectralLayer
from tante_tpu.ops.activations import gelu

# patch_scale -> 2-stage patch sizes (reference enc_dec_fno.py:39-46).
FNO_PATCH_MAP = {
    64: (8, 8),
    32: (8, 4),
    16: (4, 4),
    8: (4, 2),
    4: (2, 2),
    2: (2, 1),
}


class EncFNO(nn.Module):
    dset_metadata: Optional[TanteMetadata] = None
    embed_dim: int = 256
    modes: Tuple[int, int] = (32, 32)
    patch_scale: int = 64
    overlap_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = FNO_PATCH_MAP[self.patch_scale]
        m1, m2 = self.modes
        in_channels = x.shape[-1]
        b, t = x.shape[0], x.shape[1]
        z = x.reshape(b * t, *x.shape[2:])
        z = SpectralLayer(in_channels, self.embed_dim // 8, m1, m2, dtype=self.dtype)(z)
        z = gelu(z)
        z = RealConv2d(self.embed_dim // 4, p[0], self.overlap_ratio, dtype=self.dtype)(z)
        z = gelu(z)
        z = SpectralLayer(
            self.embed_dim // 4, self.embed_dim // 2, m1 // p[0], m2 // p[0], dtype=self.dtype
        )(z)
        z = gelu(z)
        z = RealConv2d(self.embed_dim, p[1], self.overlap_ratio, dtype=self.dtype)(z)
        return z.reshape(b, t, *z.shape[1:])


class DecFNO(nn.Module):
    dset_metadata: Optional[TanteMetadata] = None
    embed_dim: int = 256
    modes: Tuple[int, int] = (32, 32)
    patch_scale: int = 64
    overlap_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = FNO_PATCH_MAP[self.patch_scale]
        m1, m2 = self.modes
        out_channels = self.dset_metadata.n_fields if self.dset_metadata else 4
        b, t = x.shape[0], x.shape[1]
        z = x.reshape(b * t, *x.shape[2:])
        z = RealTransConv2d(self.embed_dim // 2, p[1], self.overlap_ratio, dtype=self.dtype)(z)
        z = gelu(z)
        z = SpectralLayer(
            self.embed_dim // 2, self.embed_dim // 4, m1 // p[0], m2 // p[0], dtype=self.dtype
        )(z)
        z = gelu(z)
        z = RealTransConv2d(self.embed_dim // 8, p[0], self.overlap_ratio, dtype=self.dtype)(z)
        z = gelu(z)
        z = SpectralLayer(self.embed_dim // 8, out_channels, m1, m2, dtype=self.dtype)(z)
        return z.reshape(b, t, *z.shape[1:])
