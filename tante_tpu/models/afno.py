"""AFNO baseline — FourCastNet-style Adaptive Fourier Neural Operator.

Capabilities mirrored from reference ``models/afno.py:169-278``: conv patch
embed over T-folded channels, learned pos embed (0.02 trunc-normal), N
blocks of [LayerNorm -> Fourier token mixer -> double skip -> LayerNorm ->
MLP(ratio 4)], transposed-conv de-patch, one frame out.

Deviation (documented, not ported): the reference's mixer calls rfftn with
a *reversed* dim tuple and then inverse-transforms with the size list
zipped against those reversed dims, followed by a compensating transpose
(``afno.py:106-115,155``).  On non-square grids this silently truncates and
zero-pads swapped frequency axes.  This implementation performs the
upstream-correct operation: rfft2 over (H, W), block-diagonal complex MLP,
softshrink sparsity, irfft2 back to (H, W) — no transpose needed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.ops.fourier import block_diag_complex_matmul, softshrink
from tante_tpu.ops.activations import gelu
from tante_tpu.ops import spectral as _spectral
from tante_tpu.ops.spectral import (
    _partial_irdft2,
    _partial_rdft2,
    _partial_rdft_mats,
)

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class AFNOFilter(nn.Module):
    """rfft2 -> blockdiag complex MLP with split-GELU -> softshrink -> irfft2."""

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Rank-agnostic: spatial axes are everything between batch and
        # channels ((H, W) for 2-D patches, (D, H, W) for the 3-D path —
        # reference AFNO_ND, ``models/afno.py:196-218``).
        axes = tuple(range(1, x.ndim - 1))
        sizes = x.shape[1:-1]
        nb = self.num_blocks
        bs = self.hidden_size // nb
        assert self.hidden_size % nb == 0

        def w_init(key, shape, dtype=jnp.float32):
            import jax

            # 0.02 * complex-normal (reference ComplexBlockLinear scale).
            return 0.02 * jax.random.normal(key, shape, dtype) / 2**0.5

        w1 = self.param("w1", w_init, (2, nb, bs, bs))
        w2 = self.param("w2", w_init, (2, nb, bs, bs))

        orig_dtype = x.dtype
        if len(axes) == 2 and _spectral._SPECTRAL_DFT:
            # Full-mode dense rDFT2 as MXU matmuls: AFNO keeps EVERY mode
            # (no truncation), but the patch grid is tiny (16x48 at the
            # bench geometry) so the square DFT matrices are small and the
            # contraction is MXU-native — XLA has no TPU FFT and its
            # mixed-radix twiddle fusions dominated this model's rollout
            # (docs/PERF.md round 4).  m1_pos=H, m1_neg=0, m2r=W//2+1 makes
            # _partial_rdft_mats exact rfft2/irfft2 (f32 rounding only).
            h, w = sizes
            mats = _partial_rdft_mats(h, w, h, 0, w // 2 + 1, norm="ortho")
            re, im = _partial_rdft2(x, mats)
            re = re.reshape(*re.shape[:-1], nb, bs)
            im = im.reshape(*im.shape[:-1], nb, bs)
            re, im = block_diag_complex_matmul(re, im, w1[0], w1[1])
            re, im = gelu(re), gelu(im)
            re, im = block_diag_complex_matmul(re, im, w2[0], w2[1])
            re = softshrink(re, self.sparsity_threshold)
            im = softshrink(im, self.sparsity_threshold)
            re = re.reshape(*re.shape[:-2], self.hidden_size)
            im = im.reshape(*im.shape[:-2], self.hidden_size)
            return _partial_irdft2(re, im, mats, out_dtype=orig_dtype)
        xf = jnp.fft.rfftn(x.astype(jnp.float32), axes=axes, norm="ortho")
        xf = xf.reshape(*xf.shape[:-1], nb, bs)
        re, im = xf.real, xf.imag
        re, im = block_diag_complex_matmul(re, im, w1[0], w1[1])
        re, im = gelu(re), gelu(im)
        re, im = block_diag_complex_matmul(re, im, w2[0], w2[1])
        re = softshrink(re, self.sparsity_threshold)
        im = softshrink(im, self.sparsity_threshold)
        yf = (re + 1j * im).reshape(*re.shape[:-2], self.hidden_size)
        y = jnp.fft.irfftn(yf, s=sizes, axes=axes, norm="ortho")
        return y.astype(orig_dtype)


class AFNOBlock(nn.Module):
    hidden_dim: int
    mlp_ratio: float = 4.0
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    double_skip: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        y = AFNOFilter(
            self.hidden_dim,
            self.num_blocks,
            self.sparsity_threshold,
            dtype=self.dtype,
        )(y)
        if self.double_skip:
            y = y + residual
            residual = y
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
        z = nn.Dense(int(self.hidden_dim * self.mlp_ratio), kernel_init=trunc02, dtype=self.dtype)(z)
        z = gelu(z)
        z = nn.Dense(self.hidden_dim, kernel_init=trunc02, dtype=self.dtype)(z)
        return z + residual


class AFNO(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    hidden_dim: int = 256
    n_blocks: int = 12
    cmlp_diagonal_blocks: int = 8
    patch_size: int = 8
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    sparsity_threshold: float = 0.01
    output_length: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, *spatial, C) -> (B, 1, *spatial, C); spatial is (H, W) or
        (D, H, W) (reference Conv3d patch-embed path, ``models/afno.py:196-218``)."""
        b, t, c = x.shape[0], x.shape[1], x.shape[-1]
        spatial = x.shape[2:-1]
        p = self.patch_size
        patch = (p,) * len(spatial)
        z = jnp.moveaxis(x, 1, -2).reshape(b, *spatial, t * c)
        z = nn.Conv(
            self.hidden_dim,
            kernel_size=patch,
            strides=patch,
            padding="VALID",
            kernel_init=trunc02,
            dtype=self.dtype,
            name="patch_embed",
        )(z)
        pos = self.param(
            "pos_embed",
            trunc02,
            (1, *(s // p for s in spatial), self.hidden_dim),
        )
        z = z + pos
        z = nn.Dropout(self.drop_rate)(z, deterministic=deterministic)
        for _ in range(self.n_blocks):
            z = AFNOBlock(
                hidden_dim=self.hidden_dim,
                mlp_ratio=self.mlp_ratio,
                num_blocks=self.cmlp_diagonal_blocks,
                sparsity_threshold=self.sparsity_threshold,
                dtype=self.dtype,
            )(z)
        if len(patch) == 2:
            # Clean stride==kernel de-patch: matmul + depth-to-space instead
            # of XLA's input-dilated conv_transpose lowering (measured 10x+
            # slower on DPOT's identical op; parameter-compatible).
            from tante_tpu.ops.convs import _PatchDenseTranspose

            z = _PatchDenseTranspose(
                features=c,
                patch=tuple(patch),
                dtype=self.dtype,
                kernel_init=trunc02,
                bias_init=nn.initializers.zeros,  # nn.ConvTranspose default
                name="patch_debed",
            )(z)
        else:
            z = nn.ConvTranspose(
                c,
                kernel_size=patch,
                strides=patch,
                padding="VALID",
                kernel_init=trunc02,
                dtype=self.dtype,
                name="patch_debed",
            )(z)
        return z[:, None]  # (B, 1, *spatial, C)
