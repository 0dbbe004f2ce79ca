"""UNO baseline — U-shaped Neural Operator (ashiq24/UNO family).

Capabilities mirrored from reference ``models/uno.py:175-280``: sin/cos grid
features appended to the T-folded input, Linear lift 16 -> width, seven
``OperatorBlock``s (multi-resolution spectral conv + bicubic-resampled 1x1
conv) in an encoder--bottleneck--decoder with channel-concat skips at fixed
fractions D/4..D/32 of the input resolution, Linear projection back, one
frame out.

The UNO spectral conv changes spatial resolution *in Fourier space*
(truncate / zero-pad modes, "forward"-normalized FFTs so amplitudes rescale
with grid size, reference ``uno.py:112-138``).  Mode counts are clamped to
what the current input/output grids can hold (the reference would raise on
small grids; clamping extends the valid domain without changing behavior on
valid ones).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.common import TorchDense
from tante_tpu.ops.activations import gelu


def uno_spectral_conv(
    x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Resolution-changing spectral conv, channels-last.

    x: (B, H, W, Cin); w1/w2: (Cin, Cout, m1, m2, 2) for the positive /
    negative H-frequency rows; returns (B, H_out, W_out, Cout).
    """
    h_out, w_out = out_hw
    h, w = x.shape[1], x.shape[2]
    hf, wf = h, w // 2 + 1
    wf_out = w_out // 2 + 1
    m1 = min(w1.shape[2], hf // 2, h_out // 2)
    m2 = min(w1.shape[3], wf, wf_out)
    c_out = w1.shape[1]
    from tante_tpu.ops.spectral import (
        _SPECTRAL_DFT,
        _partial_irdft2,
        _partial_rdft2,
        _partial_rdft_mats,
    )

    if _SPECTRAL_DFT and m1 > 0 and m2 > 0:
        # Partial-DFT fast path (ops/spectral.py): compute only the kept
        # modes as dense matmuls; the inverse matrices are built for the
        # OUTPUT resolution, which makes the resolution change free.
        mats = _partial_rdft_mats(
            h, w, m1, m1, m2, norm="forward", h_out=h_out, w_out=w_out
        )
        xr, xi = _partial_rdft2(x, mats)
        w_cat = jnp.concatenate(
            [w1[:, :, :m1, :m2], w2[:, :, :m1, :m2]], axis=2
        )  # (Cin, Cout, 2m1, m2, 2)
        w_re, w_im = w_cat[..., 0], w_cat[..., 1]
        o_re = jnp.einsum("bijc,coij->bijo", xr, w_re) - jnp.einsum(
            "bijc,coij->bijo", xi, w_im
        )
        o_im = jnp.einsum("bijc,coij->bijo", xr, w_im) + jnp.einsum(
            "bijc,coij->bijo", xi, w_re
        )
        return _partial_irdft2(o_re, o_im, mats, out_dtype=x.dtype)

    x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="forward")

    y_ft = jnp.zeros((x.shape[0], h_out, wf_out, c_out), dtype=x_ft.dtype)
    # Degenerate levels (tiny inputs drive the U topology's D/32 stage to a
    # 1-pixel grid -> zero kept modes) contribute nothing spectrally, same
    # convention as ops/spectral.spectral_conv2d; the pointwise path of the
    # operator block still carries the signal.
    if m1 > 0 and m2 > 0:

        def cplx(w):
            return (w[..., 0] + 1j * w[..., 1])[:, :, :m1, :m2]

        top = jnp.einsum("bijc,coij->bijo", x_ft[:, :m1, :m2, :], cplx(w1))
        bot = jnp.einsum("bijc,coij->bijo", x_ft[:, -m1:, :m2, :], cplx(w2))
        y_ft = y_ft.at[:, :m1, :m2, :].set(top)
        y_ft = y_ft.at[:, -m1:, :m2, :].set(bot)
    return jnp.fft.irfft2(y_ft, s=(h_out, w_out), axes=(1, 2), norm="forward")


def bicubic_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H_out, W_out, C) cubic resize (reference uses
    torch bicubic with align_corners=True+antialias; jax.image.resize uses
    half-pixel centers — an acceptable, documented interpolation-phase
    difference)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, *out_hw, c), method="cubic")


class UNOOperatorBlock(nn.Module):
    out_codim: int
    modes1: int
    modes2: int
    non_lin: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
        c_in = x.shape[-1]
        scale = (1.0 / (2 * c_in)) ** 0.5

        def w_init(key, shape, dtype=jnp.float32):
            return jax.random.normal(key, shape, dtype) * (scale / 2**0.5)

        shape = (c_in, self.out_codim, self.modes1, self.modes2, 2)
        w1 = self.param("weights1", w_init, shape)
        w2 = self.param("weights2", w_init, shape)
        # dtype-gated inside _partial_rdft2/_partial_irdft2: bf16 stays
        # bf16 in field-space (f32 MXU accumulation); the FFT fallback
        # upcasts internally.
        y_spec = uno_spectral_conv(x, w1, w2, out_hw).astype(x.dtype)
        y_pw = nn.Conv(self.out_codim, kernel_size=(1, 1), dtype=self.dtype)(x)
        y_pw = bicubic_resize(y_pw.astype(jnp.float32), out_hw).astype(x.dtype)
        y = y_spec + y_pw
        if self.non_lin:
            y = gelu(y)
        return y


class UNO(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    width: int = 32
    pad: int = 0
    factor: int = 1
    output_length: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, 1, H, W, C)."""
        b, t, h, w, c = x.shape
        z = jnp.moveaxis(x, 1, -2).reshape(b, h, w, t * c)

        # sin/cos grid features (reference uno.py:271-280).
        gx = jnp.linspace(0, 2 * jnp.pi, h)[None, :, None, None]
        gy = jnp.linspace(0, 2 * jnp.pi, w)[None, None, :, None]
        grid = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.sin(gx), (b, h, w, 1)),
                jnp.broadcast_to(jnp.sin(gy), (b, h, w, 1)),
                jnp.broadcast_to(jnp.cos(gx), (b, h, w, 1)),
                jnp.broadcast_to(jnp.cos(gy), (b, h, w, 1)),
            ],
            axis=-1,
        ).astype(z.dtype)
        z = jnp.concatenate([z, grid], axis=-1)

        z_fc = TorchDense(16, dtype=self.dtype)(z)
        z_fc = gelu(z_fc)
        z0 = TorchDense(self.width, dtype=self.dtype)(z_fc)
        z0 = gelu(z0)

        if self.pad:
            z0 = jnp.pad(
                z0, ((0, 0), (self.pad, self.pad), (self.pad, self.pad), (0, 0))
            )
        d1, d2 = z0.shape[1], z0.shape[2]
        f, wd = self.factor, self.width

        block = lambda cod, m1, m2, name: UNOOperatorBlock(
            cod, m1, m2, dtype=self.dtype, name=name
        )
        c0 = block(2 * f * wd, 32, 33, "L0")(z0, (d1 // 4, d2 // 4))
        c1 = block(4 * f * wd, 8, 9, "L1")(c0, (d1 // 16, d2 // 16))
        c2 = block(8 * f * wd, 4, 5, "L2")(c1, (d1 // 32, d2 // 32))
        c3 = block(8 * f * wd, 4, 5, "L3")(c2, (d1 // 32, d2 // 32))
        c4 = block(4 * f * wd, 4, 5, "L4")(c3, (d1 // 16, d2 // 16))
        c4 = jnp.concatenate([c4, c1], axis=-1)
        c5 = block(2 * f * wd, 8, 9, "L5")(c4, (d1 // 4, d2 // 4))
        c5 = jnp.concatenate([c5, c0], axis=-1)
        c6 = block(wd, 32, 32, "L6")(c5, (d1, d2))
        c6 = jnp.concatenate([c6, z0], axis=-1)

        if self.pad:
            c6 = c6[:, self.pad : -self.pad, self.pad : -self.pad, :]

        y = TorchDense(3 * self.width, dtype=self.dtype)(c6)
        y = gelu(y)
        y = jnp.concatenate([y, z_fc], axis=-1)
        y = TorchDense(c, dtype=self.dtype)(y)
        return y[:, None]
