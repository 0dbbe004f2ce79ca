"""Spectral (Fourier) convolution ops, channels-last.

The core FNO primitive (reference math at ``models/enc_dec_fno.py:184-222``):
rfft2 (ortho) -> complex channel-mixing on a truncated mode corner (top +
bottom rows, low columns) -> irfft2, plus a 1x1 conv residual.

TPU notes: XLA lowers the complex einsum to real MXU matmuls; the mode
truncation keeps the contraction batched over at most ``2*m1*m2`` modes.
Weights are stored as a real array with a trailing [re, im] axis so optax
treats them as ordinary parameters.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init


def spectral_conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    modes1: int,
    modes2: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Truncated-mode spectral convolution.

    x: (B, H, W, Cin) real; weight: (Cin, Cout, m1, m2, 2) real ([re, im]).
    Returns (B, H, W, Cout) real.

    ``use_pallas`` routes the mode-space channel mixing through the fused
    Pallas kernel (ops/pallas_spectral.py).  Measured on v5e: parity with
    XLA at C >= 128 (1.31 vs 1.31 ms @ B32 M1024 C256), slightly behind at
    small channel counts (1.99 vs 1.63 ms @ B4 M220 C48) because channels
    pad to the 128-lane boundary — hence XLA is the default and the kernel
    is the scaling path for wide models.
    """
    h, w = x.shape[-3], x.shape[-2]
    x_ft = jnp.fft.rfft2(x, axes=(-3, -2), norm="ortho")  # (B, H, Wf, Cin)
    wf = x_ft.shape[-2]
    m1 = min(modes1, h)
    m2 = min(modes2, wf)
    if m1 == 0 or m2 == 0:
        y_ft = jnp.zeros((*x.shape[:-1], weight.shape[1]), dtype=x_ft.dtype)
        return jnp.fft.irfft2(y_ft, s=(h, w), axes=(-3, -2), norm="ortho")

    top = x_ft[:, :m1, :m2, :]  # (B, m1, m2, Cin)
    bot = x_ft[:, -m1:, :m2, :]
    if use_pallas:
        from tante_tpu.ops.pallas_spectral import spectral_mode_matmul

        bsz = x.shape[0]
        c_in, c_out_ = weight.shape[0], weight.shape[1]
        # Both corners share the weight: stack them into one mode batch.
        corners = jnp.concatenate([top, bot], axis=0)  # (2B, m1, m2, Cin)
        xr = corners.real.reshape(2 * bsz, m1 * m2, c_in)
        xi = corners.imag.reshape(2 * bsz, m1 * m2, c_in)
        w_crop = weight[:, :, :m1, :m2]  # (Cin, Cout, m1, m2, 2)
        w_re = jnp.transpose(w_crop[..., 0], (2, 3, 0, 1)).reshape(m1 * m2, c_in, c_out_)
        w_im = jnp.transpose(w_crop[..., 1], (2, 3, 0, 1)).reshape(m1 * m2, c_in, c_out_)
        o_re, o_im = spectral_mode_matmul(xr, xi, w_re, w_im)
        out = (o_re + 1j * o_im).reshape(2 * bsz, m1, m2, c_out_)
        out_top, out_bot = out[:bsz], out[bsz:]
    else:
        w_c = (weight[..., 0] + 1j * weight[..., 1])[:, :, :m1, :m2]
        out_top = jnp.einsum("bijc,coij->bijo", top, w_c)
        out_bot = jnp.einsum("bijc,coij->bijo", bot, w_c)

    c_out = weight.shape[1]
    y_ft = jnp.zeros((x.shape[0], h, wf, c_out), dtype=x_ft.dtype)
    y_ft = y_ft.at[:, :m1, :m2, :].set(out_top)
    y_ft = y_ft.at[:, -m1:, :m2, :].set(out_bot)
    return jnp.fft.irfft2(y_ft, s=(h, w), axes=(-3, -2), norm="ortho")


def spectral_conv2d_centered(
    x: jnp.ndarray, weight: jnp.ndarray, modes1: int, modes2: int
) -> jnp.ndarray:
    """Centered-mode spectral convolution (neuralop-style mode selection).

    Keeps the ``ceil(m1/2)`` lowest positive and ``floor(m1/2)`` lowest
    negative H-frequencies and the first ``m2r = m2//2 + 1`` rfft columns,
    with ONE weight tensor covering all kept modes (total ``m1 * m2r``),
    matching the parameter count of ``neuralop.models.FNO`` (the reference's
    backend, ``models/fno.py:4,94-100``).

    x: (B, H, W, Cin); weight: (Cin, Cout, m1, m2r, 2). Returns (B, H, W, Cout).
    """
    h, w = x.shape[-3], x.shape[-2]
    x_ft = jnp.fft.rfft2(x, axes=(-3, -2), norm="ortho")
    wf = x_ft.shape[-2]
    m1 = min(modes1, h)
    m2r = min(modes2 // 2 + 1, wf)
    m1_pos = (m1 + 1) // 2
    m1_neg = m1 - m1_pos

    w_c = weight[..., 0] + 1j * weight[..., 1]  # (Cin, Cout, m1, m2r_full)
    w_c = w_c[:, :, :, :m2r]
    c_out = weight.shape[1]
    y_ft = jnp.zeros((x.shape[0], h, wf, c_out), dtype=x_ft.dtype)

    top = x_ft[:, :m1_pos, :m2r, :]
    y_ft = y_ft.at[:, :m1_pos, :m2r, :].set(
        jnp.einsum("bijc,coij->bijo", top, w_c[:, :, :m1_pos])
    )
    if m1_neg > 0:
        bot = x_ft[:, -m1_neg:, :m2r, :]
        y_ft = y_ft.at[:, -m1_neg:, :m2r, :].set(
            jnp.einsum("bijc,coij->bijo", bot, w_c[:, :, m1_pos:])
        )
    return jnp.fft.irfft2(y_ft, s=(h, w), axes=(-3, -2), norm="ortho")


def spectral_conv3d_centered(
    x: jnp.ndarray, weight: jnp.ndarray, modes1: int, modes2: int, modes3: int
) -> jnp.ndarray:
    """Centered-mode 3-D spectral convolution (neuralop-style selection).

    The 3-D constructor path of the reference FNO (``models/fno.py:102-106``
    builds 3-D mode tuples for ``neuralop.models.FNO``): rfftn over (D, H, W),
    keep the centered ``m1``/``m2`` frequencies of the two full axes (positive
    ``ceil(m/2)`` + negative ``floor(m/2)``) and the first ``m3r = m3//2 + 1``
    one-sided W columns, one weight tensor over all kept modes.

    x: (B, D, H, W, Cin); weight: (Cin, Cout, m1, m2, m3r, 2).
    Returns (B, D, H, W, Cout).
    """
    d, h, w = x.shape[1:4]
    x_ft = jnp.fft.rfftn(x, axes=(1, 2, 3), norm="ortho")  # (B, D, H, Wf, Cin)
    wf = x_ft.shape[3]
    m1 = min(modes1, d)
    m2 = min(modes2, h)
    m3r = min(modes3 // 2 + 1, wf)
    m1p, m1n = (m1 + 1) // 2, m1 - (m1 + 1) // 2
    m2p, m2n = (m2 + 1) // 2, m2 - (m2 + 1) // 2

    w_c = (weight[..., 0] + 1j * weight[..., 1])[:, :, :, :, :m3r]
    c_out = weight.shape[1]
    y_ft = jnp.zeros((x.shape[0], d, h, wf, c_out), dtype=x_ft.dtype)

    # Four centered corners: (pos/neg D-frequencies) x (pos/neg H-frequencies).
    corners = [
        (slice(0, m1p), slice(0, m1p)),
        (slice(d - m1n, d), slice(m1p, m1)) if m1n else None,
    ]
    corners_h = [
        (slice(0, m2p), slice(0, m2p)),
        (slice(h - m2n, h), slice(m2p, m2)) if m2n else None,
    ]
    for c1 in corners:
        if c1 is None:
            continue
        sl1, wsl1 = c1
        for c2 in corners_h:
            if c2 is None:
                continue
            sl2, wsl2 = c2
            block = x_ft[:, sl1, sl2, :m3r, :]
            y_ft = y_ft.at[:, sl1, sl2, :m3r, :].set(
                jnp.einsum("bijkc,coijk->bijko", block, w_c[:, :, wsl1, wsl2])
            )
    return jnp.fft.irfftn(y_ft, s=(d, h, w), axes=(1, 2, 3), norm="ortho")


class SpectralLayer(nn.Module):
    """Spectral conv + 1x1 conv residual (reference ``SpectralLayer``)."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.in_channels
        scale = 1.0 / (self.in_channels * self.out_channels) ** 0.5

        def w_init(key, shape, dtype=jnp.float32):
            import jax

            # complex-normal with unit total variance, scaled (matches
            # torch.randn(cfloat) * scale at enc_dec_fno.py:191-194).
            return jax.random.normal(key, shape, dtype) * (scale / 2**0.5)

        weight = self.param(
            "weight",
            w_init,
            (self.in_channels, self.out_channels, self.modes1, self.modes2, 2),
        )
        y = spectral_conv2d(x.astype(jnp.float32), weight, self.modes1, self.modes2)
        s = nn.Conv(
            features=self.out_channels,
            kernel_size=(1, 1),
            use_bias=True,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.in_channels),
            dtype=self.dtype,
            name="w0",
        )(x)
        return s + y.astype(s.dtype)
