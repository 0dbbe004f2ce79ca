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

import os

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init

# Partial-DFT fast path: with m1*m2 kept modes far below the resolution,
# computing ONLY those modes as dense DFT matmuls beats full rfft2/irfft2
# by a wide margin on TPU (XLA has no native FFT — it lowers to mixed-radix
# twiddle fusions; measured at the TR geometry these are ~70% of an FNO
# rollout).  The matmuls contract the full H/W axes (128/384 at TR) — MXU
# native.  Mathematically exact (same linear transform, f32 rounding
# differs ~1e-6); the FFT path remains for large mode counts and as an
# escape hatch (TANTE_SPECTRAL_DFT=0).
_SPECTRAL_DFT = os.environ.get("TANTE_SPECTRAL_DFT", "1") == "1"


def _partial_rdft_mats(
    h: int,
    w: int,
    m1_pos: int,
    m1_neg: int,
    m2r: int,
    norm: str = "ortho",
    h_out: int | None = None,
    w_out: int | None = None,
):
    """DFT matrices for the kept-mode set: H-rows [0..m1_pos) and the
    m1_neg highest (negative) frequencies, rfft W-columns [0..m2r).  The
    inverse W matrices fold the hermitian-completion factor c_l (1 for
    l=0 and the Nyquist column, else 2), so

        fwd(x)  == rfft2(x, norm)[kept modes]
        inv(y)  == irfft2(zero-pad(y), s=(h_out, w_out), norm)

    exactly (up to f32 rounding).  ``h_out``/``w_out`` default to the
    input size; a different output size gives the resolution-changing
    spectral conv (UNO) — negative frequencies keep their index-from-end
    position in the output spectrum."""
    h_out = h if h_out is None else h_out
    w_out = w if w_out is None else w_out
    ks_in = np.concatenate([np.arange(m1_pos), np.arange(h - m1_neg, h)])
    ks_out = np.concatenate([np.arange(m1_pos), np.arange(h_out - m1_neg, h_out)])
    ls = np.arange(m2r)
    wn = np.arange(w)[:, None] * ls[None, :] * (2.0 * np.pi / w)
    hn = np.arange(h)[:, None] * ks_in[None, :] * (2.0 * np.pi / h)
    wn_o = np.arange(w_out)[:, None] * ls[None, :] * (2.0 * np.pi / w_out)
    hn_o = np.arange(h_out)[:, None] * ks_out[None, :] * (2.0 * np.pi / h_out)
    if norm == "ortho":
        fsw, fsh = np.sqrt(w), np.sqrt(h)
        isw, ish = np.sqrt(w_out), np.sqrt(h_out)
    elif norm == "forward":  # rfft2 scales by 1/N, irfft2 by 1
        fsw, fsh = w, h
        isw, ish = 1.0, 1.0
    else:
        raise ValueError(norm)
    fw_cos, fw_sin = np.cos(wn) / fsw, np.sin(wn) / fsw  # (w, m2r)
    fh_cos, fh_sin = np.cos(hn) / fsh, np.sin(hn) / fsh  # (h, K)
    c = np.full(m2r, 2.0)
    c[0] = 1.0
    if w_out % 2 == 0 and m2r - 1 == w_out // 2:
        c[-1] = 1.0
    iw_cos = (np.cos(wn_o) * c[None, :]).T / isw  # (m2r, w_out)
    iw_sin = (np.sin(wn_o) * c[None, :]).T / isw
    ih_cos, ih_sin = np.cos(hn_o).T / ish, np.sin(hn_o).T / ish  # (K, h_out)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return (
        f32(fw_cos), f32(fw_sin), f32(fh_cos), f32(fh_sin),
        f32(iw_cos), f32(iw_sin), f32(ih_cos), f32(ih_sin),
    )


def _partial_rdft2(x, mats):
    """(B, H, W, C) real -> kept-mode (re, im), each (B, K, m2r, C) f32.

    dtype gate (round-4 zoo trace, docs/PERF.md): the ONLY large tensor
    here is the field-space input; under bf16 compute the W-contraction
    reads it as bf16 and accumulates f32 on the MXU
    (``preferred_element_type``), so no full-field f32 copy is ever
    materialized — an FNO layer was ~900 us of pure HBM traffic from
    exactly that copy.  Mode-space stays f32 throughout.  Under f32
    input this is bit-identical to the original path (parity tests)."""
    fw_cos, fw_sin, fh_cos, fh_sin = mats[:4]
    # ONE dot for both the cos and sin legs (round 5): the two legs each
    # read the full FIELD tensor; concatenating the constant matrices on
    # the mode axis halves the dominant HBM read — FNO-family field passes
    # are bandwidth-bound, not MXU-bound (docs/PERF.md round 5).  The
    # t_im sign is folded into the constants (exact).
    m2r = fw_cos.shape[1]
    fw = jnp.concatenate([fw_cos, -fw_sin], axis=1)  # (w, 2*m2r)
    if x.dtype == jnp.bfloat16:
        # bf16 output (not preferred_element_type=f32): XLA:CPU's DotThunk
        # rejects the mixed general dot, and on TPU the MXU accumulates in
        # f32 internally either way — only the small mode-space output is
        # rounded, below the bf16 input quantization already present.
        t = jnp.einsum("bhwc,wl->bhlc", x, fw.astype(x.dtype)).astype(jnp.float32)
    else:
        t = jnp.einsum("bhwc,wl->bhlc", x.astype(jnp.float32), fw)
    t_re, t_im = t[:, :, :m2r], t[:, :, m2r:]
    # e^{-i theta}(a + ib) = (a cos + b sin) + i(b cos - a sin)
    xr = jnp.einsum("bhlc,hk->bklc", t_re, fh_cos) + jnp.einsum(
        "bhlc,hk->bklc", t_im, fh_sin
    )
    xi = jnp.einsum("bhlc,hk->bklc", t_im, fh_cos) - jnp.einsum(
        "bhlc,hk->bklc", t_re, fh_sin
    )
    return xr, xi


def _partial_irdft2(yr, yi, mats, out_dtype=jnp.float32):
    """Kept-mode (re, im) (B, K, m2r, C) -> (B, H, W, C) ``out_dtype``.

    Same dtype gate as the forward: only the final W-expansion touches
    field-space, so under bf16 it runs with bf16 operands and emits bf16
    directly (MXU accumulation is f32 regardless) instead of
    materializing a full-field f32 tensor plus a cast pass."""
    iw_cos, iw_sin, ih_cos, ih_sin = mats[4:]
    # z = sum_k yhat_k e^{+2 pi i k h / H} / sqrt(H)
    z_re = jnp.einsum("bklc,kh->bhlc", yr, ih_cos) - jnp.einsum(
        "bklc,kh->bhlc", yi, ih_sin
    )
    z_im = jnp.einsum("bklc,kh->bhlc", yr, ih_sin) + jnp.einsum(
        "bklc,kh->bhlc", yi, ih_cos
    )
    # y = Re{ sum_l c_l z_l e^{+2 pi i l w / W} } / sqrt(W)
    # ONE dot for both legs (round 5): each leg WRITES a full field tensor
    # that a subtract fusion then re-reads; concatenating [z_re, -z_im] on
    # the (small) mode axis folds the subtract into the dot's contraction —
    # one field-sized write instead of two writes + two reads + one write.
    z = jnp.concatenate([z_re, -z_im], axis=-2)  # (B, H, 2*m2r, C)
    iw = jnp.concatenate([iw_cos, iw_sin], axis=0)  # (2*m2r, w_out)
    if out_dtype == jnp.bfloat16:
        return jnp.einsum("bhlc,lw->bhwc", z.astype(out_dtype), iw.astype(out_dtype))
    return jnp.einsum("bhlc,lw->bhwc", z, iw)


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
    wf = w // 2 + 1
    m1 = min(modes1, h)
    m2 = min(modes2, wf)
    if (
        _SPECTRAL_DFT
        and not use_pallas
        and m1 > 0
        and m2 > 0
        and 2 * m1 <= h  # disjoint top/bottom corners
    ):
        # Partial-DFT fast path: compute only the 2*m1 x m2 kept modes.
        mats = _partial_rdft_mats(h, w, m1, m1, m2)
        xr, xi = _partial_rdft2(x, mats)
        w_c = weight[:, :, :m1, :m2]
        w_full = jnp.concatenate([w_c, w_c], axis=2)  # (Cin, Cout, 2m1, m2, 2)
        w_re, w_im = w_full[..., 0], w_full[..., 1]
        o_re = jnp.einsum("bijc,coij->bijo", xr, w_re) - jnp.einsum(
            "bijc,coij->bijo", xi, w_im
        )
        o_im = jnp.einsum("bijc,coij->bijo", xr, w_im) + jnp.einsum(
            "bijc,coij->bijo", xi, w_re
        )
        # f32 out under f32 input (irfft2 parity); bf16 out under bf16
        # compute (no full-field f32 materialization — see _partial_irdft2)
        return _partial_irdft2(o_re, o_im, mats, out_dtype=x.dtype)

    x_ft = jnp.fft.rfft2(
        x.astype(jnp.float32), axes=(-3, -2), norm="ortho"
    )  # (B, H, Wf, Cin)
    wf = x_ft.shape[-2]
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
    wf_s = w // 2 + 1
    m1 = min(modes1, h)
    m2r = min(modes2 // 2 + 1, wf_s)
    m1_pos = (m1 + 1) // 2
    m1_neg = m1 - m1_pos
    if _SPECTRAL_DFT and m1 > 0 and m2r > 0 and m1_pos + m1_neg <= h:
        # Partial-DFT fast path (see spectral_conv2d): kept rows are the
        # m1_pos lowest positive and m1_neg lowest negative H-frequencies.
        mats = _partial_rdft_mats(h, w, m1_pos, m1_neg, m2r)
        xr, xi = _partial_rdft2(x, mats)
        w_k = weight[:, :, :, :m2r]  # (Cin, Cout, m1, m2r, 2): rows already
        # ordered [positive block, negative block] (see FFT path below)
        w_re, w_im = w_k[..., 0], w_k[..., 1]
        o_re = jnp.einsum("bijc,coij->bijo", xr, w_re) - jnp.einsum(
            "bijc,coij->bijo", xi, w_im
        )
        o_im = jnp.einsum("bijc,coij->bijo", xr, w_im) + jnp.einsum(
            "bijc,coij->bijo", xi, w_re
        )
        return _partial_irdft2(o_re, o_im, mats, out_dtype=x.dtype)

    x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(-3, -2), norm="ortho")
    wf = x_ft.shape[-2]
    m2r = min(modes2 // 2 + 1, wf)

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


def spectral_conv2d_centered_cw(
    x: jnp.ndarray, weight: jnp.ndarray, modes1: int, modes2: int
) -> jnp.ndarray:
    """``spectral_conv2d_centered`` for channel-sublane layout.

    x: (B, H, Cin, W); weight: (Cin, Cout, m1, m2r, 2) — the SAME tensor
    as the channels-last path.  Returns (B, H, Cout, W).

    Why a separate layout: at FNO zoo geometry (C=48, W=384) the
    channels-last field tensor pads its 48-channel lane axis to 128 —
    2.67x HBM traffic on EVERY pass; in (B, H, C, W) the tile is
    (C=48 sublanes, W=384 lanes), both exact multiples, zero padding.
    Every einsum below contracts a lane or sublane axis (MXU native).
    Same dtype gate as ``_partial_rdft2``: bf16 field-space operands,
    f32 mode-space."""
    h, w = x.shape[1], x.shape[-1]
    wf_s = w // 2 + 1
    m1 = min(modes1, h)
    m2r = min(modes2 // 2 + 1, wf_s)
    m1_pos = (m1 + 1) // 2
    m1_neg = m1 - m1_pos
    if not (m1 > 0 and m2r > 0 and m1_pos + m1_neg <= h):
        raise ValueError(f"cw layout requires kept modes within range: {m1}, {m2r}")
    mats = _partial_rdft_mats(h, w, m1_pos, m1_neg, m2r)
    fw_cos, fw_sin, fh_cos, fh_sin, iw_cos, iw_sin, ih_cos, ih_sin = mats
    # One-dot DFT legs, as in _partial_rdft2/_partial_irdft2 (round 5):
    # the field-space passes are HBM-bound; concatenated constants halve
    # the forward read and fold the inverse subtract into its dot.
    fw = jnp.concatenate([fw_cos, -fw_sin], axis=1)  # (w, 2*m2r)
    if x.dtype == jnp.bfloat16:
        t = jnp.einsum("bhcw,wl->bhcl", x, fw.astype(x.dtype)).astype(jnp.float32)
    else:
        t = jnp.einsum("bhcw,wl->bhcl", x.astype(jnp.float32), fw)
    t_re, t_im = t[..., :m2r], t[..., m2r:]
    xr = jnp.einsum("bhcl,hk->bkcl", t_re, fh_cos) + jnp.einsum(
        "bhcl,hk->bkcl", t_im, fh_sin
    )
    xi = jnp.einsum("bhcl,hk->bkcl", t_im, fh_cos) - jnp.einsum(
        "bhcl,hk->bkcl", t_re, fh_sin
    )
    w_k = weight[:, :, :, :m2r]
    w_re, w_im = w_k[..., 0], w_k[..., 1]
    o_re = jnp.einsum("bkcl,cokl->bkol", xr, w_re) - jnp.einsum(
        "bkcl,cokl->bkol", xi, w_im
    )
    o_im = jnp.einsum("bkcl,cokl->bkol", xr, w_im) + jnp.einsum(
        "bkcl,cokl->bkol", xi, w_re
    )
    z_re = jnp.einsum("bkol,kh->bhol", o_re, ih_cos) - jnp.einsum(
        "bkol,kh->bhol", o_im, ih_sin
    )
    z_im = jnp.einsum("bkol,kh->bhol", o_re, ih_sin) + jnp.einsum(
        "bkol,kh->bhol", o_im, ih_cos
    )
    z = jnp.concatenate([z_re, -z_im], axis=-1)  # (B, H, Cout, 2*m2r)
    iw = jnp.concatenate([iw_cos, iw_sin], axis=0)  # (2*m2r, w)
    if x.dtype == jnp.bfloat16:
        return jnp.einsum("bhol,lw->bhow", z.astype(x.dtype), iw.astype(x.dtype))
    return jnp.einsum("bhol,lw->bhow", z, iw)


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
        # dtype-gated inside spectral_conv2d (bf16 field-space, f32 MXU
        # accumulation); f32 input keeps the exact parity path.
        y = spectral_conv2d(x, weight, self.modes1, self.modes2)
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
