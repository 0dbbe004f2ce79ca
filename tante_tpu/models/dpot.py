"""DPOT baseline — denoising-pretrained operator transformer.

Capabilities mirrored from reference ``models/dpot.py:223-367``: per-frame
conv patch embed with appended 3-D (x, y, t) grid features, learned pos
embed, a learned TimeAggregator ('mlp' / 'exp_mlp' with cosine time
embedding) contracting T away, N blocks of [GroupNorm(8) -> AFNO2D Fourier
mixer (separate real/imag block-diagonal weights, low-mode corner only,
internal residual) -> GroupNorm -> 1x1-conv MLP], and a transposed-conv
output head reshaped to ``out_timesteps`` frames.  The unused ``cls_head``
(reference :266-272,343-344 computes then discards its output) is kept as a
parameterized module for checkpoint-surface parity.

Channels-last throughout; GroupNorm acts over the trailing channel axis.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.ops.fourier import block_diag_complex_matmul
from tante_tpu.ops.activations import gelu

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _act(name: str):
    return {
        "gelu": lambda x: gelu(x),
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "silu": nn.silu,
    }[name]


class AFNO2DMixer(nn.Module):
    """DPOT's Fourier mixer: low-mode corner MLP with real/imag weights.

    Keeps only the ``modes x modes`` low-frequency corner (positive H
    frequencies only — matching reference ``dpot.py:65-89``), applies a
    2-layer block-diagonal MLP with independent real/imag weight pairs and
    biases, scatters back into zeros, inverse-transforms and adds the
    input residual.
    """

    width: int
    num_blocks: int = 8
    modes: int = 32
    hidden_size_factor: int = 1
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nb = self.num_blocks
        bs = c // nb
        hsf = self.hidden_size_factor
        scale = 1.0 / (bs * bs * hsf)
        act = _act(self.act)

        def u_init(key, shape, dtype=jnp.float32):
            return scale * jax.random.uniform(key, shape, dtype)

        w1 = self.param("w1", u_init, (2, nb, bs, bs * hsf))
        b1 = self.param("b1", u_init, (2, nb, bs * hsf))
        w2 = self.param("w2", u_init, (2, nb, bs * hsf, bs))
        b2 = self.param("b2", u_init, (2, nb, bs))

        orig_dtype = x.dtype
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        hf, wf = xf.shape[1], xf.shape[2]
        m1 = min(self.modes, hf)
        m2 = min(self.modes, wf)

        corner = xf[:, :m1, :m2].reshape(b, m1, m2, nb, bs)
        re, im = corner.real, corner.imag
        o1_re, o1_im = block_diag_complex_matmul(re, im, w1[0], w1[1])
        o1_re = act(o1_re + b1[0])
        o1_im = act(o1_im + b1[1])
        o2_re, o2_im = block_diag_complex_matmul(o1_re, o1_im, w2[0], w2[1])
        o2_re = o2_re + b2[0]
        o2_im = o2_im + b2[1]
        oc = (o2_re + 1j * o2_im).reshape(b, m1, m2, c)

        yf = jnp.zeros_like(xf)
        yf = yf.at[:, :m1, :m2].set(oc)
        y = jnp.fft.irfft2(yf, s=(h, w), axes=(1, 2), norm="ortho")
        return y.astype(orig_dtype) + x


class DPOTBlock(nn.Module):
    width: int
    n_blocks: int = 8
    modes: int = 32
    mlp_ratio: float = 1.0
    act: str = "gelu"
    double_skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = _act(self.act)
        residual = x
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        y = AFNO2DMixer(
            width=self.width,
            num_blocks=self.n_blocks,
            modes=self.modes,
            act=self.act,
            dtype=self.dtype,
        )(y)
        if self.double_skip:
            y = y + residual
            residual = y
        z = nn.GroupNorm(num_groups=8, dtype=self.dtype)(y)
        z = nn.Dense(int(self.width * self.mlp_ratio), kernel_init=trunc02, dtype=self.dtype)(z)
        z = act(z)
        z = nn.Dense(self.width, kernel_init=trunc02, dtype=self.dtype)(z)
        return z + residual


class TimeAggregator(nn.Module):
    """Learned per-timestep channel matrices contracting T away."""

    n_timesteps: int
    out_channels: int
    agg_type: str = "exp_mlp"  # 'mlp' | 'exp_mlp'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, T, C) -> (B, H, W, C)."""
        t_, c = self.n_timesteps, self.out_channels

        def w_init(key, shape, dtype=jnp.float32):
            return jax.random.normal(key, shape, dtype) / (t_ * c**0.5)

        w = self.param("w", w_init, (t_, c, c))
        if self.agg_type == "mlp":
            return jnp.einsum("tij,...ti->...j", w, x)
        if self.agg_type == "exp_mlp":
            gamma = self.param(
                "gamma",
                lambda key: 2.0 ** jnp.linspace(-10, 10, c)[None, :],
            )
            tgrid = jnp.linspace(0, 1, x.shape[-2])[:, None]  # (T, 1)
            t_embed = jnp.cos(tgrid @ gamma)  # (T, C)
            return jnp.einsum("tij,...ti->...j", w, x * t_embed)
        raise ValueError(f"Unknown time_agg '{self.agg_type}'")


class DPOT(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    patch_size: int = 16
    mixing_type: str = "afno"
    out_timesteps: int = 1
    n_blocks: int = 4
    embed_dim: int = 768
    out_layer_dim: int = 32
    depth: int = 12
    modes: int = 32
    mlp_ratio: float = 1.0
    n_cls: int = 12
    act: str = "gelu"
    time_agg: str = "exp_mlp"
    dtype: jnp.dtype = jnp.float32

    @property
    def output_length(self) -> int:
        return self.out_timesteps

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, out_timesteps, H, W, C)."""
        assert self.mixing_type == "afno", "only afno mixing is implemented"
        b, t, h, w, c = x.shape
        p = self.patch_size
        act = _act(self.act)
        md = self.dset_metadata
        if md is not None:
            assert (h, w) == tuple(md.spatial_resolution), (
                f"Input image size ({h}*{w}) doesn't match model {md.spatial_resolution}"
            )

        # 3-D normalized grid features over (H, W, T) (reference get_grid_3d).
        gx = jnp.linspace(0, 1, h)[None, :, None, None, None]
        gy = jnp.linspace(0, 1, w)[None, None, :, None, None]
        gt = jnp.linspace(0, 1, t)[None, None, None, :, None]
        z = jnp.moveaxis(x, 1, 3)  # (B, H, W, T, C)
        grid = jnp.concatenate(
            [
                jnp.broadcast_to(gx, (b, h, w, t, 1)),
                jnp.broadcast_to(gy, (b, h, w, t, 1)),
                jnp.broadcast_to(gt, (b, h, w, t, 1)),
            ],
            axis=-1,
        )
        z = jnp.concatenate([z, grid.astype(z.dtype)], axis=-1)  # (B,H,W,T,C+3)

        # Per-frame patch embed (T folded into batch).
        z = jnp.moveaxis(z, 3, 1).reshape(b * t, h, w, c + 3)
        embed_hidden = c * p + 3
        z = nn.Conv(
            embed_hidden,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            kernel_init=trunc02,
            dtype=self.dtype,
            name="patch_proj",
        )(z)
        z = act(z)
        z = nn.Dense(self.embed_dim, kernel_init=trunc02, dtype=self.dtype, name="patch_out")(z)

        pos = self.param(
            "pos_embed", trunc02, (1, h // p, w // p, self.embed_dim)
        )
        z = z + pos

        z = z.reshape(b, t, h // p, w // p, self.embed_dim)
        z = jnp.moveaxis(z, 1, 3)  # (B, h_p, w_p, T, C)
        z = TimeAggregator(
            n_timesteps=self.in_T,
            out_channels=self.embed_dim,
            agg_type=self.time_agg,
            dtype=self.dtype,
            name="time_agg_layer",
        )(z)  # (B, h_p, w_p, C)

        for _ in range(self.depth):
            z = DPOTBlock(
                width=self.embed_dim,
                n_blocks=self.n_blocks,
                modes=self.modes,
                mlp_ratio=self.mlp_ratio,
                act=self.act,
                dtype=self.dtype,
            )(z)

        # cls head: computed and discarded, as in the reference (:343-344).
        cls_token = jnp.mean(z, axis=(1, 2))
        cls = nn.Dense(self.embed_dim, kernel_init=trunc02, dtype=self.dtype)(cls_token)
        cls = act(cls)
        cls = nn.Dense(self.embed_dim, kernel_init=trunc02, dtype=self.dtype)(cls)
        cls = act(cls)
        _ = nn.Dense(self.n_cls, kernel_init=trunc02, dtype=self.dtype, name="cls_out")(cls)

        # Stride == kernel, VALID: the de-patch ConvTranspose is a clean
        # matmul + depth-to-space.  XLA's conv_transpose lowering (reverse +
        # input-dilated conv) ran this ONE op at 12.8 ms/call at the TR
        # geometry — 92% of a DPOT forward; the dense form is exact and
        # parameter-compatible (same kernel/bias names and shapes).
        from tante_tpu.ops.convs import _PatchDenseTranspose

        y = _PatchDenseTranspose(
            features=self.out_layer_dim,
            patch=(p, p),
            dtype=self.dtype,
            kernel_init=trunc02,
            bias_init=nn.initializers.zeros,  # nn.ConvTranspose's default
            name="out_deconv",
        )(z)
        y = act(y)
        y = nn.Dense(self.out_layer_dim, kernel_init=trunc02, dtype=self.dtype)(y)
        y = act(y)
        y = nn.Dense(
            c * self.out_timesteps, kernel_init=trunc02, dtype=self.dtype, name="out_proj"
        )(y)
        y = y.reshape(b, h, w, self.out_timesteps, c)
        return jnp.moveaxis(y, 3, 1)  # (B, out_T, H, W, C)
