"""CViT baseline — Continuous Vision Transformer (grid/fourier/mlp query
embeddings, Perceiver time aggregation, cross-attention decoder).

Capabilities mirrored from reference ``models/cvit.py:333-479`` (itself a
torch port of the JAX original): 3-D space-time conv patch embed, factorized
t/s sincos position embeddings, ``TimeAggregation`` with one learned latent
cross-attending over time per spatial token, ``depth`` self-attention
blocks; decoder embeds query coords (h, w) in [0,1]^2 via a grid-RBF
weighted average of a learned latent table (eps = 1e5 — effectively
nearest-latent lookup), fourier features, or an MLP; ``dec_depth``
cross-attention blocks (queries x encoder tokens) and a residual MLP head
emitting ``out_steps * C`` values per query.

Dual output modes (reference :461-464): full grid ``(B, T', H, W, C)`` when
``coords is None`` else point set ``(B, T', N, C)``.  The full-grid RBF
matrix is N x grid_size^2 — callers should chunk queries at eval
(``train/evaler.py:cvit_full_grid_rollout`` does; SURVEY.md hard part #6).

Reference quirk kept: ``CrossAttnBlock`` reuses its kv LayerNorm as the
post-attention norm (``cvit.py:160-165``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.common import (
    TorchDense,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)
from tante_tpu.ops.attention import MultiheadAttention
from tante_tpu.ops.initializers import torch_xavier_init
from tante_tpu.ops.activations import gelu


class MlpBlock(nn.Module):
    dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, kernel_init=torch_xavier_init, dtype=self.dtype)(x)
        x = gelu(x)
        return nn.Dense(self.out_dim, kernel_init=torch_xavier_init, dtype=self.dtype)(x)


class SelfAttnBlock(nn.Module):
    num_heads: int
    emb_dim: int
    mlp_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = MultiheadAttention(self.emb_dim, self.num_heads, dtype=self.dtype)(
            y, deterministic=deterministic
        )
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        z = MlpBlock(self.emb_dim * self.mlp_ratio, self.emb_dim, dtype=self.dtype)(z)
        return x + z


class CrossAttnBlock(nn.Module):
    num_heads: int
    emb_dim: int
    mlp_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_inputs, kv_inputs, deterministic: bool = True):
        ln_q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")
        ln_kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")
        q = ln_q(q_inputs)
        kv = ln_kv(kv_inputs)
        x = MultiheadAttention(self.emb_dim, self.num_heads, dtype=self.dtype)(
            q, kv, kv, deterministic=deterministic
        )
        x = x + q_inputs
        # Reference reuses layer_norm2 here (cvit.py:165) — kept.
        y = ln_kv(x)
        y = MlpBlock(self.emb_dim * self.mlp_ratio, self.emb_dim, dtype=self.dtype)(y)
        return x + y


class TimeAggregation(nn.Module):
    """Perceiver-style: learned latents cross-attend over time per token."""

    emb_dim: int
    depth: int
    num_heads: int = 8
    num_latents: int = 64
    mlp_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, S, D) -> (B, num_latents, S, D)."""
        b, t, s, d = x.shape
        latents = self.param(
            "latents", nn.initializers.normal(1.0), (self.num_latents, self.emb_dim)
        )
        lat = repeat(latents, "t d -> b t d", b=b * s)
        tokens = rearrange(x, "b t s d -> (b s) t d")
        for i in range(self.depth):
            lat = CrossAttnBlock(
                self.num_heads, self.emb_dim, self.mlp_ratio, dtype=self.dtype
            )(lat, tokens, deterministic)
        return rearrange(lat, "(b s) t d -> b t s d", b=b, s=s)


class ResidualMlp(nn.Module):
    """num_layers x [Dense-GELU residual + LayerNorm] then output Dense."""

    num_layers: int
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(self.num_layers):
            y = TorchDense(self.hidden_dim, dtype=self.dtype)(x)
            y = gelu(y)
            x = x + y
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return TorchDense(self.out_dim, dtype=self.dtype)(x)


class FourierEmbs(nn.Module):
    embed_scale: float
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            lambda key: jax.random.normal(key, (x.shape[-1], self.embed_dim // 2))
            * self.embed_scale,
        )
        dot = x @ kernel
        return jnp.concatenate([jnp.cos(dot), jnp.sin(dot)], axis=-1)


class CViTEncoder(nn.Module):
    patch_size: Tuple[int, int, int]
    emb_dim: int
    depth: int
    num_heads: int
    mlp_ratio: int
    thw_shape: Tuple[int, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, T'*S, emb_dim)."""
        b, t, h, w, c = x.shape
        pt, ph, pw = self.patch_size
        z = nn.Conv(
            self.emb_dim,
            kernel_size=(pt, ph, pw),
            strides=(pt, ph, pw),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # (B, T/pt, H/ph, W/pw, D)
        tp, hp, wp = z.shape[1], z.shape[2], z.shape[3]
        z = z.reshape(b, tp, hp * wp, self.emb_dim)

        t_full, h_full, w_full = self.thw_shape
        t_emb = self.param(
            "t_emb",
            lambda key: jnp.asarray(get_1d_sincos_pos_embed(self.emb_dim, t_full // pt)),
        )
        s_emb = self.param(
            "s_emb",
            lambda key: jnp.asarray(
                get_2d_sincos_pos_embed(
                    self.emb_dim, (h_full // ph, w_full // pw), flatten=True
                )
            ),
        )
        z = z + t_emb[:, :, None, :] + s_emb[:, None, :, :]

        z = TimeAggregation(
            emb_dim=self.emb_dim,
            depth=2,
            num_heads=self.num_heads,
            num_latents=1,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            name="time_agg",
        )(z, deterministic)  # (B, 1, S, D)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(z)
        z = rearrange(z, "b t s d -> b (t s) d")
        for i in range(self.depth):
            z = SelfAttnBlock(
                self.num_heads, self.emb_dim, self.mlp_ratio, dtype=self.dtype
            )(z, deterministic)
        return z


class CViT(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    out_steps: int = 4
    patch_size: Tuple[int, int, int] = (1, 16, 16)
    grid_size: Tuple[int, int] = (128, 128)
    latent_dim: int = 256
    emb_dim: int = 256
    depth: int = 3
    num_heads: int = 8
    dec_emb_dim: int = 256
    dec_num_heads: int = 8
    dec_depth: int = 1
    num_mlp_layers: int = 1
    mlp_ratio: int = 1
    eps: float = 1e5
    embedding_type: str = "grid"  # 'grid' | 'fourier' | 'mlp'
    dtype: jnp.dtype = jnp.float32

    @property
    def output_length(self) -> int:
        return self.out_steps

    def _embed_coords(self, coords: jnp.ndarray) -> jnp.ndarray:
        if self.embedding_type == "grid":
            n_x, n_y = self.grid_size
            latents = self.param(
                "latents", nn.initializers.normal(1.0), (n_x * n_y, self.latent_dim)
            )
            xx, yy = np.meshgrid(
                np.linspace(0, 1, n_x), np.linspace(0, 1, n_y), indexing="ij"
            )
            grid_init = np.stack([xx.flatten(), yy.flatten()], axis=-1).astype(np.float32)
            grid = self.param("grid", lambda key: jnp.asarray(grid_init))
            # softmax(-eps * |q - g|^2) == softmax(eps * (2 q.g - |g|^2)):
            # the |q|^2 term is constant per query and cancels, so the RBF
            # logits are one (N, 2) x (2, G) MXU dot instead of the
            # broadcast-subtract-square N x G kLoop (measured 5.1 ms vs
            # ~0.1 at the 49k-query full grid; exact same softmax input up
            # to the cancelled constant).
            logits = self.eps * (
                2.0 * coords @ grid.T - jnp.sum(grid * grid, axis=1)[None, :]
            )
            w = jax.nn.softmax(logits, axis=1)
            emb = jnp.einsum("ic,pi->pc", latents, w)
            emb = TorchDense(self.dec_emb_dim, dtype=self.dtype)(emb)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(emb)
        if self.embedding_type == "fourier":
            return FourierEmbs(2 * np.pi, self.dec_emb_dim)(coords)
        if self.embedding_type == "mlp":
            emb = MlpBlock(self.dec_emb_dim, self.dec_emb_dim, dtype=self.dtype)(coords)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(emb)
        raise ValueError(f"Unknown embedding_type '{self.embedding_type}'")

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        coords: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """x: (B, T, H, W, C); coords: (N, 2) in [0,1]^2 or None.

        Returns (B, out_steps, N, C) with coords, else (B, out_steps, H, W, C).
        """
        b, t, h, w, c = x.shape
        full_grid = coords is None
        if full_grid:
            xs, ys = jnp.meshgrid(
                jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij"
            )
            coords = jnp.stack([xs.flatten(), ys.flatten()], axis=-1)

        q = self._embed_coords(coords)  # (N, dec_emb_dim)
        q = jnp.broadcast_to(q[None], (b, *q.shape))

        md = self.dset_metadata
        thw = (self.in_T, *(md.spatial_resolution if md else (128, 384)))
        z = CViTEncoder(
            patch_size=self.patch_size,
            emb_dim=self.emb_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            thw_shape=thw,
            dtype=self.dtype,
            name="encoder",
        )(x, deterministic)

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(z)
        z = TorchDense(self.dec_emb_dim, dtype=self.dtype, name="E2D")(z)

        for i in range(self.dec_depth):
            q = CrossAttnBlock(
                self.dec_num_heads, self.dec_emb_dim, self.mlp_ratio, dtype=self.dtype
            )(q, z, deterministic)

        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(q)
        y = ResidualMlp(
            self.num_mlp_layers,
            self.dec_emb_dim,
            c * self.out_steps,
            dtype=self.dtype,
            name="mlp",
        )(q)  # (B, N, out_steps*C)

        y = y.reshape(b, -1, self.out_steps, c)
        y = jnp.moveaxis(y, 1, 2)  # (B, out_steps, N, C)
        if full_grid:
            return y.reshape(b, self.out_steps, h, w, c)
        return y
