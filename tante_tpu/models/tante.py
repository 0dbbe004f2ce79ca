"""TANTE: Time-Adaptive Neural Taylor Expansion (flagship model).

TPU-native redesign of reference ``models/tante.py:37-201``.

Pipeline (reference lines cited for parity):
  encode T frames -> latent patch grid (B, T, H_p, W_p, C)      (:132)
  FiLM time-encode with the relative-time sequence + pos embeds  (:136-141)
  sequentially per Taylor order i: x = blocks[i](x); the order-i
  "derivative" is the last-time-step latent x[:, -1:]            (:145-147)
  adaptive: r_t_i = interprator(derivative tokens, out_T);
  derivative = FiLM modifier(derivative, r_t_i)                  (:149-152)
  decode each derivative to physical space                       (:153)
  Taylor sum: u(t_i) = u(0) + sum_k d_k (i*dt)^k / k!            (:165-169)

jit design (the reference's one data-dependent shape, ``output_length =
floor(R_t[0])`` at :163, removed from the model): the module ALWAYS computes
a static number of Taylor frames — ``output_length`` in fixed mode, or
``Tmax = floor(out_T)`` frames in adaptive mode — and returns ``(frames,
R_t)``.  How many frames are *consumed* is decided by the rollout driver
(``train/rollout.py``) with masking/dynamic-slice, keeping every shape
static under jit.  Computing all Tmax frames is nearly free: decoders run
once per order; extra frames only cost the elementwise Taylor combination.

Known reference bug fixed rather than ported: the adaptive FiLM modifier is
applied on token-reshaped latents ``(B, L, C)`` with per-sample r_t.  The
shipped reference passes the 5-D grid tensor into ``film`` and then
rearranges it with a 3-axis einops pattern (``models/tante.py:151-152``),
which crashes for any batch; the intended per-sample token FiLM (the
``x.dim() == 3`` branch of ``film``, :222-224) is what we implement.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.attn_backbone import AttnBackbone
from tante_tpu.models.common import Film, TorchDense, s_emb_init, t_emb_init, t_series
from tante_tpu.models.enc_dec_cnn import DecCNN, EncCNN
from tante_tpu.models.enc_dec_fno import DecFNO, EncFNO


class Interprator(nn.Module):
    """Confidence head: latent tokens -> r_t in (ep, out_T - 1 + ep).

    MLP C -> C/2 -> C/4 -> 1 per token; straight-through clip of the
    pre-mean values into [0, out_T-1] (reference models/tante.py:178-201).
    """

    h_dim: int
    ep: float = 1.001
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_T: float) -> jnp.ndarray:
        t = TorchDense(self.h_dim // 2, dtype=self.dtype)(x)
        t = nn.relu(t)
        t = TorchDense(self.h_dim // 4, dtype=self.dtype)(t)
        t = nn.relu(t)
        t = TorchDense(1, dtype=self.dtype)(t)[..., 0]  # (B, L)
        t_detached = jax.lax.stop_gradient(t)
        lower = nn.relu(-t_detached)
        upper = nn.relu(t_detached - (out_T - 1))
        t = t + lower - upper
        t = jnp.mean(t, axis=1)  # (B,)
        return t + self.ep


class TANTE(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    taylor_order: int = 1
    frame_interval: float = 1.0
    output_length: int = 1
    attn_axes: str = "THWTHWTHW"
    expanded_channel: int = 128
    n_head: int = 8
    mlp_ratio: float = 1.0
    dropout: float = 0.0
    enc_dec_type: str = "cnn"  # 'cnn' | 'fno'
    embed_dim: int = 256
    modes1: int = 32
    modes2: int = 32
    patch_scale: int = 32
    overlap_ratio: float = 0.0
    deg: bool = True
    # Fused Pallas transformer-block kernel (see models/attn_backbone.py).
    # Under tensor parallelism the Trainer keeps it via the Megatron-split
    # tp kernel (tp_mesh below) when the geometry shards evenly.
    fused_blocks: bool = True
    # Sub-chain fusion length (models/attn_backbone.py:fused_chain): runs of
    # up to N consecutive T/H/W blocks share one Pallas kernel.  0 = off.
    fused_chain: int = 0
    # Tensor parallelism: a Mesh with a 'tp' axis.  The Trainer sets this
    # (instead of disabling fused_blocks) when the geometry shards evenly —
    # blocks then run the Megatron-split fused kernel under shard_map
    # (ops/pallas_block.py:fused_block_apply_tp).
    tp_mesh: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        md = self.dset_metadata
        shape = md.spatial_resolution if md else (128, 384)
        self.H_p = shape[0] // self.patch_scale
        self.W_p = shape[1] // self.patch_scale
        self.C = self.embed_dim

        axes = self.attn_axes.replace(" ", "")
        if set(axes) - set("THWLACXY-"):
            raise ValueError("There are invalid letters")
        blocks_axes = [p.strip() for p in axes.split("-")]
        if len(blocks_axes) != self.taylor_order:
            raise ValueError(
                f"Block allocation doesn't match expansion order: expected "
                f"{self.taylor_order} parts, got {len(blocks_axes)} (input='{axes}')."
            )
        self.blocks_axes = blocks_axes

        if self.enc_dec_type == "cnn":
            self.encoder = EncCNN(
                dset_metadata=md,
                embed_dim=self.embed_dim,
                patch_scale=self.patch_scale,
                overlap_ratio=self.overlap_ratio,
                dtype=self.dtype,
            )
            self.decoders = [
                DecCNN(
                    dset_metadata=md,
                    embed_dim=self.embed_dim,
                    patch_scale=self.patch_scale,
                    overlap_ratio=self.overlap_ratio,
                    dtype=self.dtype,
                )
                for _ in range(self.taylor_order)
            ]
        elif self.enc_dec_type == "fno":
            self.encoder = EncFNO(
                dset_metadata=md,
                embed_dim=self.embed_dim,
                modes=(self.modes1, self.modes2),
                patch_scale=self.patch_scale,
                overlap_ratio=self.overlap_ratio,
                dtype=self.dtype,
            )
            self.decoders = [
                DecFNO(
                    dset_metadata=md,
                    embed_dim=self.embed_dim,
                    modes=(self.modes1, self.modes2),
                    patch_scale=self.patch_scale,
                    overlap_ratio=self.overlap_ratio,
                    dtype=self.dtype,
                )
                for _ in range(self.taylor_order)
            ]
        else:
            raise ValueError(f"Unknown enc_dec_type '{self.enc_dec_type}'")

        self.blocks = [
            AttnBackbone(
                tensor_shape=(self.in_T, self.H_p, self.W_p, self.C),
                attn_axes=block_axes,
                expanded_channel=self.expanded_channel,
                n_head=self.n_head,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                fused=self.fused_blocks,
                fused_chain=self.fused_chain,
                tp_mesh=self.tp_mesh,
                dtype=self.dtype,
            )
            for block_axes in self.blocks_axes
        ]

        self.t_emb = self.param(
            "t_emb", lambda key: jnp.asarray(t_emb_init(self.C, self.in_T))
        )
        self.s_emb = self.param(
            "s_emb",
            lambda key: jnp.asarray(s_emb_init(self.C, (self.H_p, self.W_p), flatten=False)),
        )
        self.t_seq = jnp.asarray(t_series(self.in_T, self.frame_interval))
        self.t_encode = Film(self.C, in_dim=1, dtype=self.dtype)

        if not self.deg:
            self.interprators = [
                Interprator(self.C, dtype=self.dtype) for _ in range(self.taylor_order)
            ]
            self.modifiers = [
                Film(self.C, in_dim=1, dtype=self.dtype) for _ in range(self.taylor_order)
            ]

    @staticmethod
    def n_frames(out_T: float) -> int:
        """Static frame-slot count for adaptive calls with budget out_T."""
        return max(1, int(math.floor(out_T + 1e-3)))

    def packed_io_ok(self) -> bool:
        """Whether this model supports the packed-frame fast path: the CNN
        enc/dec boundary patch is a clean space-to-depth (stride == patch,
        no padding), so physical frames can stay in ``pack_patches`` layout
        across a decode -> encode round trip (latent rollouts)."""
        from tante_tpu.models.enc_dec_cnn import PATCH_MAP
        from tante_tpu.ops.convs import packed_patch_ok

        return self.enc_dec_type == "cnn" and packed_patch_ok(
            PATCH_MAP[self.patch_scale][0], self.overlap_ratio
        )

    def morton_io_ok(self) -> bool:
        """Whether the Morton-packed fast path applies: every CNN pyramid
        stage is a clean space-to-depth (or pointwise), so the entire
        decode -> Taylor -> encode round trip runs on quad-tree-ordered flat
        rows with zero interior transposes (``ops/convs.py:morton_pack``)."""
        from tante_tpu.models.enc_dec_cnn import PATCH_MAP
        from tante_tpu.ops.convs import morton_pyramid_ok

        if self.enc_dec_type != "cnn":
            return False
        return morton_pyramid_ok(PATCH_MAP[self.patch_scale], self.overlap_ratio)

    def encode(self, inputs: jnp.ndarray, packed: bool = False) -> jnp.ndarray:
        """Per-frame latent encoding: (B, K, H, W, C) -> (B, K, H_p, W_p, C).

        Frames are encoded independently (the encoder folds time into the
        batch axis), so rollouts can cache latents and encode only the new
        frame per call (``train/rollout.py:rollout_tante_latent``).

        packed: True — inputs are in ``pack_patches(frames, p0)`` layout
        (gate with ``packed_io_ok()``); "morton" — inputs are
        ``morton_pack`` flat rows (gate with ``morton_io_ok()``).
        """
        if packed:
            return self.encoder(inputs, packed_in=packed)
        return self.encoder(inputs)

    def head(
        self,
        latents: jnp.ndarray,
        u_last: jnp.ndarray,
        out_T: float = 1,
        deterministic: bool = True,
        packed: bool = False,
    ):
        """Backbone + Taylor prediction from cached latents.

        latents: (B, T, H_p, W_p, C); u_last: (B, 1, H, W, C_phys) — the
        physical last frame (the Taylor expansion point u(0)).

        packed: decoders emit ``pack_patches`` frames and ``u_last`` must
        arrive packed — the Taylor combination is elementwise, so it is
        layout-invariant (gate with ``packed_io_ok()``).
        """
        x = self.t_encode(latents, self.t_seq)
        # Add the (f32-stored) embeddings in the COMPUTE dtype: promoting the
        # (B, T, H_p, W_p, C) activation to f32 for these two adds costs a
        # measured 0.30 ms/call at the bench geometry (device trace: the
        # convert-add-convert fusion materializes 25 MB f32 intermediates),
        # while the embeddings are O(1)-scaled so the bf16 rounding of the
        # sum is the same order as the backbone's own bf16 arithmetic.
        x = x + self.s_emb.astype(self.dtype)  # (1, H_p, W_p, C) broadcast
        x = x + self.t_emb[:, :, None, None, :].astype(self.dtype)

        derivatives = []
        r_ts = []
        for i in range(self.taylor_order):
            x = self.blocks[i](x, deterministic=deterministic)
            derivative = x[:, -1:]  # (B, 1, H_p, W_p, C)
            if not self.deg:
                tokens = rearrange(derivative, "b 1 h w c -> b (h w) c")
                rt = self.interprators[i](tokens, out_T)
                r_ts.append(rt)
                tokens = self.modifiers[i](tokens, rt)  # per-sample FiLM
                derivative = rearrange(
                    tokens, "b (h w) c -> b 1 h w c", h=self.H_p, w=self.W_p
                )
            if packed:
                derivatives.append(self.decoders[i](derivative, packed_out=packed))
            else:
                derivatives.append(self.decoders[i](derivative))  # (B, 1, H, W, C_out)

        n_out = self.output_length if self.deg else self.n_frames(out_T)
        derivs = jnp.concatenate(derivatives, axis=1)  # (B, K, H, W, C_out)
        # Taylor coefficients: coeff[i, k] = ((i+1)*dt)^(k+1) / (k+1)!
        steps = (jnp.arange(1, n_out + 1, dtype=jnp.float32) * self.frame_interval)[:, None]
        orders = jnp.arange(1, self.taylor_order + 1, dtype=jnp.float32)[None, :]
        fact = jnp.asarray(
            [math.factorial(k) for k in range(1, self.taylor_order + 1)],
            dtype=jnp.float32,
        )[None, :]
        coeffs = (steps**orders / fact).astype(derivs.dtype)  # (n_out, K)
        # Ellipsis handles both spatial (B, K, H, W, C) and packed/morton
        # flat-row (B, K, N, C') derivative layouts.
        outputs = jnp.einsum("ik,bk...->bi...", coeffs, derivs) + u_last

        if self.deg:
            return outputs
        r_t = jnp.stack(r_ts, axis=1)  # (B, K)
        return outputs, jnp.mean(r_t, axis=1)  # (B,)

    def __call__(self, inputs: jnp.ndarray, out_T: float = 1, deterministic: bool = True):
        """inputs: (B, T, H, W, C) channels-last.

        Fixed mode (deg=True): returns (B, output_length, H, W, C).
        Adaptive mode: returns ((B, n_frames(out_T), H, W, C), R_t (B,)).
        """
        if inputs.shape[1] != self.in_T:
            inputs = inputs[:, -self.in_T :]
        latents = self.encode(inputs)  # (B, T, H_p, W_p, C)
        return self.head(latents, inputs[:, -1:], out_T, deterministic)
