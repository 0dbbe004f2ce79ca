"""Shared model building blocks (flax linen, channels-last).

Covers the reference's shared-module surface: ``TransformerBlock``
(``models/attn_backbone.py:38-83``), FiLM conditioning
(``models/tante.py:203-230``), sincos position embeddings and the relative
time series (``models/tante.py:232-285``), plus a torch-default Dense/MLP.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.ops.attention import MultiheadAttention
from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init


class _SublaneDense(nn.Module):
    """Dense over axis -2 of a channel-sublane ``(..., C, W)`` tensor.

    Same parameter tree/init/dtype semantics as ``nn.Dense`` (kernel
    ``(Cin, Cout)``, bias ``(Cout,)``) so a ``TorchDense(cw=True)`` is
    parameter-compatible with the channels-last form; the contraction
    runs as an MXU dot over the sublane axis with the 128-lane W axis
    untouched (the whole point of the cw layout — see models/fno.py)."""

    features: int
    in_features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features)
        )
        y = jnp.einsum(
            "...cw,cd->...dw", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(self.in_features), (self.features,)
            )
            y = y + bias.astype(self.dtype)[..., :, None]
        return y


class TorchDense(nn.Module):
    """nn.Dense with torch ``nn.Linear`` default initialization.

    ``cw=True`` applies the same parameters over axis -2 of a
    channel-sublane ``(..., C, W)`` tensor (param-tree identical: the
    child is named ``Dense_0`` like the auto-named ``nn.Dense``)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    cw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cw:
            return _SublaneDense(
                self.features,
                in_features=x.shape[-2],
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="Dense_0",
            )(x)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1]),
            dtype=self.dtype,
        )(x)


class Mlp(nn.Module):
    """Linear -> act -> Linear (act defaults to tanh-GELU, "NewGELU")."""

    hidden_features: int
    out_features: int
    approximate_gelu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # fc1/fc2 names anchor the tensor-parallel partition rules
        # (parallel/sharding.py): fc1 shards its output features, fc2 its
        # input features — the Megatron MLP layout.
        x = TorchDense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.approximate_gelu)
        x = TorchDense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class TransformerBlock(nn.Module):
    """Pre-LN transformer block: LN -> MHA -> +res, LN -> MLP -> +res."""

    embed_dim: int
    n_head: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        causal: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qkv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        y = MultiheadAttention(
            embed_dim=self.embed_dim,
            num_heads=self.n_head,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attn",
        )(qkv, causal=causal, deterministic=deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        z = Mlp(
            hidden_features=int(self.embed_dim * self.mlp_ratio),
            out_features=self.embed_dim,
            dtype=self.dtype,
            name="mlp",
        )(z)
        z = nn.Dropout(rate=self.dropout)(z, deterministic=deterministic)
        return x + z


class FusedTransformerBlock(nn.Module):
    """Pre-LN transformer block computed by ONE fused Pallas kernel on TPU.

    Same math as ``TransformerBlock`` (equivalence-tested) with a flat
    param tree so the kernel can consume the weights directly.  When
    dropout is active (training with dropout > 0) or off-TPU, an XLA
    path with identical math (plus the dropout sites of the reference
    ``models/attn_backbone.py:38-83``) runs instead; gradients always go
    through the XLA formulation (ops/pallas_block.py custom VJP).
    """

    embed_dim: int
    n_head: int
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    # False selects the identical XLA formulation while KEEPING the flat
    # param tree — so fused, non-fused and tensor-parallel checkpoints
    # stay interchangeable.
    use_kernel: bool = True
    # Tensor parallelism: a jax.sharding.Mesh with a 'tp' axis.  When set,
    # the block runs the Megatron-split fused kernel under shard_map
    # (ops/pallas_block.py:fused_block_apply_tp): the two half kernels per
    # tp shard with one psum after each — tp keeps the kernel win instead
    # of forfeiting it to the XLA fallback.
    tp_mesh: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from tante_tpu.ops.initializers import torch_xavier_init
        from tante_tpu.ops.pallas_block import BlockParams

        c = self.embed_dim
        hidden = int(c * self.mlp_ratio)
        self._params = BlockParams(
            ln1_scale=self.param("ln1_scale", nn.initializers.ones, (c,)),
            ln1_bias=self.param("ln1_bias", nn.initializers.zeros, (c,)),
            wq=self.param("wq", torch_xavier_init, (c, c)),
            bq=self.param("bq", nn.initializers.zeros, (c,)),
            wk=self.param("wk", torch_xavier_init, (c, c)),
            bk=self.param("bk", nn.initializers.zeros, (c,)),
            wv=self.param("wv", torch_xavier_init, (c, c)),
            bv=self.param("bv", nn.initializers.zeros, (c,)),
            wo=self.param("wo", torch_kernel_init, (c, c)),
            bo=self.param("bo", nn.initializers.zeros, (c,)),
            ln2_scale=self.param("ln2_scale", nn.initializers.ones, (c,)),
            ln2_bias=self.param("ln2_bias", nn.initializers.zeros, (c,)),
            w1=self.param("w1", torch_kernel_init, (c, hidden)),
            b1=self.param("b1", torch_bias_init(c), (hidden,)),
            w2=self.param("w2", torch_kernel_init, (hidden, c)),
            b2=self.param("b2", torch_bias_init(hidden), (c,)),
        )
        self._drop_attn = nn.Dropout(rate=self.dropout)
        self._drop_proj = nn.Dropout(rate=self.dropout)
        self._drop_mlp = nn.Dropout(rate=self.dropout)

    def block_params(self):
        """The flat weight tuple, cast to compute dtype — used by the
        backbone's group-fused path (ops/pallas_block.py:fused_group_apply)
        without running the block."""
        from tante_tpu.ops.pallas_block import BlockParams

        return BlockParams(*(p.astype(self.dtype) for p in self._params))

    def __call__(
        self,
        x: jnp.ndarray,
        causal: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from tante_tpu.ops.pallas_block import fused_block_apply

        c = self.embed_dim
        params = self.block_params()
        l = x.shape[-2]

        if self.use_kernel and (deterministic or self.dropout == 0.0):
            if self.tp_mesh is not None:
                from tante_tpu.ops.pallas_block import fused_block_apply_tp

                return fused_block_apply_tp(
                    x, params, l, self.n_head, causal, self.tp_mesh
                )
            return fused_block_apply(x, params, l, self.n_head, causal)

        # XLA path: identical math, with the reference's three dropout
        # sites (attention weights, post-attention, post-MLP) active only
        # when training with dropout.
        from tante_tpu.ops.pallas_block import _gelu_tanh_f32, _ln

        d = c // self.n_head
        xn = _ln(x, params.ln1_scale, params.ln1_bias)
        q = ((xn @ params.wq) + params.bq) * (d**-0.5)
        k = (xn @ params.wk) + params.bk
        v = (xn @ params.wv) + params.bv

        def split(t):
            return t.reshape(*t.shape[:-1], self.n_head, d)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("blhd,bmhd->bhlm", q, k).astype(jnp.float32)
        if causal:
            m = jnp.tril(jnp.ones((l, l), dtype=bool))
            logits = jnp.where(m, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        w = self._drop_attn(w, deterministic=deterministic)
        attn = jnp.einsum("bhlm,bmhd->blhd", w, v).reshape(*x.shape)
        y = (attn @ params.wo) + params.bo
        y = self._drop_proj(y, deterministic=deterministic)
        x = x + y
        yn = _ln(x, params.ln2_scale, params.ln2_bias)
        h1 = ((yn @ params.w1) + params.b1).astype(jnp.float32)
        z = (_gelu_tanh_f32(h1).astype(x.dtype) @ params.w2) + params.b2
        z = self._drop_mlp(z, deterministic=deterministic)
        return x + z


class Film(nn.Module):
    """FiLM conditioning: ``x + (x * scale(t) + shift(t))``.

    Two ReLU MLPs map a scalar condition to per-channel scale/shift
    (reference ``models/tante.py:203-230``).  Handles token tensors
    ``(B, L, C)`` with condition ``(B,)`` and grid tensors
    ``(B, T, H, W, C)`` with condition ``(T,)``.
    """

    h_dim: int
    in_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        def mlp(name):
            return nn.Sequential(
                [
                    TorchDense(self.h_dim // 2, dtype=self.dtype),
                    nn.relu,
                    TorchDense(self.h_dim, dtype=self.dtype),
                ]
            )

        cond = t[..., None].astype(x.dtype)  # (..., 1)
        scale = mlp("scale")(cond)
        shift = mlp("shift")(cond)
        if x.ndim == 3:  # (B, L, C), cond (B, C)
            scale = scale[:, None, :]
            shift = shift[:, None, :]
        elif x.ndim == 5:  # (B, T, H, W, C), cond (T, C)
            scale = scale[None, :, None, None, :]
            shift = shift[None, :, None, None, :]
        return x + (x * scale + shift)


# --------------------------------------------------------------------------
# Position embeddings (reference models/tante.py:232-278)
# --------------------------------------------------------------------------


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    return get_1d_sincos_pos_embed_from_grid(embed_dim, np.arange(length))[None]


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: Sequence[int], *, flatten: bool = False
) -> np.ndarray:
    """flatten=False -> (1, H, W, D); flatten=True -> (1, H*W, D).

    Reproduces the reference construction (models/tante.py:251-276) exactly,
    including its quirk: the (W, H)-shaped meshgrid is *reshaped* (not
    transposed) to (H, W), so for non-square grids the pattern stripes
    diagonally.  This is only an initialization for a learned parameter, but
    parity is free.
    """
    h, w = grid_size
    mesh_w, mesh_h = np.meshgrid(
        np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64), indexing="ij"
    )  # (W, H) each
    grid = np.stack([mesh_h, mesh_w], axis=0).reshape(2, 1, h, w)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)  # (H*W, D)
    if flatten:
        return pos[None]
    return pos.reshape(h, w, embed_dim)[None]


def t_series(in_t: int, frame_interval: float) -> np.ndarray:
    """Relative time sequence fed to the FiLM time encoder.

    Reproduces reference ``t_series`` (models/tante.py:279-285) exactly,
    including its quirk: for T=4 the sequence is [-2d, -d, 0, 0] (the list
    starts at 0.0 and appends -i*d for i in 0..T-2 before reversing).
    """
    seq = [0.0] + [-i * frame_interval for i in range(in_t - 1)]
    seq.reverse()
    return np.asarray(seq, dtype=np.float32)


t_emb_init = get_1d_sincos_pos_embed
s_emb_init = get_2d_sincos_pos_embed
