"""FNO baseline (native JAX; replaces the reference's neuralop dependency).

The reference model (``models/fno.py:63-106``) folds the T input frames into
channels, runs ``neuralop.models.FNO`` and emits one frame.  neuralop is a
third-party torch package, so the operator itself is re-implemented here in
the same architecture family and parameter count:

  lifting: 1x1 MLP C_in -> 2h -> h
  n_layers x [centered-mode spectral conv + linear 1x1 skip, gelu,
              channel MLP (h -> h/2 -> h) + soft-gating skip, gelu*]
  projection: 1x1 MLP h -> 2h -> C_out          (*no gelu after last block)

Channels-last; every 1x1 conv is a Dense over the channel axis (one MXU
matmul over B*H*W rows).  ``gradient_checkpointing`` remats each block
(reference exposes the same flag, ``models/fno.py:72``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.common import TorchDense
from tante_tpu.ops.initializers import complex_spectral_init
from tante_tpu.ops.spectral import (
    spectral_conv2d_centered,
    spectral_conv2d_centered_cw,
    spectral_conv3d_centered,
)
from tante_tpu.ops.activations import gelu


class SoftGate(nn.Module):
    """Per-channel learned scale + bias (neuralop's 'soft-gating' skip).

    ``cw=True`` broadcasts over axis -2 (channel-sublane layout)."""

    cw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-2] if self.cw else x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        # cast params to the field dtype: under bf16 compute a f32 gate
        # would promote the full-field tensor (and the gelu after it) to
        # f32 — two hidden full-field f32 passes per block.
        if self.cw:
            return x * w[:, None].astype(x.dtype) + b[:, None].astype(x.dtype)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class FNOBlock(nn.Module):
    """One FNO layer; the spatial rank (2-D or 3-D) is inferred from the
    input, matching the reference's ``n_spatial_dims``-driven mode tuples
    (``models/fno.py:102-106``)."""

    hidden: int
    modes1: int
    modes2: int
    modes3: int = 16
    last: bool = False
    sp_mesh: Any = None  # spatial sharding: Mesh with an 'sp' axis
    dtype: jnp.dtype = jnp.float32
    cw: bool = False  # channel-sublane (B, H, C, W) layout (2-D only)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cw:  # (B, H, C, W) channel-sublane path
            m2r = self.modes2 // 2 + 1
            weight = self.param(
                "spectral_weight",
                complex_spectral_init(self.hidden, self.hidden),
                (self.hidden, self.hidden, self.modes1, m2r, 2),
            )
            y = spectral_conv2d_centered_cw(x, weight, self.modes1, self.modes2)
            y = y + TorchDense(self.hidden, dtype=self.dtype, cw=True)(x)
            y = gelu(y)
            z = TorchDense(self.hidden // 2, dtype=self.dtype, cw=True)(y)
            z = gelu(z)
            z = TorchDense(self.hidden, dtype=self.dtype, cw=True)(z)
            y = z + SoftGate(cw=True)(y)
            if not self.last:
                y = gelu(y)
            return y
        if x.ndim == 5:  # (B, D, H, W, C): 3-D spatial path
            m3r = self.modes3 // 2 + 1
            weight = self.param(
                "spectral_weight",
                complex_spectral_init(self.hidden, self.hidden),
                (self.hidden, self.hidden, self.modes1, self.modes2, m3r, 2),
            )
            y = spectral_conv3d_centered(
                x.astype(jnp.float32), weight, self.modes1, self.modes2, self.modes3
            ).astype(x.dtype)
        else:
            m2r = self.modes2 // 2 + 1
            weight = self.param(
                "spectral_weight",
                complex_spectral_init(self.hidden, self.hidden),
                (self.hidden, self.hidden, self.modes1, m2r, 2),
            )
            if self.sp_mesh is not None:
                # H-sharded field: partial-DFT with per-shard partial sums
                # + one mode-space psum (parallel/halo.py).  Every other op
                # in the block is pointwise over H, so jit's SPMD
                # partitioner keeps them local given the input sharding.
                from tante_tpu.parallel.halo import sharded_spectral_conv2d_centered

                y = sharded_spectral_conv2d_centered(
                    self.sp_mesh, x.astype(jnp.float32), weight,
                    self.modes1, self.modes2,
                ).astype(x.dtype)
            else:
                # dtype-gated inside: bf16 field-space contractions with
                # f32 MXU accumulation, no full-field f32 copies
                # (ops/spectral.py round-4 note; f32 input = parity path).
                y = spectral_conv2d_centered(
                    x, weight, self.modes1, self.modes2
                ).astype(x.dtype)
        y = y + TorchDense(self.hidden, dtype=self.dtype)(x)  # linear fno skip
        y = gelu(y)
        z = TorchDense(self.hidden // 2, dtype=self.dtype)(y)
        z = gelu(z)
        z = TorchDense(self.hidden, dtype=self.dtype)(z)
        y = z + SoftGate()(y)
        if not self.last:
            y = gelu(y)
        return y


class FNO(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    modes1: int = 16
    modes2: int = 16
    modes3: int = 16
    hidden_channels: int = 64
    n_layers: int = 4
    gradient_checkpointing: bool = False
    output_length: int = 1
    # Spatial sharding: a Mesh with an 'sp' axis (set by the Trainer when
    # the run's mesh has one).  The spectral convs run the H-sharded
    # partial-DFT (one psum each); all other ops are pointwise over H and
    # shard for free under jit.  2-D path only.
    sp_mesh: Any = None
    dtype: jnp.dtype = jnp.float32
    # 'cw' = channel-sublane (B, H, C, W) internal layout (default); 'wc' =
    # channels-last.  Parameter trees are IDENTICAL (same init, same
    # math up to einsum associativity); cw removes the 48->128 lane
    # padding every channels-last field tensor pays at zoo geometry —
    # measured on chip 3504 -> 4297 f/s at the zoo protocol
    # (docs/PERF.md round 5).  2-D unsharded path only — 3-D and sp_mesh
    # inputs fall back to wc.
    layout: str = "cw"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, *spatial, C) -> (B, 1, *spatial, C); spatial is (H, W) or
        (D, H, W) (reference 3-D constructor path, ``models/fno.py:102-106``)."""
        b, t, c = x.shape[0], x.shape[1], x.shape[-1]
        spatial = x.shape[2:-1]
        z = jnp.moveaxis(x, 1, -2).reshape(b, *spatial, t * c)  # fold T into channels
        cw = self.layout == "cw" and len(spatial) == 2 and self.sp_mesh is None
        if cw:
            z = jnp.swapaxes(z, -1, -2)  # (B, H, TC, W): one small transpose
        z = TorchDense(self.hidden_channels * 2, dtype=self.dtype, cw=cw)(z)
        z = gelu(z)
        z = TorchDense(self.hidden_channels, dtype=self.dtype, cw=cw)(z)
        block_cls = FNOBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(FNOBlock)
        for i in range(self.n_layers):
            z = block_cls(
                hidden=self.hidden_channels,
                modes1=self.modes1,
                modes2=self.modes2,
                modes3=self.modes3,
                last=(i == self.n_layers - 1),
                sp_mesh=self.sp_mesh if (z.ndim == 4 and not cw) else None,
                dtype=self.dtype,
                cw=cw,
            )(z)
        z = TorchDense(self.hidden_channels * 2, dtype=self.dtype, cw=cw)(z)
        z = gelu(z)
        z = TorchDense(c, dtype=self.dtype, cw=cw)(z)
        if cw:
            z = jnp.swapaxes(z, -1, -2)  # back to (B, H, W, C)
        return z[:, None]  # (B, 1, H, W, C)
