"""Axial-attention transformer backbone (reference ``models/attn_backbone.py``).

Input/output: ``(B, T, H, W, C)`` latent patch grids.  First three residual
"propagator" MLPs mix along the H, W and T axes (Linear over that axis);
then one ``TransformerBlock`` per axis character, with the tensor reshaped so
attention runs along:

  T  time, causal, per pixel            H/W  rows / columns
  L  H*W spatial tokens per frame       Y/X  (T*H) / (T*W) space-time planes
  A  full T*H*W joint attention         C    channel attention via scalar lift

Axial factorization is the reference's (and this framework's) primary
long-sequence lever: per-call token counts stay bounded by
max(T, H_p, W_p, H_p*W_p) — sequence parallelism is unnecessary at these
sizes, and each attention call is a dense batched matmul for the MXU.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from tante_tpu.models.common import FusedTransformerBlock, Mlp, TorchDense
from tante_tpu.ops.initializers import torch_bias_init, torch_kernel_init

# 'einsum' contracts the mixing axis in place (no transpose materialized);
# 'moveaxis' is the naive transpose-dense-transpose form.  Measured on v5e:
# the 3-propagator chain costs 0.20 ms (einsum) vs 0.47 ms (moveaxis) at the
# flagship geometry.
PROP_IMPL = os.environ.get("TANTE_PROP_IMPL", "einsum")

_AXIS_LETTERS = "bthwc"


class AxisPropagator(nn.Module):
    """Residual Linear-GELU-Linear applied along a chosen axis of
    (B, T, H, W, C) (reference ``models/attn_backbone.py:111-119,140-146``)."""

    axis_size: int
    axis: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.axis_size
        w1 = self.param("w1", torch_kernel_init, (a, a))
        b1 = self.param("b1", torch_bias_init(a), (a,))
        w2 = self.param("w2", torch_kernel_init, (a, a))
        b2 = self.param("b2", torch_bias_init(a), (a,))
        w1, b1, w2, b2 = (p.astype(self.dtype) for p in (w1, b1, w2, b2))
        xc = x.astype(self.dtype)
        # Exact erf-GELU under f32 (parity); tanh form under bf16 compute,
        # where the difference is below bf16 quantization and erf costs ~2x
        # on the VPU over the full (B, T, H, W, C) hidden tensor (same
        # rationale as models/enc_dec_cnn.py:_gelu).
        approx = self.dtype == jnp.bfloat16
        if PROP_IMPL == "einsum":
            src = _AXIS_LETTERS[: x.ndim]
            ax = src[self.axis]
            dst = src.replace(ax, "j")
            bias_shape = tuple(a if i == self.axis else 1 for i in range(x.ndim))
            y = jnp.einsum(f"{src},{ax}j->{dst}", xc, w1) + b1.reshape(bias_shape)
            y = nn.gelu(y, approximate=approx)
            y = jnp.einsum(f"{dst},j{ax}->{src}", y, w2) + b2.reshape(bias_shape)
            return x + y
        moved = jnp.moveaxis(xc, self.axis, -1)
        y = nn.gelu(moved @ w1 + b1, approximate=approx) @ w2 + b2
        return x + jnp.moveaxis(y, -1, self.axis)


class AttnBackbone(nn.Module):
    tensor_shape: Tuple[int, int, int, int]  # (T, H, W, C)
    attn_axes: str = "L TT TT TT L"
    expanded_channel: int = 128
    n_head: int = 8
    mlp_ratio: float = 1.0
    dropout: float = 0.0
    # Fused Pallas block kernel (ops/pallas_block.py): ~2x faster backbone
    # on a single TPU chip; automatically falls back to identical XLA math
    # off-TPU.  fused=False selects the identical XLA block math; the
    # parameter tree is the flat FusedTransformerBlock layout EITHER WAY,
    # so checkpoints are interchangeable between fused, non-fused and
    # tensor-parallel runs.
    fused: bool = True
    # Whole-chain group fusion (one kernel per batch element, in-VMEM token
    # re-orders between blocks).  Validated numerically on-device, but the
    # axon remote compiler takes ~7 min for even a 3-block chain (Mosaic
    # unrolls every per-head dot), so it stays OPT-IN until kernel compile
    # cost is acceptable; the per-block fused kernel is the default path.
    fused_group: bool = False
    # Sub-chain fusion: consecutive runs of T/H/W blocks (up to
    # ``fused_chain`` long) share one Pallas kernel via
    # ops/pallas_block.fused_chain_apply — each interior axis switch trades
    # an HBM-round-trip XLA transpose pair for an in-VMEM permutation
    # matmul.  0 disables.  Unlike fused_group, compile cost stays bounded
    # (one kernel per run length actually used).
    fused_chain: int = 0
    # Tensor parallelism: when set (a jax.sharding.Mesh with a 'tp' axis),
    # blocks run the Megatron-split fused kernel under shard_map
    # (ops/pallas_block.py:fused_block_apply_tp) — tp keeps the kernel win
    # instead of falling back to XLA block math.  Group/chain/canonical-T
    # kernels are single-device-only and are bypassed under tp.
    tp_mesh: Any = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        t, h, w, c = self.tensor_shape
        axes = self.attn_axes.replace(" ", "")
        if axes == "":
            raise ValueError("Invalid block: empty segment.")
        b = x.shape[0]

        # Compute-dtype gate: upstream f32 parameters (positional embeddings,
        # FiLM) silently promote the activation to f32, which then rides
        # through every block — 2x the HBM traffic and a lower MXU rate for
        # the entire backbone under bf16 configs (caught on-chip: the kernels
        # were compiling for f32[24576,256] at the bf16 flagship).
        x = x.astype(self.dtype)

        # Propagators mix along H, W, then T (attn_backbone.py:140-146).
        x = AxisPropagator(h, axis=2, dtype=self.dtype, name="vertical_propagator")(x)
        x = AxisPropagator(w, axis=3, dtype=self.dtype, name="horizontal_propagator")(x)
        x = AxisPropagator(t, axis=1, dtype=self.dtype, name="temporal_propagator")(x)

        channel_index = 0

        def block_cls(**kw):
            return FusedTransformerBlock(
                use_kernel=self.fused, tp_mesh=self.tp_mesh, **kw
            )

        # Group fusion: a pure T/H/W chain (the flagship THWTHWTHW) runs as
        # ONE Pallas kernel per batch element — blocks back to back in VMEM
        # with in-kernel token re-orders, no HBM round-trip or XLA transpose
        # between blocks (ops/pallas_block.py:fused_group_apply; identical
        # XLA math off-TPU and for gradients).  Dropout keeps the per-block
        # path, which already falls back to XLA when active.
        from tante_tpu.ops.pallas_block import fused_group_apply, group_fusable

        if (
            self.fused
            and self.fused_group
            and self.tp_mesh is None
            and (deterministic or self.dropout == 0.0)
            and group_fusable(
                axes, (t, h, w), c, self.n_head, jnp.dtype(self.dtype).itemsize
            )
        ):
            blocks = [
                FusedTransformerBlock(
                    embed_dim=c,
                    n_head=self.n_head,
                    mlp_ratio=self.mlp_ratio,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name=f"block_{i}",
                )
                for i in range(len(axes))
            ]
            params_seq = tuple(blk.block_params() for blk in blocks)
            return fused_group_apply(x, params_seq, axes, self.n_head)

        from tante_tpu.ops.pallas_block import chain_fusable, fused_chain_apply

        use_chain = (
            self.fused
            and self.fused_chain >= 2
            and self.tp_mesh is None
            and (deterministic or self.dropout == 0.0)
        )

        i = 0
        while i < len(axes):
            axis = axes[i]
            if use_chain and axis in "THW":
                run = axes[i : i + self.fused_chain]
                j = 0
                while j < len(run) and run[j] in "THW":
                    j += 1
                run = run[:j]
                if len(run) >= 2 and chain_fusable(
                    run, (t, h, w), c, self.n_head, jnp.dtype(self.dtype).itemsize
                ):
                    blocks = [
                        FusedTransformerBlock(
                            embed_dim=c,
                            n_head=self.n_head,
                            mlp_ratio=self.mlp_ratio,
                            dropout=self.dropout,
                            dtype=self.dtype,
                            name=f"block_{i + k}",
                        )
                        for k in range(len(run))
                    ]
                    params_seq = tuple(blk.block_params() for blk in blocks)
                    first, last = run[0], run[-1]
                    pat = {
                        "T": ("b t h w c -> (b h w) t c", dict(b=b, h=h, w=w)),
                        "H": ("b t h w c -> (b t w) h c", dict(b=b, t=t, w=w)),
                        "W": ("b t h w c -> (b t h) w c", dict(b=b, t=t, h=h)),
                    }
                    y = rearrange(x, pat[first][0])
                    y = fused_chain_apply(y, params_seq, run, self.n_head, (t, h, w))
                    inv, kw = pat[last]
                    src, dst = inv.split(" -> ")
                    x = rearrange(y, f"{dst} -> {src}", **kw)
                    i += len(run)
                    continue
            embed_dim = self.expanded_channel if axis == "C" else c
            block = block_cls(
                embed_dim=embed_dim,
                n_head=self.n_head,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            if axis == "T":
                from tante_tpu.ops.pallas_block import (
                    canon_t_supported,
                    fused_block_canon_t,
                )

                if (
                    self.fused
                    and self.tp_mesh is None
                    and (deterministic or self.dropout == 0.0)
                    and canon_t_supported(t, h, w, c, self.n_head)
                ):
                    # Canonical-layout T kernel: no (b h w) t rearrange on
                    # either side (ops/pallas_block.py:fused_block_canon_t).
                    x = fused_block_canon_t(x, block.block_params(), self.n_head)
                else:
                    y = rearrange(x, "b t h w c -> (b h w) t c")
                    y = block(y, causal=True, deterministic=deterministic)
                    x = rearrange(y, "(b h w) t c -> b t h w c", b=b, h=h, w=w)
            elif axis == "H":
                y = rearrange(x, "b t h w c -> (b t w) h c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "(b t w) h c -> b t h w c", b=b, t=t, w=w)
            elif axis == "W":
                y = rearrange(x, "b t h w c -> (b t h) w c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "(b t h) w c -> b t h w c", b=b, t=t, h=h)
            elif axis == "L":
                y = rearrange(x, "b t h w c -> (b t) (h w) c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "(b t) (h w) c -> b t h w c", b=b, h=h, w=w)
            elif axis == "Y":
                y = rearrange(x, "b t h w c -> (b w) (t h) c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "(b w) (t h) c -> b t h w c", b=b, t=t, h=h)
            elif axis == "X":
                y = rearrange(x, "b t h w c -> (b h) (t w) c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "(b h) (t w) c -> b t h w c", b=b, t=t, w=w)
            elif axis == "A":
                y = rearrange(x, "b t h w c -> b (t h w) c")
                y = block(y, deterministic=deterministic)
                x = rearrange(y, "b (t h w) c -> b t h w c", t=t, h=h, w=w)
            elif axis == "C":
                # Channel attention: lift each scalar channel value to an
                # expanded embedding, attend across channels, take the last
                # feature (attn_backbone.py:184-189).
                y = rearrange(x, "b t h w c -> (b t h w) c 1")
                y = Mlp(
                    hidden_features=embed_dim // 4,
                    out_features=embed_dim,
                    approximate_gelu=False,
                    dtype=self.dtype,
                    name=f"channel_lift_{channel_index}",
                )(y)
                channel_index += 1
                y = block(y, deterministic=deterministic)[..., -1]
                x = rearrange(y, "(b t h w) c -> b t h w c", b=b, t=t, h=h, w=w)
            else:
                raise ValueError(f"Invalid attention axis '{axis}'")
            i += 1
        return x
