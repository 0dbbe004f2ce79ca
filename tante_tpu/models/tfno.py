"""TFNO baseline — Tucker-factorized Fourier Neural Operator (native JAX).

The reference wraps ``neuralop.models.TFNO`` (``models/tfno.py:3,90-96``),
whose spectral weights are stored in Tucker (core + factor matrices) form.
neuralop is torch-only, so the factorization is implemented here directly:

  W[ci, co, i, j] = sum_{a,b,c,d} G[a,b,c,d] U0[ci,a] U1[co,b] U2[i,c] U3[j,d]

with complex core/factors stored as real arrays with a trailing [re, im]
axis.  The full weight is reconstructed once per layer call (a tiny einsum
relative to the FFT + mode matmul) and fed into the same centered-mode
spectral convolution as FNO — so TFNO shares FNO's compute path and only
changes the parameterization (the point of the factorization: fewer
parameters at equal modes).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models.common import TorchDense
from tante_tpu.models.fno import SoftGate
from tante_tpu.ops.spectral import (
    spectral_conv2d_centered,
    spectral_conv2d_centered_cw,
)
from tante_tpu.ops.activations import gelu


def _tucker_ranks(shape: Sequence[int], rank: float) -> tuple:
    return tuple(max(1, int(round(rank * s))) for s in shape)


class TuckerSpectralWeight(nn.Module):
    """Complex Tucker-factorized (Cin, Cout, m1, m2r) spectral weight."""

    shape: tuple  # (Cin, Cout, m1, m2r)
    rank: float = 0.5

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        ranks = _tucker_ranks(self.shape, self.rank)
        # Match the dense init variance 1/(Cin*Cout): distribute across the
        # core and 4 factors so the reconstructed tensor has ~that scale.
        n_factors = len(self.shape) + 1
        target_std = (1.0 / (self.shape[0] * self.shape[1])) ** 0.5
        # Each complex factor entry ~ N(0, s^2); product of 5 independent
        # factors summed over prod(ranks) terms ->
        # std ~= s^n * sqrt(prod(ranks)).
        s = (target_std / math.sqrt(max(1, math.prod(ranks)))) ** (1.0 / n_factors)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.normal(key, shape, dtype) * (s / 2**0.5)

        core = self.param("core", init, (*ranks, 2))
        factors = [
            self.param(f"factor_{i}", init, (dim, r, 2))
            for i, (dim, r) in enumerate(zip(self.shape, ranks))
        ]

        def cplx(a):
            return a[..., 0] + 1j * a[..., 1]

        w = cplx(core)
        w = jnp.einsum("abcd,ia->ibcd", w, cplx(factors[0]))
        w = jnp.einsum("ibcd,ob->iocd", w, cplx(factors[1]))
        w = jnp.einsum("iocd,mc->iomd", w, cplx(factors[2]))
        w = jnp.einsum("iomd,nd->iomn", w, cplx(factors[3]))
        return jnp.stack([w.real, w.imag], axis=-1)  # (Cin,Cout,m1,m2r,2)


class TFNOBlock(nn.Module):
    hidden: int
    modes1: int
    modes2: int
    rank: float = 0.5
    last: bool = False
    dtype: jnp.dtype = jnp.float32
    cw: bool = False  # channel-sublane (B, H, C, W) layout (see models/fno.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        m2r = self.modes2 // 2 + 1
        weight = TuckerSpectralWeight(
            shape=(self.hidden, self.hidden, self.modes1, m2r), rank=self.rank
        )()
        # dtype-gated inside (ops/spectral.py): bf16 field-space, f32
        # accumulation; f32 input keeps the exact parity path.
        if self.cw:
            y = spectral_conv2d_centered_cw(x, weight, self.modes1, self.modes2)
        else:
            y = spectral_conv2d_centered(x, weight, self.modes1, self.modes2)
        y = y.astype(x.dtype)
        y = y + TorchDense(self.hidden, dtype=self.dtype, cw=self.cw)(x)
        y = gelu(y)
        z = TorchDense(self.hidden // 2, dtype=self.dtype, cw=self.cw)(y)
        z = gelu(z)
        z = TorchDense(self.hidden, dtype=self.dtype, cw=self.cw)(z)
        y = z + SoftGate(cw=self.cw)(y)
        if not self.last:
            y = gelu(y)
        return y


class TFNO(nn.Module):
    in_T: int
    dset_metadata: Optional[TanteMetadata] = None
    modes1: int = 16
    modes2: int = 16
    modes3: int = 16
    hidden_channels: int = 64
    n_layers: int = 4
    rank: float = 0.5
    gradient_checkpointing: bool = False
    output_length: int = 1
    dtype: jnp.dtype = jnp.float32
    # channel-sublane internals by default; measured on chip 3417 -> 4248
    # f/s at the zoo protocol (docs/PERF.md round 5; see models/fno.py).
    layout: str = "cw"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, T, H, W, C) -> (B, 1, H, W, C)."""
        b, t, h, w, c = x.shape
        z = jnp.moveaxis(x, 1, -2).reshape(b, h, w, t * c)
        cw = self.layout == "cw"
        if cw:
            z = jnp.swapaxes(z, -1, -2)  # (B, H, TC, W)
        z = TorchDense(self.hidden_channels * 2, dtype=self.dtype, cw=cw)(z)
        z = gelu(z)
        z = TorchDense(self.hidden_channels, dtype=self.dtype, cw=cw)(z)
        block_cls = nn.remat(TFNOBlock) if self.gradient_checkpointing else TFNOBlock
        for i in range(self.n_layers):
            z = block_cls(
                hidden=self.hidden_channels,
                modes1=self.modes1,
                modes2=self.modes2,
                rank=self.rank,
                last=(i == self.n_layers - 1),
                dtype=self.dtype,
                cw=cw,
            )(z)
        z = TorchDense(self.hidden_channels * 2, dtype=self.dtype, cw=cw)(z)
        z = gelu(z)
        z = TorchDense(c, dtype=self.dtype, cw=cw)(z)
        if cw:
            z = jnp.swapaxes(z, -1, -2)
        return z[:, None]
