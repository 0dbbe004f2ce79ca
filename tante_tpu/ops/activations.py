"""Activation helpers shared across model families.

``gelu``: exact erf-GELU under f32 (numerical-parity / transplant tests
compare against torch's default ``nn.GELU()`` in f32), tanh approximation
under bf16 compute, where the forms differ by <= ~1.5e-3 relative — below
bf16's own quantization step (2^-8 ~= 3.9e-3) — while erf costs ~2x on the
VPU (measured ~0.1 ms per 12.6 MB tensor at the bench geometry; see
docs/PERF.md).  Same dtype gate as ``models/enc_dec_cnn.py:_gelu`` and the
attention backbone's MLP, applied zoo-wide.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def gelu(z: jnp.ndarray) -> jnp.ndarray:
    """erf-GELU (f32 parity) / tanh-GELU (bf16), gated on the array dtype."""
    return nn.gelu(z, approximate=z.dtype == jnp.bfloat16)
