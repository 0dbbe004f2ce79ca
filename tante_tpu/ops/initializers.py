"""Weight initializers matching PyTorch defaults (training-dynamics parity).

The accuracy targets in BASELINE.md were produced with torch's default
initializations; matching their *scale* keeps early-training dynamics
comparable without copying any code:

- ``nn.Linear`` / ``nn.Conv2d`` default: kaiming_uniform(a=sqrt(5)), i.e.
  W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in including kernel taps;
  bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``nn.MultiheadAttention``: xavier_uniform in_proj, zero in_proj bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer, variance_scaling, xavier_uniform

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)): variance = 1/(3 fan_in) -> scale 1/3.
torch_kernel_init: Initializer = variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_xavier_init: Initializer = xavier_uniform()


def torch_bias_init(fan_in: int) -> Initializer:
    """bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with explicit fan_in."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def complex_spectral_init(in_channels: int, out_channels: int) -> Initializer:
    """SpectralLayer weight init (reference ``enc_dec_fno.py:191-194``):
    complex normal scaled by 1/sqrt(Cin*Cout); stored as a trailing [re, im]
    axis of a real array (TPU has no complex parameter support in optax).

    torch's ``randn(dtype=cfloat)`` draws re/im each from N(0, 1/2) (unit
    E|z|^2), so each real component gets an extra 1/sqrt(2)
    (parity-fixture-tested in tests/test_numerical_parity.py)."""
    scale = 1.0 / (2.0 * in_channels * out_channels) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * scale

    return init
