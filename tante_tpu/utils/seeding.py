"""Seeding utilities (reference ``utils.py:19-34`` equivalent).

JAX PRNG keys are explicit, so "seeding the framework" means producing a
root key; numpy/random are seeded for host-side shuffling in the data
pipeline.  There is no cudnn-style global mutable state to configure:
XLA compilation is deterministic given the same program.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 0xD3) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)
