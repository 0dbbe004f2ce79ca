"""Backend dispatch helper shared by the Pallas kernels."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """Whether compute dispatches to a TPU.

    An explicitly pinned default device wins: tests pin CPU while the axon
    TPU plugin is still registered, so ``default_backend()`` alone lies.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", str(dd)) == "tpu"
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
