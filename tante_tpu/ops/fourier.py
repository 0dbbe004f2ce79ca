"""Fourier token-mixing primitives shared by AFNO and DPOT.

Block-diagonal complex channel MLPs applied in rfft2 space: the channel
axis is split into ``num_blocks`` groups and each group gets its own small
complex matrix — a batched (modes x blocks) matmul that tiles well on the
MXU after XLA decomposes the complex arithmetic into 4 real contractions.
"""

from __future__ import annotations

import jax.numpy as jnp


def softshrink(x: jnp.ndarray, lambd: float) -> jnp.ndarray:
    """sign(x) * max(|x| - lambd, 0) (torch.nn.functional.softshrink)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


def block_diag_complex_matmul(
    x_re: jnp.ndarray,
    x_im: jnp.ndarray,
    w_re: jnp.ndarray,
    w_im: jnp.ndarray,
):
    """(.., nb, bs) complex x per-block (nb, bs, bs') complex weights.

    Returns (out_re, out_im), each (..., nb, bs').
    """
    rr = jnp.einsum("...bi,bio->...bo", x_re, w_re)
    ii = jnp.einsum("...bi,bio->...bo", x_im, w_im)
    ri = jnp.einsum("...bi,bio->...bo", x_re, w_im)
    ir = jnp.einsum("...bi,bio->...bo", x_im, w_re)
    return rr - ii, ir + ri
