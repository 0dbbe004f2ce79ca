"""Adaptive average pooling / resize ops (channels-last, static shapes).

``adaptive_avg_pool2d`` reproduces torch's semantics (bin i covers
``[floor(i*In/Out), ceil((i+1)*In/Out))``) using an integral-image (cumsum)
formulation: one cumsum per axis plus gathers at static bin boundaries —
XLA-friendly, no data-dependent shapes.  Used by ``RealConv2d``
(reference ``models/enc_dec_cnn.py:109``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bin_edges(in_size: int, out_size: int):
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int32)
    return starts, ends


def _adaptive_pool_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    starts, ends = _bin_edges(in_size, out_size)
    csum = jnp.cumsum(x, axis=axis)
    csum = jnp.concatenate(
        [jnp.zeros_like(jnp.take(csum, jnp.array([0]), axis=axis)), csum], axis=axis
    )
    hi = jnp.take(csum, jnp.asarray(ends), axis=axis)
    lo = jnp.take(csum, jnp.asarray(starts), axis=axis)
    counts = (ends - starts).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    return (hi - lo) / jnp.asarray(counts).reshape(shape)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., H_out, W_out, C)."""
    h_out, w_out = output_size
    x = _adaptive_pool_axis(x, -3, h_out)
    x = _adaptive_pool_axis(x, -2, w_out)
    return x


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (torch align_corners=False).

    x: (..., H, W, C) -> (..., H_out, W_out, C).
    """
    import jax.image

    h_out, w_out = size
    out_shape = (*x.shape[:-3], h_out, w_out, x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear")
