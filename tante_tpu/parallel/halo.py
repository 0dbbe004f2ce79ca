"""Spatial (H-axis) sharding primitives: halo exchange + sharded conv/FFT.

The reference has no sequence/context parallelism of any kind (SURVEY.md
section 2.6); its answer to big fields is axial factorization +
patchification.  This module adds the TPU-native capability for fields
beyond single-chip HBM: shard the H axis of ``(B, H, W, C)`` tensors over a
mesh axis ('sp') with

- ``halo_exchange``  -- ring ``lax.ppermute`` of boundary rows (periodic or
  zero-padded edges), the primitive convolutions need,
- ``sharded_conv2d`` -- shard_map wrapper running a 'same'-padded conv on
  H-shards with halos so the result is bitwise-equal to the unsharded conv,
- ``sharded_rfft2`` / ``sharded_irfft2`` -- transpose-based distributed
  2-D (i)rFFT: local rFFT along the unsharded W axis, then an
  ``all_to_all`` re-shard so the H axis becomes locally complete while the
  W-frequency axis is sharded, local FFT along H, and an ``all_to_all``
  back.  Peak per-device memory is O(H_full * W_freq / n) — never the full
  (H, W) plane — vs. the O(H_full * W_freq) of the earlier all-gather
  design.

All functions are meant to be called under ``shard_map`` or used through
the provided wrappers that set one up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange(
    x: jnp.ndarray, halo: int, axis_name: str = "sp", periodic: bool = True
) -> jnp.ndarray:
    """Pad the local H-shard (axis 1 of (B, H_loc, W, C)) with neighbors'
    boundary rows. Must run inside shard_map over ``axis_name``."""
    if halo == 0:
        return x
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # Receive the last rows of the left neighbor (wrap-around ring).
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(x[:, -halo:], axis_name, perm=fwd)
    from_right = jax.lax.ppermute(x[:, :halo], axis_name, perm=bwd)
    if not periodic:
        # Zero the halos at the global edges.
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(
            idx == n - 1, jnp.zeros_like(from_right), from_right
        )
    return jnp.concatenate([from_left, x, from_right], axis=1)


def sharded_conv2d(
    mesh: Mesh,
    kernel: jnp.ndarray,
    x: jnp.ndarray,
    axis_name: str = "sp",
    periodic: bool = False,
) -> jnp.ndarray:
    """'same'-padded NHWC conv with H sharded over ``axis_name``.

    kernel: (kh, kw, Cin, Cout) with odd kh/kw. Batch stays replicated here
    for clarity; compose with a 'dp' spec for batch sharding.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    halo = (kh - 1) // 2
    pad_w = (kw - 1) // 2

    def local(x_loc, k):
        xp = halo_exchange(x_loc, halo, axis_name, periodic=periodic)
        return jax.lax.conv_general_dilated(
            xp,
            k,
            window_strides=(1, 1),
            padding=((0, 0), (pad_w, pad_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
    )(x, kernel)


def _transposed_fft_h(xf: jnp.ndarray, axis_name: str, inverse: bool) -> jnp.ndarray:
    """(i)FFT along the *sharded* H axis of an (B, H_loc, Wf, C) spectrum via
    the transpose trick: all_to_all so H becomes locally complete (W-frequency
    axis sharded instead), transform locally, all_to_all back.

    ``numpy.fft.rfft2`` = rfft along W then full fft along H, so composing
    this with a local W-rfft reproduces rfft2 exactly (ortho norms multiply:
    1/sqrt(W) * 1/sqrt(H) = 1/sqrt(H*W)).  Peak per-device footprint is the
    (B, H_full, ceil(Wf/n), C) transposed block — O(full/n), never the full
    plane.  Runs inside shard_map over ``axis_name``.
    """
    n = jax.lax.psum(1, axis_name)
    wf = xf.shape[2]
    pad = (-wf) % n
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, pad), (0, 0)))
    # (B, H_loc, Wf_p, C) -> (B, H_full, Wf_p/n, C): W-frequency columns
    # scatter across devices, H rows gather locally.
    xt = jax.lax.all_to_all(xf, axis_name, split_axis=2, concat_axis=1, tiled=True)
    xt = (jnp.fft.ifft if inverse else jnp.fft.fft)(xt, axis=1, norm="ortho")
    # Padded frequency columns stay exactly zero through the H transform and
    # are sliced off after the inverse transpose.
    out = jax.lax.all_to_all(xt, axis_name, split_axis=1, concat_axis=2, tiled=True)
    if pad:
        out = out[:, :, :wf]
    return out


def sharded_rfft2(
    mesh: Mesh, x: jnp.ndarray, axis_name: str = "sp"
) -> jnp.ndarray:
    """rfft2 over (H, W) of an H-sharded (B, H, W, C) without ever
    materializing the full field on one device (transpose-based distributed
    FFT; see ``_transposed_fft_h``). Returns the H-sharded spectrum."""

    def local(x_loc):
        xf = jnp.fft.rfft(x_loc, axis=2, norm="ortho")
        return _transposed_fft_h(xf, axis_name, inverse=False)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
    )(x)


def sharded_irfft2(
    mesh: Mesh, xf: jnp.ndarray, w_size: int, axis_name: str = "sp"
) -> jnp.ndarray:
    """Inverse of ``sharded_rfft2``: H-sharded (B, Hf_loc, Wf, C) complex
    spectrum back to the H-sharded real field.  ``w_size`` is the full
    spatial W (the one-sided Wf axis is ambiguous about W's parity)."""

    def local(x_loc):
        xt = _transposed_fft_h(x_loc, axis_name, inverse=True)
        return jnp.fft.irfft(xt, n=w_size, axis=2, norm="ortho")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
    )(xf)


def spatial_sharding(mesh: Mesh, axis_name: str = "sp") -> NamedSharding:
    """Sharding for (B, H, W, C) arrays with H over ``axis_name``."""
    return NamedSharding(mesh, P(None, axis_name, None, None))
