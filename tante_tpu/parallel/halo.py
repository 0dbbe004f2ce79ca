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
- ``sharded_rfft2``  -- all-gather along 'sp', local FFT, re-slice (spectral
  layers mix globally along H, so a gather is required; a transpose-based
  distributed FFT is a later optimization).

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


def sharded_rfft2(
    mesh: Mesh, x: jnp.ndarray, axis_name: str = "sp"
) -> jnp.ndarray:
    """rfft2 over (H, W) of an H-sharded (B, H, W, C): gather H locally,
    transform, return the H-sharded spectrum (H frequencies re-sharded)."""

    def local(x_loc):
        full = jax.lax.all_gather(x_loc, axis_name, axis=1, tiled=True)
        xf = jnp.fft.rfft2(full, axes=(1, 2), norm="ortho")
        n = jax.lax.psum(1, axis_name)
        idx = jax.lax.axis_index(axis_name)
        shard = xf.shape[1] // n
        return jax.lax.dynamic_slice_in_dim(xf, idx * shard, shard, axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
    )(x)


def spatial_sharding(mesh: Mesh, axis_name: str = "sp") -> NamedSharding:
    """Sharding for (B, H, W, C) arrays with H over ``axis_name``."""
    return NamedSharding(mesh, P(None, axis_name, None, None))
