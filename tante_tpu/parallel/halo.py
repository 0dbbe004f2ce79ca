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


def sharded_spectral_conv2d_centered(
    mesh: Mesh,
    x: jnp.ndarray,
    weight: jnp.ndarray,
    modes1: int,
    modes2: int,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """H-sharded centered-mode spectral convolution (the FNO primitive,
    ``ops/spectral.py:spectral_conv2d_centered``) — the model-level consumer
    of spatial sharding (VERDICT r3 item #3).

    TPU-native design: instead of a distributed FFT, the partial-DFT form
    (the repo's production spectral path — only the kept modes are computed,
    as dense MXU matmuls) decomposes perfectly over an H-sharded field:

      forward  — the W-mode contraction is local (W unsharded); the H-mode
                 contraction splits into per-shard partial sums over the
                 local H rows + ONE ``psum`` of the tiny (B, m1, m2r, C)
                 mode block (the only communication);
      mixing   — the replicated complex weight mixes channels locally
                 (identical on every shard; the mode block is tiny);
      inverse  — each shard reconstructs only its own H rows (a local
                 matmul with its column slice of the inverse DFT matrix);
                 the W inverse is local.

    Exactly equal to the unsharded op up to f32 reduction order (asserted
    in ``tests/test_parallel.py``).  Per-shard peak memory is
    O(B * H/n * W * C) — the full field never materializes on one device.

    x: GLOBAL (B, H, W, C) with H sharded over ``axis_name`` (or about to
    be; shard_map constrains it).  weight: (Cin, Cout, m1, m2r_full, 2)
    replicated.  Batch stays sharded over 'dp' when the mesh has one.
    """
    from tante_tpu.ops.spectral import _partial_rdft_mats

    h, w = int(x.shape[1]), int(x.shape[2])
    wf_s = w // 2 + 1
    m1 = min(modes1, h)
    m2r = min(modes2 // 2 + 1, wf_s)
    m1_pos = (m1 + 1) // 2
    m1_neg = m1 - m1_pos
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    if h % n != 0:
        raise ValueError(
            f"sharded_spectral_conv2d_centered: H={h} must divide the "
            f"'{axis_name}' mesh axis ({n})"
        )
    h_loc = h // n
    mats = _partial_rdft_mats(h, w, m1_pos, m1_neg, m2r)
    fw_cos, fw_sin, fh_cos, fh_sin, iw_cos, iw_sin, ih_cos, ih_sin = mats
    batch_axis = "dp" if "dp" in mesh.axis_names else None

    def local(x_loc, wgt):
        idx = jax.lax.axis_index(axis_name)
        row0 = idx * h_loc
        # This shard's rows of the forward H-DFT matrix / columns of the
        # inverse (constants; dynamic_slice on the device index).
        fhc = jax.lax.dynamic_slice_in_dim(fh_cos, row0, h_loc, axis=0)
        fhs = jax.lax.dynamic_slice_in_dim(fh_sin, row0, h_loc, axis=0)
        xf = x_loc.astype(jnp.float32)
        t_re = jnp.einsum("bhwc,wl->bhlc", xf, fw_cos)
        t_im = -jnp.einsum("bhwc,wl->bhlc", xf, fw_sin)
        xr = jnp.einsum("bhlc,hk->bklc", t_re, fhc) + jnp.einsum(
            "bhlc,hk->bklc", t_im, fhs
        )
        xi = jnp.einsum("bhlc,hk->bklc", t_im, fhc) - jnp.einsum(
            "bhlc,hk->bklc", t_re, fhs
        )
        # The one collective: complete the H contraction over shards.
        xr = jax.lax.psum(xr, axis_name)
        xi = jax.lax.psum(xi, axis_name)
        w_k = wgt[:, :, :, :m2r]
        w_re, w_im = w_k[..., 0], w_k[..., 1]
        o_re = jnp.einsum("bijc,coij->bijo", xr, w_re) - jnp.einsum(
            "bijc,coij->bijo", xi, w_im
        )
        o_im = jnp.einsum("bijc,coij->bijo", xr, w_im) + jnp.einsum(
            "bijc,coij->bijo", xi, w_re
        )
        ihc = jax.lax.dynamic_slice_in_dim(ih_cos, row0, h_loc, axis=1)
        ihs = jax.lax.dynamic_slice_in_dim(ih_sin, row0, h_loc, axis=1)
        z_re = jnp.einsum("bklc,kh->bhlc", o_re, ihc) - jnp.einsum(
            "bklc,kh->bhlc", o_im, ihs
        )
        z_im = jnp.einsum("bklc,kh->bhlc", o_re, ihs) + jnp.einsum(
            "bklc,kh->bhlc", o_im, ihc
        )
        return jnp.einsum("bhlc,lw->bhwc", z_re, iw_cos) - jnp.einsum(
            "bhlc,lw->bhwc", z_im, iw_sin
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None, None), P()),
        out_specs=P(batch_axis, axis_name, None, None),
    )(x, weight)
