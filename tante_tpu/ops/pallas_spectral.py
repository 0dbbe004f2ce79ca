"""Pallas TPU kernel: fused truncated-mode complex spectral matmul.

The hot op inside every spectral convolution (FNO/TFNO/SpectralLayer/UNO):
per retained Fourier mode m, a complex channel-mixing matmul

    out[b, m, :] = x[b, m, :] @ w[m, :, :]        (complex)

XLA lowers the complex einsum to 4 real batched matmuls with separate HBM
round-trips for the intermediate real/imag products.  This kernel fuses all
four contractions and the combine in VMEM: one pass over the mode tiles,
each tile doing 4 MXU ``dot_general``s on resident data.

Layout: complex tensors are carried as separate (re, im) real arrays (the
framework stores spectral weights that way already, ops/spectral.py).

  x_re, x_im: (B, M, Cin)    w_re, w_im: (M, Cin, Cout)
  -> out_re, out_im: (B, M, Cout)

Grid: 1-D over mode tiles.  Channel dims are zero-padded to the 128-lane
boundary by the caller wrapper (``spectral_mode_matmul``) so the MXU tiles
cleanly; padding contributes zeros to the contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, wr_ref, wi_ref, or_ref, oi_ref):
    xr = xr_ref[:]  # (mt, B, Cin) -- mode-major so batch dims line up
    xi = xi_ref[:]
    wr = wr_ref[:]  # (mt, Cin, Cout)
    wi = wi_ref[:]

    # Mosaic requires the batch dim at the same position in both operands:
    # batch dim 0 (modes), contract Cin (lhs dim 2 x rhs dim 1).
    dn = (((2,), (1,)), ((0,), (0,)))
    rr = jax.lax.dot_general(xr, wr, dn, preferred_element_type=jnp.float32)
    ii = jax.lax.dot_general(xi, wi, dn, preferred_element_type=jnp.float32)
    ri = jax.lax.dot_general(xr, wi, dn, preferred_element_type=jnp.float32)
    ir = jax.lax.dot_general(xi, wr, dn, preferred_element_type=jnp.float32)
    or_ref[:] = rr - ii  # (mt, B, Cout)
    oi_ref[:] = ri + ir


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("mode_tile", "interpret"))
def spectral_mode_matmul(
    x_re: jnp.ndarray,
    x_im: jnp.ndarray,
    w_re: jnp.ndarray,
    w_im: jnp.ndarray,
    mode_tile: int = 8,
    interpret: bool = False,
):
    """Fused complex per-mode matmul.

    x_*: (B, M, Cin); w_*: (M, Cin, Cout) -> (out_re, out_im): (B, M, Cout).
    """
    b, m, c_in = x_re.shape
    c_out = w_re.shape[-1]

    # Pad channels to the 128-lane boundary and modes to the tile.
    c_in_p = _round_up(c_in, 128)
    c_out_p = _round_up(c_out, 128)
    m_p = _round_up(m, mode_tile)

    def pad(a, shape):
        return jnp.zeros(shape, a.dtype).at[tuple(slice(0, s) for s in a.shape)].set(a)

    # Mode-major layouts: x (M, B, Cin), out (M, B, Cout).
    xr = pad(jnp.swapaxes(x_re, 0, 1), (m_p, b, c_in_p))
    xi = pad(jnp.swapaxes(x_im, 0, 1), (m_p, b, c_in_p))
    wr = pad(w_re, (m_p, c_in_p, c_out_p))
    wi = pad(w_im, (m_p, c_in_p, c_out_p))

    grid = (m_p // mode_tile,)
    x_spec = pl.BlockSpec(
        (mode_tile, b, c_in_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (mode_tile, c_in_p, c_out_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (mode_tile, b, c_out_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    out_shape = jax.ShapeDtypeStruct((m_p, b, c_out_p), jnp.float32)
    o_re, o_im = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m_p * c_in_p * c_out_p,
            bytes_accessed=4 * (2 * b * m_p * (c_in_p + c_out_p) + 2 * m_p * c_in_p * c_out_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, wr, wi)
    o_re = jnp.swapaxes(o_re, 0, 1)
    o_im = jnp.swapaxes(o_im, 0, 1)
    return o_re[:, :m, :c_out], o_im[:, :m, :c_out]


def spectral_mode_matmul_xla(x_re, x_im, w_re, w_im):
    """Reference XLA path (used for validation and as CPU fallback)."""
    rr = jnp.einsum("bmi,mio->bmo", x_re, w_re)
    ii = jnp.einsum("bmi,mio->bmo", x_im, w_im)
    ri = jnp.einsum("bmi,mio->bmo", x_re, w_im)
    ir = jnp.einsum("bmi,mio->bmo", x_im, w_re)
    return rr - ii, ri + ir
