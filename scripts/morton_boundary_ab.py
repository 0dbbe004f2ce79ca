"""Morton frame-boundary layout A/B: the rollout's out-of-loop cost.

The morton rollout (train/rollout.py:rollout_tante_latent) pays ~3.1 ms
per 16-step rollout OUTSIDE the scan: morton_pack_grouped of the input
window and morton_unpack_grouped of the emitted frame buffer.  Both are
9-D transposes whose innermost moving unit is C=4 lanes (8 bytes) —
measured ~30x off HBM bandwidth (docs/PERF.md round-3 second wave).

Candidate: the "hsplit" factorization.  Order the in-row lanes
(h_off, w_off, c) instead of quad-tree (h2, w2, h1, w1, h0, w0, c); then
pack/unpack become ONE 4-D transpose whose moving unit is (w_off, c) =
s*C = 32 contiguous lanes (64 B in bf16), and the in-row order change is
a fixed 256x256 permutation that FOLDS INTO the already-materialized
stage-boundary kron weights of EncCNN/DecCNN (zero runtime cost).

This script measures, at the flagship bench geometry (ps=(2,2,2),
128x384x4, bf16, B=8 frames/step, scan 32):
  - HBM floor (pure add at the same volume)
  - current morton_pack_grouped / morton_unpack_grouped
  - hsplit reshape+transpose form
  - hsplit via one-hot MXU einsum (contraction over the wc axis)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.ops.convs import morton_pack_grouped, morton_unpack_grouped

DTYPE = jnp.bfloat16
SCAN = 32
PS = (2, 2, 2)
H, W, C = 128, 384, 4
B = 8
S = PS[0] * PS[1] * PS[2]
HC, WC = H // S, W // S
ROWS, LANES = HC * WC, S * S * C


def hsplit_pack(x):
    z = x.reshape(*x.shape[:-3], HC, S, WC, S * C)
    nd = z.ndim
    z = z.transpose(*range(nd - 4), nd - 4, nd - 2, nd - 3, nd - 1)
    return z.reshape(*x.shape[:-3], ROWS, LANES)


def hsplit_unpack(z):
    y = z.reshape(*z.shape[:-2], HC, WC, S, S * C)
    nd = y.ndim
    y = y.transpose(*range(nd - 4), nd - 4, nd - 2, nd - 3, nd - 1)
    return y.reshape(*z.shape[:-2], H, W, C)


I_WC = jnp.eye(WC, dtype=DTYPE)


def hsplit_pack_mxu(x):
    z = x.reshape(*x.shape[:-3], HC, S, WC, S * C)
    z = jnp.einsum("...xhwl,wv->...xvhl", z, I_WC)
    return z.reshape(*x.shape[:-3], ROWS, LANES)


def hsplit_unpack_mxu(z):
    y = z.reshape(*z.shape[:-2], HC, WC, S, S * C)
    y = jnp.einsum("...xwhl,wv->...xhvl", y, I_WC)
    return y.reshape(*z.shape[:-2], H, W, C)


def timed(fn, *args):
    f = jax.jit(fn)

    @jax.jit
    def probe(y):
        return jnp.sum(jax.tree_util.tree_leaves(y)[0].ravel()[:1])

    y = f(*args)
    float(probe(y))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = f(*args)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_accum(op, x_steps, c0):
    """carry += op(x_i): forces the op output layout to materialize."""

    def fn(xs, c):
        def body(c, xi):
            return c + op(xi), ()

        out, _ = jax.lax.scan(body, c, xs)
        return out

    return fn, x_steps, c0


def main():
    rng = np.random.default_rng(0)
    phys = jnp.asarray(rng.normal(size=(SCAN, B, H, W, C)), DTYPE)
    packed = jnp.asarray(rng.normal(size=(SCAN, B, ROWS, LANES)), DTYPE)
    c_phys = jnp.zeros((B, H, W, C), DTYPE)
    c_pack = jnp.zeros((B, ROWS, LANES), DTYPE)

    rtt = timed(*scan_accum(lambda z: z, packed, c_pack))
    print(f"floor (pure add, same volume): {rtt/SCAN*1e3:.3f} ms/step")

    # correctness of the hsplit pair
    x1 = phys[0]
    np.testing.assert_array_equal(
        np.asarray(hsplit_unpack(hsplit_pack(x1))), np.asarray(x1)
    )
    np.testing.assert_array_equal(
        np.asarray(hsplit_unpack_mxu(hsplit_pack(x1))), np.asarray(x1)
    )
    np.testing.assert_array_equal(
        np.asarray(hsplit_unpack(hsplit_pack_mxu(x1))), np.asarray(x1)
    )
    print("hsplit roundtrip exact: ok")

    for name, op, xs, c0 in [
        ("pack   current", lambda x: morton_pack_grouped(x, PS), phys, c_pack),
        ("pack   hsplit ", hsplit_pack, phys, c_pack),
        ("pack   hsp-mxu", hsplit_pack_mxu, phys, c_pack),
        ("unpack current", lambda z: morton_unpack_grouped(z, PS, (H, W)), packed, c_phys),
        ("unpack hsplit ", hsplit_unpack, packed, c_phys),
        ("unpack hsp-mxu", hsplit_unpack_mxu, packed, c_phys),
    ]:
        dt = timed(*scan_accum(op, xs, c0))
        print(f"{name}: {(dt/SCAN)*1e3:.3f} ms/step ({B} frames)")


if __name__ == "__main__":
    main()
