"""Layout micro-experiments: why do identical-token-count ops cost 5x more
in the (6144, 4, 256) T-layout than in (512, 48, 256)?  Plus propagator
(axis-Linear) formulations."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16
SCAN = 32


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


def scan_wrap(op):
    def fn(x):
        def body(c, _):
            return op(c), ()

        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return out

    return fn


def main():
    rng = np.random.default_rng(0)
    rtt = timed(scan_wrap(lambda c: c + 1.0), jnp.ones((8, 8), DTYPE))
    print(f"rtt {rtt*1e3:.1f} ms")
    w = jnp.asarray(rng.normal(size=(256, 768)) * 0.02, DTYPE)
    w2 = jnp.asarray(rng.normal(size=(768, 256)) * 0.02, DTYPE)

    def report(name, op, x):
        dt = timed(scan_wrap(op), x)
        print(f"{name:34s} {(dt-rtt)/SCAN*1e3:7.3f} ms")

    shapes = {
        "T (6144,4,256)": (6144, 4, 256),
        "H (1536,16,256)": (1536, 16, 256),
        "W (512,48,256)": (512, 48, 256),
        "flat (24576,256)": (24576, 256),
    }
    for name, shp in shapes.items():
        x = jnp.asarray(rng.normal(size=shp), DTYPE)
        report(f"dense768 {name}", lambda c: ((c @ w) @ w2), x)

    ln = nn.LayerNorm(epsilon=1e-5, dtype=DTYPE)
    for name, shp in shapes.items():
        x = jnp.asarray(rng.normal(size=shp), DTYPE)
        p = ln.init(jax.random.PRNGKey(0), x)
        report(f"LN {name}", lambda c, p=p: ln.apply(p, c) + c, x)

    # Propagator formulations on (8, 4, 16, 48, 256).
    x5 = jnp.asarray(rng.normal(size=(8, 4, 16, 48, 256)), DTYPE)
    wh1 = jnp.asarray(rng.normal(size=(16, 16)) * 0.1, DTYPE)
    wh2 = jnp.asarray(rng.normal(size=(16, 16)) * 0.1, DTYPE)

    def prop_moveaxis(c):  # current AxisPropagator (H axis=2)
        m = jnp.moveaxis(c, 2, -1)
        y = nn.gelu(m @ wh1, approximate=False) @ wh2
        return c + jnp.moveaxis(y, -1, 2)

    def prop_einsum(c):
        y = jnp.einsum("bthwc,hj->btjwc", c, wh1)
        y = nn.gelu(y, approximate=False)
        y = jnp.einsum("btjwc,jh->bthwc", y, wh2)
        return c + y

    report("propH moveaxis", prop_moveaxis, x5)
    report("propH einsum", prop_einsum, x5)

    ww1 = jnp.asarray(rng.normal(size=(48, 48)) * 0.1, DTYPE)
    ww2 = jnp.asarray(rng.normal(size=(48, 48)) * 0.1, DTYPE)

    def propw_moveaxis(c):
        m = jnp.moveaxis(c, 3, -1)
        y = nn.gelu(m @ ww1, approximate=False) @ ww2
        return c + jnp.moveaxis(y, -1, 3)

    def propw_einsum(c):
        y = jnp.einsum("bthwc,wj->bthjc", c, ww1)
        y = nn.gelu(y, approximate=False)
        y = jnp.einsum("bthjc,jw->bthwc", y, ww2)
        return c + y

    report("propW moveaxis", propw_moveaxis, x5)
    report("propW einsum", propw_einsum, x5)

    wt1 = jnp.asarray(rng.normal(size=(4, 4)) * 0.1, DTYPE)
    wt2 = jnp.asarray(rng.normal(size=(4, 4)) * 0.1, DTYPE)

    def propt_moveaxis(c):
        m = jnp.moveaxis(c, 1, -1)
        y = nn.gelu(m @ wt1, approximate=False) @ wt2
        return c + jnp.moveaxis(y, -1, 1)

    def propt_einsum(c):
        y = jnp.einsum("bthwc,tj->bjhwc", c, wt1)
        y = nn.gelu(y, approximate=False)
        y = jnp.einsum("bjhwc,jt->bthwc", y, wt2)
        return c + y

    report("propT moveaxis", propt_moveaxis, x5)
    report("propT einsum", propt_einsum, x5)

    # all three propagators chained, both forms
    report("prop3 moveaxis", lambda c: propt_moveaxis(propw_moveaxis(prop_moveaxis(c))), x5)
    report("prop3 einsum", lambda c: propt_einsum(propw_einsum(prop_einsum(c))), x5)

    # rearrange costs between block layouts
    from einops import rearrange

    # round-trip = 2 rearranges (+1 to defeat CSE of an identity round-trip)
    report(
        "rearr T roundtrip",
        lambda c: rearrange(
            rearrange(c, "b t h w c -> (b h w) t c") + 1.0,
            "(b h w) t c -> b t h w c",
            b=8,
            h=16,
            w=48,
        ),
        x5,
    )
    report(
        "rearr W roundtrip",
        lambda c: rearrange(
            rearrange(c, "b t h w c -> (b t h) w c") + 1.0,
            "(b t h) w c -> b t h w c",
            b=8,
            t=4,
            h=16,
        ),
        x5,
    )
    report(
        "rearr H roundtrip",
        lambda c: rearrange(
            rearrange(c, "b t h w c -> (b t w) h c") + 1.0,
            "(b t w) h c -> b t h w c",
            b=8,
            t=4,
            w=48,
        ),
        x5,
    )


if __name__ == "__main__":
    main()
