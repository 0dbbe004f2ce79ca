"""Per-component timing breakdown of a TANTE call at the bench geometry.

Times jitted scan-wrapped components end-to-end on the real chip (the only
reliable methodology on the tunneled backend — see docs/PERF.md): each
component runs SCAN_LEN times inside one jit with a carry-through
dependency, synced once by materializing a scalar probe; the ~25 ms tunnel
RTT is measured with an empty scan and subtracted.

Usage: python scripts/profile_tante.py [component ...]
Components: full, backbone, block_T, block_H, block_W, encoder, decoder,
            head_misc, mlp_only, attn_only, ln_only
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
RESOLUTION = (128, 384)
N_FIELDS = 4
IN_T = 4
EMBED = 256
PATCH = 8
HEADS = 8
HP, WP = RESOLUTION[0] // PATCH, RESOLUTION[1] // PATCH
SCAN_LEN = 32
DTYPE = jnp.bfloat16


def timed(fn, x, n_rep=3):
    """Best-of-n wall-clock of one jitted call, probe-synced."""
    f = jax.jit(fn)

    @jax.jit
    def probe(y):
        return jnp.sum(jax.tree_util.tree_leaves(y)[0][(0,) * 0].ravel()[:1])

    y = f(x)
    float(probe(y))  # compile + warm
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        y = f(x)
        float(probe(y))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_wrap(op, scan_len=SCAN_LEN):
    """Repeat op scan_len times with carry dependency."""

    def fn(x):
        def body(c, _):
            y = op(c)
            return y, ()

        out, _ = jax.lax.scan(body, x, None, length=scan_len)
        return out

    return fn


def metadata():
    from tante_tpu.data.dataset import TanteMetadata

    return TanteMetadata(
        dataset_name="bench",
        n_spatial_dims=2,
        spatial_resolution=RESOLUTION,
        field_names={0: ["f"] * N_FIELDS, 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[32],
        n_fields=N_FIELDS,
    )


def main():
    want = set(sys.argv[1:]) or None
    results = {}

    def run(name, op, x, scan_len=SCAN_LEN):
        if want and name not in want:
            return
        dt = timed(scan_wrap(op, scan_len), x)
        per = (dt - rtt) / scan_len * 1e3
        results[name] = per
        print(f"{name:14s} {per:8.3f} ms/iter   (raw {dt*1e3:.1f} ms / {scan_len})")

    # RTT floor: empty-ish scan.
    x0 = jnp.ones((8, 8), DTYPE)
    rtt = timed(scan_wrap(lambda c: c + 1.0, 4), x0)
    print(f"rtt floor      {rtt*1e3:8.1f} ms")

    from tante_tpu.models import TANTE
    from tante_tpu.models.attn_backbone import AttnBackbone
    from tante_tpu.models.common import Mlp, TransformerBlock
    from tante_tpu.ops.attention import MultiheadAttention

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(BATCH, IN_T, HP, WP, EMBED)), DTYPE)

    # Full model call (head on cached latents + encode of 1 new frame),
    # mirroring rollout_tante_latent's per-iteration work.
    md = metadata()
    model = TANTE(
        in_T=IN_T,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THWTHWTHW",
        embed_dim=EMBED,
        patch_scale=PATCH,
        n_head=HEADS,
        mlp_ratio=1.0,
        output_length=1,
        deg=True,
        dtype=DTYPE,
    )
    xin = jnp.asarray(rng.normal(size=(BATCH, IN_T, *RESOLUTION, N_FIELDS)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xin)

    u0 = xin[:, -1:]

    def full_call(carry):
        lat_c = carry
        frames = model.apply(params, lat_c, u0, method="head")
        new_lat = model.apply(params, frames, method="encode")
        return jnp.concatenate([lat_c, new_lat], axis=1)[:, -IN_T:]

    run("full", full_call, lat, scan_len=16)

    # Backbone (9 axial blocks) alone.
    bb = AttnBackbone(
        tensor_shape=(IN_T, HP, WP, EMBED),
        attn_axes="THWTHWTHW",
        n_head=HEADS,
        mlp_ratio=1.0,
        dropout=0.0,
        dtype=DTYPE,
    )
    bb_params = jax.jit(bb.init)(jax.random.PRNGKey(1), lat)
    run("backbone", lambda c: bb.apply(bb_params, c), lat, scan_len=16)

    # Single TransformerBlock per axis layout (with the rearranges).
    blk = TransformerBlock(embed_dim=EMBED, n_head=HEADS, mlp_ratio=1.0, dropout=0.0, dtype=DTYPE)
    shapes = {
        "block_T": (BATCH * HP * WP, IN_T, EMBED),
        "block_H": (BATCH * IN_T * WP, HP, EMBED),
        "block_W": (BATCH * IN_T * HP, WP, EMBED),
    }
    for name, shp in shapes.items():
        y = jnp.asarray(rng.normal(size=shp), DTYPE)
        p = jax.jit(blk.init)(jax.random.PRNGKey(2), y)
        causal = name == "block_T"
        run(name, partial(lambda c, p=p, causal=causal: blk.apply(p, c, causal=causal)), y)

    # Attention / MLP / LN in the W layout (the biggest axis).
    y = jnp.asarray(rng.normal(size=shapes["block_W"]), DTYPE)
    mha = MultiheadAttention(embed_dim=EMBED, num_heads=HEADS, dtype=DTYPE)
    p_mha = jax.jit(mha.init)(jax.random.PRNGKey(3), y)
    run("attn_only", lambda c: mha.apply(p_mha, c), y)
    mlp = Mlp(hidden_features=EMBED, out_features=EMBED, dtype=DTYPE)
    p_mlp = jax.jit(mlp.init)(jax.random.PRNGKey(4), y)
    run("mlp_only", lambda c: mlp.apply(p_mlp, c), y)
    import flax.linen as nn

    ln = nn.LayerNorm(epsilon=1e-5, dtype=DTYPE)
    p_ln = jax.jit(ln.init)(jax.random.PRNGKey(5), y)
    run("ln_only", lambda c: ln.apply(p_ln, c), y)

    # Encoder on 1 frame; decoder on 1 latent.
    enc = model.bind(params)

    def enc1(c):
        return model.apply(params, c, method="encode")

    f1 = jnp.asarray(rng.normal(size=(BATCH, 1, *RESOLUTION, N_FIELDS)), jnp.float32)
    if not want or "encoder" in want:
        # Carry-through: fold the latent into the carry via a scalar mean
        # (cannot be folded away: 0*inf would change NaN semantics).
        dt = timed(scan_wrap(lambda c: c + jnp.mean(enc1(c)).astype(c.dtype), 16), f1)
        print(f"encoder(1fr)   {(dt-rtt)/16*1e3:8.3f} ms/iter")

    # head() without the backbone is hard to isolate without model surgery;
    # derive head_misc = full - backbone - encoder from the above.
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
