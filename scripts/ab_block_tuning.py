"""Chain-level A/B of fused-block kernel tuning knobs on the REAL bench
model (per docs/PERF.md methodology: microbench wins routinely fail to
survive the chain — only end-to-end A/B counts).

Variants (set via tante_tpu.ops.pallas_block.set_block_tuning; each gets a
fresh jit so the kernels recompile with the new tuning):
  - old928:   row_tile=928 (round-2 shipped default), safe softmax
  - snap:     divisor row_tile snap (new default), safe softmax
  - fast:     snap + "fast" softmax (bias-add mask, no max-sub, clamp 60)

Timed: one full TANTE model call (encoder+backbone+decoder) AND the full
16-step latent-cache rollout, best of 3, jitted-scalar-probe sync.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import bench
from tante_tpu.ops.pallas_block import set_block_tuning

# (name, tuning knobs, model fused_chain)
VARIANTS = [
    ("defaults", dict(row_tile=0, softmax="fast"), 0),
    ("safe-sm", dict(row_tile=0, softmax="safe"), 0),
    ("chain2", dict(row_tile=0, softmax="fast"), 2),
    ("chain3", dict(row_tile=0, softmax="fast"), 3),
]


def main():
    rollout, params, x = bench.build()

    @jax.jit
    def probe(y):
        return jnp.sum(y[..., 0, 0, 0])

    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_tante_latent

    md = TanteMetadata(
        dataset_name="bench",
        n_spatial_dims=2,
        spatial_resolution=bench.RESOLUTION,
        field_names={0: ["f"] * bench.N_FIELDS, 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[32],
        n_fields=bench.N_FIELDS,
    )
    def mk_model(fused_chain):
        return TANTE(
            in_T=bench.IN_T,
            dset_metadata=md,
            taylor_order=1,
            attn_axes="THWTHWTHW",
            embed_dim=256,
            patch_scale=8,
            n_head=8,
            mlp_ratio=1.0,
            output_length=1,
            deg=True,
            fused_chain=fused_chain,
            dtype=jnp.bfloat16,
        )

    for name, tune, fused_chain in VARIANTS:
        set_block_tuning(**tune)
        model = mk_model(fused_chain)

        # Fresh jits each variant (tuning is read at trace time).
        call = jax.jit(lambda p, w: model.apply(p, w))
        roll = jax.jit(lambda p, w: rollout_tante_latent(model, p, w, bench.N_STEPS))
        t0 = time.perf_counter()
        float(probe(call(params, x)))
        compile_s = time.perf_counter() - t0
        print(f"{name:12s} call-compile {compile_s:6.1f} s", flush=True)

        def timed(fn, iters):
            y = fn(params, x)
            float(probe(y))  # compile+run
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = fn(params, x)
                float(probe(y))
                best = min(best, time.perf_counter() - t0)
            return best / iters

        t_call = timed(call, 50) * 1e3
        t_roll = timed(roll, 2) * 1e3
        fps = bench.BATCH * bench.N_STEPS / (t_roll / 1e3)
        print(
            f"{name:12s} call {t_call:6.3f} ms   rollout {t_roll:7.2f} ms "
            f"({fps:7.1f} frames/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
