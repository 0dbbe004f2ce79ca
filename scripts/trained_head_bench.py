"""Adaptive lane at a TRAINED operating point (VERDICT r3 item #4).

Loads a full flagship-geometry R_Trainer checkpoint (every weight trained,
no bias surgery) and measures the adaptive eval rollout on ON-DISTRIBUTION
inputs (held-out synthetic-waves windows at the trained 128x384 geometry),
reporting frames/s/chip, realized model calls per 16-step rollout, and the
realized r_t log.  This is the evidence row that the bench.py operating
point (interprator biased to r_t = K) corresponds to something a trained
head actually does; bench.py's own lane stays the synthetic-weights
throughput protocol (weights don't change speed, they change the call
count, which is what this script pins).

Usage:
  python scripts/trained_head_bench.py <experiment_dir> [--data <well_root>]
e.g.
  python scripts/trained_head_bench.py /tmp/flagship_exp/experiments/TANTE_R_FLAG \
      --data /tmp/flagship_well
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 16
K_CAP = 8  # = bench.py OUT_T_CAP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--data", default="/tmp/flagship_well")
    ap.add_argument("--dataset", default="synthetic_waves")
    ap.add_argument("--choose", default="best")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from tante_tpu.data.datamodule import TanteDataModule
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_adaptive_eval_tante
    from tante_tpu.utils.checkpoint import CheckpointManager

    dm = TanteDataModule(
        base_path=args.data,
        dataset_name=args.dataset,
        batch_size=args.batch,
        n_steps_input=4,
        n_steps_output=4,
        eval_steps_output=N_STEPS,
        data_workers=2,
        seed=0,
    )
    md = dm.test_dataset.metadata
    model = TANTE(
        in_T=4,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THWTHWTHW",
        embed_dim=256,
        patch_scale=8,
        n_head=8,
        mlp_ratio=1.0,
        output_length=1,
        deg=False,
        dtype=jnp.bfloat16,
    )
    # template params for restore
    x0 = jnp.zeros((1, 4, *md.spatial_resolution, md.n_fields), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)  # out_T static default

    ckpt = CheckpointManager(args.exp_dir)
    params = ckpt.restore_params(os.path.join(args.exp_dir, args.choose), params)
    # restore_params returns HOST numpy arrays; without an explicit
    # device_put every jitted call re-uploads the full param tree over the
    # ~25 ms-RTT tunnel (measured: 277 vs ~12k f/s at the same call count).
    params = jax.device_put(params)

    @jax.jit
    def rollout(params, x):
        y, rt_log, n_calls = rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=K_CAP,
            out_dtype=jnp.bfloat16,
        )
        return y, rt_log, n_calls

    @jax.jit
    def probe(y):
        return jnp.sum(y[..., 0, 0, 0].astype(jnp.float32))

    # On-distribution inputs: first test batches' input windows.
    loader = dm.test_dataloader()
    batches = []
    for b in loader:
        batches.append(jnp.asarray(np.asarray(b["input"], np.float32)))
        if len(batches) >= 8:
            break
    # replicate to 32 programs for pipelined-dispatch timing
    inputs = (batches * ((32 + len(batches) - 1) // len(batches)))[:32]

    y, rt_log, n_calls = rollout(params, inputs[0])
    float(probe(y))
    rts = np.asarray(rt_log)
    rts = rts[np.isfinite(rts)]
    calls_per_input = []
    for xi in inputs[: len(batches)]:
        _, rl, nc = rollout(params, xi)
        calls_per_input.append(int(nc))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [rollout(params, xi) for xi in inputs]
        float(probe(ys[-1][0]))
        dt = min(dt, time.perf_counter() - t0)
    frames = len(inputs) * args.batch * N_STEPS
    print(
        json.dumps(
            {
                "metric": "tante_adaptive_trained_head",
                "frames_per_sec_per_chip": round(frames / dt, 2),
                "model_calls_per_rollout": calls_per_input,
                "rt_first_rollout": [round(float(r), 3) for r in rts],
                "geometry": f"B{args.batch} x {N_STEPS}-step, "
                f"{md.spatial_resolution[0]}x{md.spatial_resolution[1]}x{md.n_fields}, bf16",
                "checkpoint": os.path.join(args.exp_dir, args.choose),
            }
        )
    )


if __name__ == "__main__":
    main()
