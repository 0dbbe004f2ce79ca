"""Adaptive-lane operating-point sweep (VERDICT r3 item #1).

Measures the adaptive eval rollout at K frames/call in {4, 8, 16} with the
interprator biased to r_t = K (the padded-dus engine consumes K frames per
call -> 16-step rollout takes ceil(16/K) calls), plus the out-of-loop cost
in isolation (morton pack + initial encode + unpack, no while-loop).

Methodology: bench.py protocol — pipelined dispatch, one probe sync,
best-of-3, MEASURE_ITERS programs per pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B


def build_adaptive_k(k: int):
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_adaptive_eval_tante

    md = TanteMetadata(
        dataset_name="bench",
        n_spatial_dims=2,
        spatial_resolution=B.RESOLUTION,
        field_names={0: ["f"] * B.N_FIELDS, 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[32],
        n_fields=B.N_FIELDS,
    )
    model = TANTE(
        in_T=B.IN_T,
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
    x = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(B.BATCH, B.IN_T, *B.RESOLUTION, B.N_FIELDS))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    head = params["params"]["interprators_0"]["TorchDense_2"]["Dense_0"]
    head["kernel"] = jnp.zeros_like(head["kernel"])
    head["bias"] = jnp.full_like(head["bias"], float(k) - 1.001)

    @jax.jit
    def rollout(params, x):
        y, rt_log, n_calls = rollout_adaptive_eval_tante(
            model, params, x, B.N_STEPS, max_frames_per_call=k,
            out_dtype=jnp.bfloat16,
        )
        return y, n_calls

    return model, rollout, params, x


def build_outofloop(model, params):
    """Out-of-loop cost in isolation: pack window + initial encode-equivalent
    + unpack of an n_steps bf16 buffer. No while-loop."""
    from tante_tpu.models.enc_dec_cnn import PATCH_MAP
    from tante_tpu.ops.convs import morton_pack_grouped, morton_unpack_grouped

    ps = PATCH_MAP[model.patch_scale]

    @jax.jit
    def oob(x):
        res = tuple(x.shape[2:4])
        win = morton_pack_grouped(x.astype(model.dtype), ps)
        u0 = morton_pack_grouped(x[:, -1:], ps)
        # fake n_steps output buffer in packed space, unpack it
        buf = jnp.zeros(
            (x.shape[0], B.N_STEPS) + u0.shape[2:], dtype=jnp.bfloat16
        ) + win.mean()
        return morton_unpack_grouped(buf, ps, res), u0.sum()

    return oob


def timed(fn, inputs, probe_of):
    dt = float("inf")
    outs = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(xi) for xi in inputs]
        float(probe_of(outs[-1]))
        dt = min(dt, time.perf_counter() - t0)
    return dt, outs


def main():
    @jax.jit
    def _probe(y):
        return jnp.sum(y[..., 0, 0, 0].astype(jnp.float32))

    results = {}
    for k in (4, 8, 16):
        model, rollout, params, x = build_adaptive_k(k)
        run = lambda xi: rollout(params, xi)
        for _ in range(B.WARMUP_ITERS):
            y, n = run(x)
            float(_probe(y))
        inputs = [x + 0.001 * i for i in range(B.MEASURE_ITERS)]
        for xi in inputs:
            xi.block_until_ready()
        dt, outs = timed(run, inputs, lambda o: _probe(o[0]))
        calls = max(int(o[1]) for o in outs)
        frames = B.MEASURE_ITERS * B.BATCH * B.N_STEPS
        fps = frames / dt
        results[f"k{k}"] = {"fps": round(fps, 1), "calls": calls,
                            "ms_per_rollout": round(1000 * dt / B.MEASURE_ITERS, 3)}
        print(json.dumps({"k": k, **results[f"k{k}"]}), flush=True)

    # out-of-loop isolation at the k=8 model
    model, rollout, params, x = build_adaptive_k(8)
    oob = build_outofloop(model, params)
    for _ in range(B.WARMUP_ITERS):
        y, s = oob(x)
        float(_probe(y))
    inputs = [x + 0.001 * i for i in range(B.MEASURE_ITERS)]
    for xi in inputs:
        xi.block_until_ready()
    dt, _ = timed(oob, inputs, lambda o: _probe(o[0]))
    results["out_of_loop_ms"] = round(1000 * dt / B.MEASURE_ITERS, 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
