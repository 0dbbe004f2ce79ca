"""tp composition measured END-TO-END (VERDICT r3 item #6).

Round 3 measured the tp=2 Megatron half kernels per block in a harness
(scripts/tp_half_kernels_onchip.py: 0.958 vs 1.572 ms/block/shard); this
script measures what that harness can't — the COMPOSITION cost of the whole
train step under tp: shard_map entry/exit, the two psums per block, the
dus/window plumbing around the halves, the optimizer.

Hardware note: a 2-shard shard_map needs 2 devices and the image has ONE
TPU chip, so this runs on the 8-virtual-CPU mesh (the off-TPU route uses
the numerically identical XLA block math inside the same shard_map + psum
structure).  Wall-clock on CPU is a composition signal, not an ICI number;
the structural signal is the HLO collective census, which is
device-independent.

Outputs one JSON line per configuration:
  - dp=8 (no tp)          — baseline structure
  - dp=4 x tp=2, XLA math — the SPMD-partitioned route (fused_blocks=False)
  - dp=4 x tp=2, half-kernel shard_map route (tp_mesh set; XLA bodies off-TPU)
with all-reduce/all-gather/collective-permute counts from the compiled HLO
and best-of-3 wall-clock for one jitted train step.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np
import optax

from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.models import TANTE
from tante_tpu.parallel import make_mesh, shard_params
from tante_tpu.parallel.mesh import input_sharding
from tante_tpu.train.metrics import MSE
from tante_tpu.train.rollout import rollout_fixed

MD = TanteMetadata(
    dataset_name="tp_e2e",
    n_spatial_dims=2,
    spatial_resolution=(64, 128),
    field_names={0: ["f"] * 4, 1: [], 2: []},
    boundary_condition_types=["PERIODIC"],
    n_files=1,
    n_trajectories_per_file=[1],
    n_steps_per_trajectory=[8],
    n_fields=4,
)


def build(tp_mesh=None, fused=False):
    return TANTE(
        in_T=4,
        dset_metadata=MD,
        taylor_order=1,
        attn_axes="THWTHWTHW",
        embed_dim=256,
        patch_scale=8,
        n_head=8,
        mlp_ratio=1.0,
        output_length=1,
        deg=True,
        fused_blocks=fused,
        tp_mesh=tp_mesh,
    )


def census(hlo: str) -> dict:
    return {
        "all-reduce": len(re.findall(r"all-reduce(?:-start)?\(", hlo)),
        "all-gather": len(re.findall(r"all-gather(?:-start)?\(", hlo)),
        "reduce-scatter": len(re.findall(r"reduce-scatter\(", hlo)),
        "collective-permute": len(re.findall(r"collective-permute(?:-start)?\(", hlo)),
    }


def run(label: str, mesh, model, params0):
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    metric = MSE()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4, 64, 128, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 2, 64, 128, 4)).astype(np.float32))
    params = jax.tree.map(jnp.copy, params0)
    if mesh is not None:
        params = shard_params(params, mesh, enable_tp="tp" in mesh.axis_names)
        x = jax.device_put(x, input_sharding(mesh))
        y = jax.device_put(y, input_sharding(mesh))

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            y_pred = rollout_fixed(
                lambda w: model.apply({"params": p}, w), x, n_steps=2, chunk=1
            )
            return jnp.mean(metric(y_pred, y, None))

        loss, grads = jax.value_and_grad(loss_fn)(params["params"])
        updates, opt_state = tx.update(grads, opt_state, params["params"])
        return {"params": optax.apply_updates(params["params"], updates)}, opt_state, loss

    opt_state = tx.init(params["params"])
    step = jax.jit(train_step)
    ctx = mesh if mesh is not None else open(os.devnull)
    with ctx:
        compiled = step.lower(params, opt_state, x, y).compile()
        hlo = compiled.as_text()
        # warm + time
        params, opt_state, loss = step(params, opt_state, x, y)
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = step(params, opt_state, x, y)
            jax.block_until_ready(loss)
            best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "config": label,
                "step_wall_s_cpu": round(best, 3),
                "loss": round(float(loss), 6),
                "hlo_collectives": census(hlo),
            }
        ),
        flush=True,
    )
    return float(loss)


def main():
    model0 = build()
    x0 = jnp.zeros((1, 4, 64, 128, 4), jnp.float32)
    params0 = jax.jit(model0.init)(jax.random.PRNGKey(0), x0)

    mesh_dp = make_mesh(8, ("dp",), (8,))
    mesh_tp = make_mesh(8, ("dp", "tp"), (4, 2))

    l_dp = run("dp8_xla", mesh_dp, build(), params0)
    l_tp_xla = run("dp4_tp2_xla_spmd", mesh_tp, build(), params0)
    l_tp_half = run("dp4_tp2_half_kernel_shardmap", mesh_tp, build(tp_mesh=mesh_tp, fused=True), params0)
    # All three are the same math.
    assert abs(l_dp - l_tp_xla) < 5e-4 and abs(l_dp - l_tp_half) < 5e-4, (
        l_dp, l_tp_xla, l_tp_half,
    )


if __name__ == "__main__":
    main()
