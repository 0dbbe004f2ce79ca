"""Zoo rollout throughput on one TPU chip: every model family at the
Turbulent-Radiative-Layer geometry (128 x 384, 4 fields), 4-step eval
rollout (the published table's protocol), bf16 inputs, shipped config
sizes.  Prints one JSON line per model; failures are reported, not fatal.

Methodology: bench.py's (pipelined dispatch, one scalar-probe sync,
best-of-3); per-model compile rides the persistent cache where possible.
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

try:
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

from tante_tpu.config import instantiate, load_config
from tante_tpu.data.dataset import TanteMetadata
from tante_tpu.train.rollout import rollout_fixed, rollout_fixed_stateful, rollout_tante_latent

BATCH = 8
RES = (128, 384)
NF = 4
IN_T = 4
N_STEPS = 4  # the published table's 4-step protocol
REPS = 16

MD = TanteMetadata(
    dataset_name="zoo_bench",
    n_spatial_dims=2,
    spatial_resolution=RES,
    field_names={0: ["f"] * NF, 1: [], 2: []},
    boundary_condition_types=["PERIODIC"],
    n_files=1,
    n_trajectories_per_file=[1],
    n_steps_per_trajectory=[32],
    n_fields=NF,
)

MODELS = ["tante", "fno", "tfno", "afno", "uno", "dpot", "avit", "cvit",
          "unet_convnext", "unet_att"]


def build_rollout(name: str, bf16: bool = True, overrides=None):
    """(rollout, params, x, chunk) for one zoo family at the bench
    protocol — shared by the timing loop below and scripts/zoo_trace.py.
    ``overrides``: dotted config overrides (e.g. ``model.layout=cw``)."""
    cfg = load_config(name, overrides=list(overrides or []))
    model = instantiate(cfg.model, dset_metadata=MD)
    # bf16 compute — the protocol the per-family A100 bound is granted
    # (A100 bf16 peak; the reference trains under bf16 AMP,
    # trainer/trainer.py:102-105).  Matches the Trainer's enable_amp clone.
    if bf16 and hasattr(model, "dtype"):
        model = model.clone(dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, IN_T, *RES, NF)).astype(np.float32)
    )
    chunk = int(getattr(model, "output_length", None) or getattr(model, "out_steps", None)
                or getattr(model, "out_timesteps", None) or getattr(model, "out_T", None) or 1)
    is_tante = name.startswith("tante")
    has_state = name == "unet_att"  # BatchNorm batch_stats
    if is_tante and getattr(model, "deg", True):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def rollout(params, x):
            return rollout_tante_latent(model, params, x, N_STEPS, out_dtype=jnp.bfloat16)

    elif is_tante:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, 1.5)

        from tante_tpu.train.rollout import rollout_adaptive_eval_tante

        @jax.jit
        def rollout(params, x):
            y, _, _ = rollout_adaptive_eval_tante(
                model, params, x, N_STEPS, max_frames_per_call=N_STEPS,
                out_dtype=jnp.bfloat16)
            return y

    elif has_state:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        params = variables

        @jax.jit
        def rollout(params, x):
            def apply_fn(win, st):
                y, updates = model.apply(
                    {"params": params["params"], "batch_stats": st},
                    win, mutable=["batch_stats"])
                return y, updates["batch_stats"]

            y, _ = rollout_fixed_stateful(apply_fn, x, N_STEPS, chunk, params["batch_stats"])
            return y

    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def rollout(params, x):
            return rollout_fixed(lambda w: model.apply(params, w), x, N_STEPS, chunk)

    @jax.jit
    def probe(y):
        return jnp.sum(y[..., 0, 0, 0].astype(jnp.float32))

    return rollout, params, x, chunk, probe


def bench_model(name: str, bf16: bool = True, overrides=None):
    rollout, params, x, chunk, probe = build_rollout(name, bf16, overrides)
    y = rollout(params, x)
    float(probe(y))  # compile + warm
    inputs = [x + 0.001 * i for i in range(REPS)]
    for xi in inputs:
        xi.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [rollout(params, xi) for xi in inputs]
        float(probe(ys[-1]))
        best = min(best, time.perf_counter() - t0)
    fps = REPS * BATCH * N_STEPS / best
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    row = {"model": name, "frames_per_sec_per_chip": round(fps, 1),
           "params": n_params, "chunk_frames_per_call": chunk}
    bound = _zoo_bounds().get(name, {}).get("fps_a100_bound")
    if bound:
        row["a100_bound_fps"] = bound
        row["vs_baseline"] = round(fps / bound, 3)
    return row


def _zoo_bounds() -> dict:
    """Per-family A100 eager upper bounds (scripts/measure_baseline_zoo.py
    -> BASELINE.json published.a100_zoo)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.json"
    )
    try:
        with open(path) as f:
            return json.load(f)["published"]["a100_zoo"]
    except (OSError, KeyError, ValueError):
        return {}


def main():
    args = sys.argv[1:]
    overrides = [a for a in args if "=" in a]
    names = [a for a in args if "=" not in a] or MODELS
    for name in names:
        try:
            print(json.dumps(bench_model(name, overrides=overrides)), flush=True)
        except Exception as e:
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
