"""Benchmark: TANTE autoregressive rollout throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (matches the reference's headline efficiency signal, SURVEY.md
section 6): the flagship TANTE model (embed_dim 256, patch_scale 8, axial
axes THWTHWTHW — the shipped ``configs/tante.yaml`` geometry) rolls out 16
frames autoregressively on the Turbulent-Radiative-Layer-sized field
(128 x 384, 4 channels), batch 8, bf16 compute.  Throughput is reported as
emitted frames per second per chip (batch x frames / wall-clock / chips).

``vs_baseline``: the reference repo states no hardware or timing numbers
(BASELINE.md: "Hardware: not stated").  The denominator is the derived
A100 eager-PyTorch UPPER BOUND recorded in
``BASELINE.json.published.a100_tante_rollout`` by
``scripts/measure_baseline.py``: exact per-call FLOPs and op counts are
measured by running the reference model, then the bound grants it 25% MFU
of A100 bf16 peak and a 4 us/kernel launch floor with free memory
bandwidth — every assumption favoring the baseline, all re-derivable (see
BASELINE.md "A100 denominator derivation").
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compiled-executable cache: the rollout jit is a multi-minute
# cold compile on the tunneled remote compiler; with the cache warm (any
# prior run at this geometry on this host) it loads in seconds.
try:
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def _baseline_fps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["published"]["a100_tante_rollout"]["value"])
    except (OSError, KeyError, ValueError) as e:
        import sys

        # Loud fallback: a silently stale constant would defeat the point of
        # the derived denominator (BASELINE.md).
        print(
            f"WARNING: could not read a100_tante_rollout from {path} ({e}); "
            "falling back to the last derived value 2493.8 — re-derive with "
            "scripts/measure_baseline.py",
            file=sys.stderr,
        )
        return 2493.8


A100_EST_FRAMES_PER_SEC = _baseline_fps()

BATCH = 8
RESOLUTION = (128, 384)
N_FIELDS = 4
IN_T = 4
N_STEPS = 16
WARMUP_ITERS = 2
# 32 pipelined rollouts per timed pass: at 8, the shorter adaptive-lane
# programs were ~14% dispatch-amortization-limited (measured depth sweep
# 4/8/16/32 -> 6148/7214/7944/8347 f/s; 32 is ~98.5% of the device-time
# ceiling).  Throughput is a steady-state metric and the ~0.5-1 ms
# per-program host dispatch is a tunnel artifact, not device time.
MEASURE_ITERS = 32


def build(latent_cache: bool = True):
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_fixed, rollout_tante_latent

    md = TanteMetadata(
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
    model = TANTE(
        in_T=IN_T,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THWTHWTHW",
        embed_dim=256,
        patch_scale=8,
        n_head=8,
        mlp_ratio=1.0,
        output_length=1,
        deg=True,
        dtype=jnp.bfloat16,
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, IN_T, *RESOLUTION, N_FIELDS)).astype(
            np.float32
        )
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    if latent_cache:
        # Latent-caching rollout: each frame encoded exactly once
        # (equivalence-tested in tests/test_rollout.py).
        # bf16 emitted frames: the rollout trajectory itself is exact (the
        # Taylor expansion point rides the carry in f32; the encoder
        # quantizes its input to bf16 regardless) — only the RETURNED frame
        # copies are rounded to the compute dtype, matching what the
        # reference returns under bf16 autocast (trainer/trainer.py:181).
        @jax.jit
        def rollout(params, x):
            return rollout_tante_latent(
                model, params, x, N_STEPS, out_dtype=jnp.bfloat16
            )

    else:

        @jax.jit
        def rollout(params, x):
            return rollout_fixed(lambda w: model.apply(params, w), x, N_STEPS, 1)

    return rollout, params, x


def _wave_input(batch=None, t0: int = 0, n_frames: int = IN_T, seed: int = 7) -> np.ndarray:
    """On-distribution input for the adaptive lane: the synthetic-waves
    field construction of ``tante_tpu/data/synthetic.py`` (4-field
    turbulent-radiative-layer channel schema: density, pressure,
    velocity_x, velocity_y) at the bench geometry, with per-batch-element
    trajectory parameters.  The stats of that dataset are identity
    (mean 0 / std 1), so raw waves ARE the normalized training
    distribution — the trained confidence head's realized call count on
    this input is its trained operating point, not an OOD reaction
    (random-normal input measured one extra call per rollout;
    docs/EVIDENCE.md round 4)."""
    b = batch or BATCH
    h, w = RESOLUTION
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(
        np.linspace(0, 2 * np.pi, h, endpoint=False),
        np.linspace(0, 2 * np.pi, w, endpoint=False),
        indexing="ij",
    )
    phase = rng.uniform(0, 2 * np.pi, size=(b, 1, 1, 1)).astype(np.float32)
    speed = rng.uniform(0.1, 0.3, size=(b, 1, 1, 1)).astype(np.float32)
    t = (t0 + np.arange(n_frames, dtype=np.float32)).reshape(1, n_frames, 1, 1)

    def wave(kx, ky, amp=1.0):
        return amp * np.sin(kx * gx + ky * gy + phase + speed * t).astype(np.float32)

    k1, k2 = (1, 2), (3, 1)
    fields = [
        wave(*k1) + 0.5 * wave(*k2),        # density
        wave(*k2) + 0.25 * wave(*k1),       # pressure
        wave(*k1),                           # velocity_x  (roll(k1, 0))
        wave(k1[1], k1[0], amp=0.7),         # velocity_y  (roll(k1, 1))
    ]
    return np.stack(fields, axis=-1)


OUT_T_CAP = 8  # adaptive lane: per-call Taylor-frame budget (= R_Evaler out_T_max)


def build_adaptive():
    """Adaptive (deg=False) TANTE + R_Evaler-style while-loop rollout.

    The reference's headline efficiency claim is FEWER MODEL CALLS per
    rollout (``trainer/r_evaler.py:160-164``): a trained interprator emits
    r_t >> 1, so a 16-step rollout takes a handful of calls instead of 16.
    Fresh ``init`` params have r_t ~ 1.001 (degenerate 1-frame-per-call),
    so the lane loads TRAINED weights — the full flagship variable-frame
    R_Trainer checkpoint when the asset is present (see the loading chain
    below) — and runs it on on-distribution wave input (``_wave_input``),
    so the reported call count is a trained model's realized operating
    point (provenance: docs/EVIDENCE.md round 4).

    Operating point: OUT_T_CAP = 8 frames/call => 2 calls per 16-step
    rollout.  This is the r_t the reference's own band penalty targets
    when configured with ``rt_eps = 7`` (band [min(1+eps,4), max(1+eps,4)]
    = [4, 8], ``trainer/metrics.py:62-80``) and is the reference's eval
    semantics exactly: ``R_Evaler`` calls the model with out_T =
    n_steps_rollout = 16, so floor(r_t) = 8 consumes 8 frames per call
    (``trainer/r_evaler.py:95``, ``models/tante.py:163``).  The K = 4
    (4-call) point from round 3 and the K = 16 single-call ceiling are
    recorded in docs/PERF.md (8204 / 12876 / 17417 f/s measured the same
    session, scripts/adaptive_k_sweep.py); K = 8 is the headline because
    a 2-call rollout is still genuinely autoregressive while a 1-call
    rollout is a pure 16-frame Taylor unroll.

    The per-call frame budget is capped at ``OUT_T_CAP`` (the repo's own
    ``R_Evaler.out_T_max`` optimization): the model computes OUT_T_CAP
    Taylor frames per call, not n_steps=16 — exact whenever realized
    floor(r_t) <= OUT_T_CAP, which the clip in the Interprator guarantees
    here (out_T=OUT_T_CAP => r_t <= OUT_T_CAP + 0.001).
    """
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE
    from tante_tpu.train.rollout import rollout_adaptive_eval_tante

    md = TanteMetadata(
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
    model = TANTE(
        in_T=IN_T,
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
    # On-distribution input (see _wave_input): the adaptive lane's call
    # count comes from a trained confidence head reading REAL activations.
    x = jnp.asarray(_wave_input())
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    # TRAINED weights (VERDICT r3 item #4), best asset available:
    #   1. tante_tpu/assets/tante_flagship.npz — the FULL param tree from a
    #      converged flagship-geometry variable-frame R_Trainer run
    #      (train_out_T=8, band [8,8]; docs/EVIDENCE.md round 4): the bench
    #      measures a real trained model at its trained operating point.
    #   2. interprator_flagship.npz — confidence head only, body at init
    #      (the interim round-4 asset; the head reads init-body activations,
    #      which measured one extra call/rollout vs on-distribution).
    #   3. no asset: r_t = OUT_T_CAP bias surgery (rounds 2-3 protocol,
    #      documented CAPABILITY point, not a trained one).
    # Weights don't change per-call throughput — they change the CALL
    # COUNT, which the JSON line reports from the measured rollouts.
    def _load_npz(tree, path):
        loaded = np.load(path)
        for key in loaded.files:
            node = tree
            *parts, leaf = key.split("/")
            for part in parts:
                node = node[part]
            assert node[leaf].shape == loaded[key].shape, (key, node[leaf].shape)
            node[leaf] = jnp.asarray(loaded[key], dtype=node[leaf].dtype)

    assets = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tante_tpu", "assets"
    )
    full_asset = os.path.join(assets, "tante_flagship.npz")
    head_asset = os.path.join(assets, "interprator_flagship.npz")
    if os.path.exists(full_asset):
        weights_mode = "trained_full"
        _load_npz(params["params"], full_asset)
    elif os.path.exists(head_asset):  # pragma: no cover - superseded asset
        weights_mode = "trained_head"
        _load_npz(params["params"]["interprators_0"], head_asset)
    else:  # pragma: no cover - assets are committed
        weights_mode = "surgery"
        head = params["params"]["interprators_0"]["TorchDense_2"]["Dense_0"]
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.full_like(head["bias"], OUT_T_CAP - 1.001)

    @jax.jit
    def rollout(params, x):
        # Morton-packed adaptive engine (R_Evaler's production path): the
        # while-loop runs on packed frames; bf16 output buffer (same
        # rationale as the fixed lane).
        y, rt_log, n_calls = rollout_adaptive_eval_tante(
            model,
            params,
            x,
            N_STEPS,
            max_frames_per_call=OUT_T_CAP,
            out_dtype=jnp.bfloat16,
        )
        return y, n_calls

    @jax.jit
    def rollout_forced(params, x):
        # Deterministic Taylor-block schedule: the SAME trained body
        # emitting the full OUT_T_CAP-frame block every call
        # (ceil(16/8) = 2 calls) — the reference's deg mode at
        # output_length = 8 (``models/tante.py:165-169`` runs the Taylor
        # sum to any configured output_length).  Accuracy of this
        # schedule is measured in _adaptive_accuracy (eval_vrmse_taylor8).
        y, rt_log, n_calls = rollout_adaptive_eval_tante(
            model,
            params,
            x,
            N_STEPS,
            max_frames_per_call=OUT_T_CAP,
            out_dtype=jnp.bfloat16,
            force_budget=True,
        )
        return y, n_calls

    return model, rollout, rollout_forced, params, x, weights_mode


def measure_out_of_loop(model, probe) -> float:
    """Isolated per-rollout out-of-loop cost: morton pack of the input
    window + a morton pack of u(0) + unpack of the n_steps bf16 output
    buffer, no while-loop.  Reported next to the lane numbers so the
    fixed/adaptive comparison stays honest about what amortizes over
    calls and what does not (VERDICT r3 item #8)."""
    from tante_tpu.models.enc_dec_cnn import PATCH_MAP
    from tante_tpu.ops.convs import morton_pack_grouped, morton_unpack_grouped

    ps = PATCH_MAP[model.patch_scale]

    @jax.jit
    def oob(x):
        res = tuple(x.shape[2:4])
        win = morton_pack_grouped(x.astype(model.dtype), ps)
        u0 = morton_pack_grouped(x[:, -1:], ps)
        buf = jnp.zeros(
            (x.shape[0], N_STEPS) + u0.shape[2:], dtype=jnp.bfloat16
        ) + win.mean()
        return morton_unpack_grouped(buf, ps, res), u0.sum()

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, IN_T, *RESOLUTION, N_FIELDS)).astype(
            np.float32
        )
    )
    for _ in range(WARMUP_ITERS):
        y, _ = oob(x)
        float(probe(y))
    inputs = [x + 0.001 * i for i in range(MEASURE_ITERS)]
    for xi in inputs:
        xi.block_until_ready()
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [oob(xi) for xi in inputs]
        float(probe(ys[-1][0]))
        dt = min(dt, time.perf_counter() - t0)
    return 1000.0 * dt / MEASURE_ITERS


def _adaptive_accuracy(model, params):
    """VRMSE/L2RE of the adaptive (K=8) vs fixed-step (16-call) rollout of
    the SAME trained body on one held-out wave batch — the accuracy half
    of the "fewer calls at equal accuracy" claim, reported next to the
    speed ratio (the reference reports both in one eval,
    ``trainer/r_evaler.py:138-164``).  Full study incl. per-trajectory
    r_t-vs-difficulty: scripts/eval_adaptive_accuracy.py."""
    from tante_tpu.train.metrics import L2RE, VRMSE
    from tante_tpu.train.rollout import rollout_adaptive_eval_tante

    traj = _wave_input(n_frames=IN_T + N_STEPS, seed=123)  # held-out phases
    x = jnp.asarray(traj[:, :IN_T])
    y = jnp.asarray(traj[:, IN_T:], dtype=jnp.float32)

    def metrics(y_pred):
        y32 = y_pred.astype(jnp.float32)
        return (
            float(jnp.mean(VRMSE.eval(y32, y))),
            float(jnp.mean(L2RE.eval(y32, y))),
        )

    @jax.jit
    def run_adaptive(params, x):
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=OUT_T_CAP
        )

    @jax.jit
    def run_fixed(params, x):
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=1
        )

    @jax.jit
    def run_taylor8(params, x):
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=OUT_T_CAP,
            force_budget=True,
        )

    y_a, _, calls_a = run_adaptive(params, x)
    y_f, _, calls_f = run_fixed(params, x)
    y_t, _, calls_t = run_taylor8(params, x)
    va, la = metrics(y_a)
    vf_, lf = metrics(y_f)
    vt, lt = metrics(y_t)
    return {
        "eval_vrmse_adaptive": round(va, 4),
        "eval_vrmse_fixed16": round(vf_, 4),
        "eval_vrmse_taylor8": round(vt, 4),
        "eval_l2re_adaptive": round(la, 4),
        "eval_l2re_fixed16": round(lf, 4),
        "eval_l2re_taylor8": round(lt, 4),
        "eval_calls_adaptive": int(calls_a),
        "eval_calls_fixed": int(calls_f),
        "eval_calls_taylor8": int(calls_t),
    }


def _time_lane(rollout, params, x, probe):
    """(best-of-3 fps, measured calls/rollout) for one rollout lane."""
    for _ in range(WARMUP_ITERS):
        y, _ = rollout(params, x)
        float(probe(y))
    inputs = [x + 0.001 * i for i in range(MEASURE_ITERS)]
    for xi in inputs:
        xi.block_until_ready()
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [rollout(params, xi) for xi in inputs]
        float(probe(ys[-1][0]))
        dt = min(dt, time.perf_counter() - t0)
    # Call count from the MEASURED passes (not warmup): max over the timed
    # inputs, so the reported efficiency is what was actually benchmarked.
    calls = max(int(y[1]) for y in ys)
    return MEASURE_ITERS * BATCH * N_STEPS / dt, calls


def bench_adaptive(probe):
    """Adaptive lanes: the trained confidence head's operating point, and
    the deterministic 8-frame Taylor-block schedule of the same body
    (both with accuracy attached by _adaptive_accuracy)."""
    model, rollout, rollout_forced, params, x, weights_mode = build_adaptive()

    fps, calls = _time_lane(rollout, params, x, probe)
    fps_t, calls_t = _time_lane(rollout_forced, params, x, probe)
    try:
        oob_ms = round(measure_out_of_loop(model, probe), 3)
    except Exception:
        oob_ms = None
    try:
        acc = _adaptive_accuracy(model, params)
    except Exception as e:  # accuracy lane must never kill the speed line
        acc = {"eval_accuracy_error": str(e)[:120]}
    print(
        json.dumps(
            {
                "metric": "tante_adaptive_rollout_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s/chip (adaptive eval, B8 x 16-step, 128x384x4, bf16)",
                "model_calls_per_rollout": calls,
                "frames_per_call_budget": OUT_T_CAP,
                "weights": weights_mode,
                "out_of_loop_ms_per_rollout": oob_ms,
                **acc,
                "vs_baseline": round(fps / A100_EST_FRAMES_PER_SEC, 3),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "tante_taylor8_rollout_frames_per_sec_per_chip",
                "value": round(fps_t, 2),
                "unit": "frames/s/chip (deterministic 8-frame Taylor blocks,"
                        " B8 x 16-step, 128x384x4, bf16)",
                "model_calls_per_rollout": calls_t,
                "weights": weights_mode,
                "eval_vrmse_taylor8": acc.get("eval_vrmse_taylor8"),
                "eval_vrmse_fixed16": acc.get("eval_vrmse_fixed16"),
                "eval_l2re_taylor8": acc.get("eval_l2re_taylor8"),
                "eval_l2re_fixed16": acc.get("eval_l2re_fixed16"),
                "vs_baseline": round(fps_t / A100_EST_FRAMES_PER_SEC, 3),
            }
        )
    )


def main():
    rollout, params, x = build()

    # NOTE: on the tunneled axon backend ``block_until_ready`` does not
    # actually wait for device completion; a host-side materialization of a
    # jitted scalar reduction is the only reliable sync.  (Verified: 8
    # "blocked" rollouts returned in 0.4s while their compute took ~200ms
    # each to materialize.)
    @jax.jit
    def _probe(y):
        return jnp.sum(y[..., 0, 0, 0])

    def run_synced(xi):
        y = rollout(params, xi)
        float(_probe(y))  # host pull forces completion
        return y

    # Warmup / compile
    for _ in range(WARMUP_ITERS):
        run_synced(x)
    inputs = [x + 0.001 * i for i in range(MEASURE_ITERS)]
    for xi in inputs:
        xi.block_until_ready()
    # Pipelined dispatch, ONE sync at the end: the TPU executes enqueued
    # programs in order, so materializing the last rollout's probe implies
    # all prior rollouts completed.  Syncing per rollout would add one
    # ~25 ms tunnel round-trip each — a dev-harness artifact, not device
    # time (it inflated round-1 numbers ~19% low).
    # Best of 3 passes: the shared tunnel adds ~5% run-to-run noise.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [rollout(params, xi) for xi in inputs]
        float(_probe(ys[-1]))
        dt = min(dt, time.perf_counter() - t0)
    frames = MEASURE_ITERS * BATCH * N_STEPS
    n_chips = 1
    fps = frames / dt / n_chips

    # Secondary lane first (time-adaptive eval); the headline fixed-step
    # line stays LAST so drivers that parse the final line keep working.
    try:
        bench_adaptive(_probe)
    except Exception as e:  # never let the secondary lane kill the headline
        print(json.dumps({"metric": "tante_adaptive_rollout", "error": str(e)[:200]}))

    print(
        json.dumps(
            {
                "metric": "tante_rollout_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s/chip (B8 x 16-step rollout, 128x384x4, bf16)",
                "vs_baseline": round(fps / A100_EST_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
