"""Accuracy at the adaptive operating point (VERDICT r4 item #1).

The reference's efficiency claim is FEWER MODEL CALLS AT EQUAL ACCURACY:
its adaptive evaluator reports mean r_t and call count next to the same
four accuracy metrics in one report (``/root/reference/trainer/
r_evaler.py:138-164``).  This script produces that comparison for the
flagship checkpoint at the bench geometry (128x384x4, 16-step rollout):

  (a) the ADAPTIVE rollout (out_T_max = 8; the trained head's realized
      call count), and
  (b) the FIXED-STEP 16-call rollout of the SAME trained body
      (max_frames_per_call = 1 forces floor(r_t) -> 1),

both on a held-out analytic-wave set (same construction as the training
distribution, fresh phases/speeds), reporting VRMSE + L2RE + calls for
each.  Additionally, with ``--per-trajectory`` it rolls out each
trajectory alone (batch 1) so the per-sample r_t is visible, and reports
r_t / call-count / VRMSE against the trajectory's wave speed (the
difficulty knob) — the content-adaptivity evidence the paper claims for
the confidence head (``/root/reference/models/tante.py:149-163``).

Usage:
  python scripts/eval_adaptive_accuracy.py [--asset PATH | --exp DIR]
      [--speeds lo,hi] [--n 8] [--per-trajectory] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

RESOLUTION = (128, 384)
IN_T = 4
N_STEPS = 16


def wave_trajectories(
    n: int, speeds: np.ndarray, n_frames: int, seed: int = 123, resolution=None
):
    """Analytic continuation of the synthetic-waves construction
    (tante_tpu/data/synthetic.py with_pressure=True channel schema) at the
    bench geometry: (n, n_frames, H, W, 4) with per-trajectory speed."""
    h, w = resolution or RESOLUTION
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(
        np.linspace(0, 2 * np.pi, h, endpoint=False),
        np.linspace(0, 2 * np.pi, w, endpoint=False),
        indexing="ij",
    )
    phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1, 1)).astype(np.float32)
    speed = speeds.reshape(n, 1, 1, 1).astype(np.float32)
    t = np.arange(n_frames, dtype=np.float32).reshape(1, n_frames, 1, 1)

    def wave(kx, ky, amp=1.0):
        return amp * np.sin(kx * gx + ky * gy + phase + speed * t).astype(np.float32)

    k1, k2 = (1, 2), (3, 1)
    fields = [
        wave(*k1) + 0.5 * wave(*k2),   # density
        wave(*k2) + 0.25 * wave(*k1),  # pressure
        wave(*k1),                     # velocity_x
        wave(k1[1], k1[0], amp=0.7),   # velocity_y
    ]
    return np.stack(fields, axis=-1)


def build_model(resolution=None, embed_dim=256, attn_axes="THWTHWTHW"):
    from tante_tpu.data.dataset import TanteMetadata
    from tante_tpu.models import TANTE

    md = TanteMetadata(
        dataset_name="eval_adaptive",
        n_spatial_dims=2,
        spatial_resolution=resolution or RESOLUTION,
        field_names={0: ["f"] * 4, 1: [], 2: []},
        boundary_condition_types=["PERIODIC"],
        n_files=1,
        n_trajectories_per_file=[1],
        n_steps_per_trajectory=[32],
        n_fields=4,
    )
    return TANTE(
        in_T=IN_T,
        dset_metadata=md,
        taylor_order=1,
        attn_axes=attn_axes,
        embed_dim=embed_dim,
        patch_scale=8,
        n_head=8,
        mlp_ratio=1.0,
        output_length=1,
        deg=False,
        dtype=jnp.bfloat16,
    )


def load_params(model, asset: str | None, exp: str | None, choose: str, resolution=None):
    x0 = jnp.zeros((1, IN_T, *(resolution or RESOLUTION), 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    if exp:
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(exp, choose)), None
        )
        src = raw["params"]["params"]

        def fill(dst, s):
            for kk, v in s.items():
                if isinstance(v, dict):
                    fill(dst[kk], v)
                else:
                    assert dst[kk].shape == v.shape, (kk, dst[kk].shape, v.shape)
                    dst[kk] = jnp.asarray(v, dtype=dst[kk].dtype)

        fill(params["params"], src)
        return params, f"exp:{exp}@{choose}"
    path = asset or os.path.join(REPO, "tante_tpu", "assets", "tante_flagship.npz")
    loaded = np.load(path)
    for key in loaded.files:
        node = params["params"]
        *parts, leaf = key.split("/")
        for part in parts:
            node = node[part]
        assert node[leaf].shape == loaded[key].shape, (key, node[leaf].shape)
        node[leaf] = jnp.asarray(loaded[key], dtype=node[leaf].dtype)
    return params, os.path.relpath(path, REPO)


def metric_report(y_pred, y):
    from tante_tpu.train.metrics import L2RE, VRMSE

    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)
    return {
        "VRMSE": float(jnp.mean(VRMSE.eval(y_pred, y))),
        "L2RE": float(jnp.mean(L2RE.eval(y_pred, y))),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--asset", default=None, help="npz param asset (default: flagship)")
    ap.add_argument("--exp", default=None, help="experiment dir (orbax checkpoint)")
    ap.add_argument("--choose", default="best")
    ap.add_argument("--speeds", default="0.1,0.3", help="held-out speed range lo,hi")
    ap.add_argument("--n", type=int, default=8, help="trajectories")
    ap.add_argument("--k", type=int, default=8, help="adaptive per-call frame budget")
    ap.add_argument("--per-trajectory", action="store_true")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--res", default=None, help="H,W (default 128,384)")
    ap.add_argument("--embed", type=int, default=256)
    ap.add_argument("--axes", default="THWTHWTHW")
    args = ap.parse_args(argv)

    from tante_tpu.train.rollout import rollout_adaptive_eval_tante

    res = tuple(int(s) for s in args.res.split(",")) if args.res else None
    lo, hi = (float(s) for s in args.speeds.split(","))
    speeds = np.linspace(lo, hi, args.n, dtype=np.float32)
    traj = wave_trajectories(args.n, speeds, IN_T + N_STEPS, resolution=res)
    x = jnp.asarray(traj[:, :IN_T])
    y = jnp.asarray(traj[:, IN_T:])

    model = build_model(resolution=res, embed_dim=args.embed, attn_axes=args.axes)
    params, weights_src = load_params(
        model, args.asset, args.exp, args.choose, resolution=res
    )

    @jax.jit
    def run_adaptive(params, x):
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=args.k
        )

    @jax.jit
    def run_fixed(params, x):
        # Same trained body, floor(r_t) clipped to 1 -> one frame per call,
        # i.e. the fixed-step 16-call rollout.
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=1
        )

    @jax.jit
    def run_taylor_k(params, x):
        # Deterministic k-frame Taylor-block schedule of the same body
        # (the reference's deg mode at output_length = k): ceil(16/k)
        # calls regardless of r_t.
        return rollout_adaptive_eval_tante(
            model, params, x, N_STEPS, max_frames_per_call=args.k,
            force_budget=True,
        )

    y_a, rt_a, calls_a = run_adaptive(params, x)
    y_f, _, calls_f = run_fixed(params, x)
    y_t, _, calls_t = run_taylor_k(params, x)
    rt_np = np.asarray(rt_a)

    report = {
        "weights": weights_src,
        "protocol": (
            f"16-step rollout, B={args.n}, "
            f"{'x'.join(str(s) for s in (res or RESOLUTION))}x4, "
            f"held-out waves speeds [{lo}, {hi}]"
        ),
        "adaptive": {
            **metric_report(y_a, y),
            "model_calls_per_rollout": int(calls_a),
            "rt_mean": float(np.nanmean(rt_np)),
            "frames_per_call_budget": args.k,
        },
        "fixed_16call_same_body": {
            **metric_report(y_f, y),
            "model_calls_per_rollout": int(calls_f),
        },
        f"taylor{args.k}_forced_same_body": {
            **metric_report(y_t, y),
            "model_calls_per_rollout": int(calls_t),
        },
    }

    if args.per_trajectory:
        rows = []
        for i in range(args.n):
            yi, rti, ci = run_adaptive(params, x[i : i + 1])
            m = metric_report(yi, y[i : i + 1])
            rti = np.asarray(rti)
            rows.append(
                {
                    "speed": float(speeds[i]),
                    "rt_mean": float(np.nanmean(rti)),
                    "calls": int(ci),
                    "VRMSE": m["VRMSE"],
                }
            )
        rts = np.array([r["rt_mean"] for r in rows])
        report["per_trajectory"] = rows
        report["rt_var_across_trajectories"] = float(np.var(rts))
        if np.var(rts) > 0 and np.var(speeds) > 0:
            report["rt_speed_correlation"] = float(
                np.corrcoef(speeds, rts)[0, 1]
            )
    print(json.dumps(report))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
