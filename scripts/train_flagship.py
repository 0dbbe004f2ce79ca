"""Regenerate the flagship adaptive checkpoint + bench asset (provenance).

One command produces ``tante_tpu/assets/tante_flagship.npz`` from scratch,
so the committed asset can never drift from the code that made it
(VERDICT r4 items #2 and #7):

  1. generates the MIXED-DIFFICULTY synthetic-wave dataset at the bench
     geometry (128x384, 4 fields; per-trajectory wave speed ramped over
     ``--speeds`` — speed is the temporal-extrapolation difficulty knob);
  2. trains the variable-frame adaptive R_Trainer at flagship geometry
     (``configs/tante_adaptive.yaml``) with a REACHABLE r_t band
     [1+rt_eps, rt_band_hi] = [4, 8] and the per-sample error-growth r_t
     supervision (``R_Trainer(rt_supervision=...)``) so the confidence
     head learns to be CONTENT-adaptive, not a constant-step scheduler
     (the round-4 asset was trained with a pinned [8,8] band);
  3. evaluates: adaptive-vs-fixed accuracy at 16 steps + per-trajectory
     r_t vs wave speed (scripts/eval_adaptive_accuracy.py);
  4. extracts the full param tree into the bench asset.

Usage:
  python scripts/train_flagship.py [--small] [--epochs 34] [--batch 4]
      [--speeds 0.05,0.9] [--sup 0.05] [--base-path datasets]
      [--skip-asset] [override ...]

``--small`` switches to a 32x64 / embed-64 validation geometry (minutes,
for mechanism checks); the asset is only written at full geometry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--epochs", type=int, default=34)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--speeds", default="0.05,0.9")
    ap.add_argument("--sup", type=float, default=0.05, help="rt_supervision weight")
    ap.add_argument("--out-t", type=int, default=8,
                    help="per-call Taylor budget k = train_out_T = rt_band_hi")
    ap.add_argument("--growth", type=float, default=4.0,
                    help="rt_sup_growth: per-block error-growth tolerance "
                         "defining the supervision target (frames whose "
                         "error stays <= growth x first-frame error)")
    ap.add_argument("--sup-mode", default="growth", choices=["growth", "abs"],
                    help="supervision target: 'growth' (relative; content-"
                         "insensitive — Taylor error ~C t^2 cancels C in the"
                         " ratio) or 'abs' (frames with per-frame MSE <= tau;"
                         " content-sensitive)")
    ap.add_argument("--tau", type=float, default=0.5,
                    help="rt_sup_tau for --sup-mode abs (z-scored units)")
    ap.add_argument("--base-path", default="datasets")
    ap.add_argument("--n-trajectories", type=int, default=8)
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-asset", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    lo, hi = (float(s) for s in args.speeds.split(","))
    resolution = (32, 64) if args.small else (128, 384)
    dataset = "flagship_waves_small" if args.small else "flagship_waves"
    experiment = args.experiment or (
        "TANTE_R_FLAG5_SMALL" if args.small else "TANTE_R_FLAG5"
    )

    from tante_tpu.data.synthetic import make_well_dataset

    make_well_dataset(
        args.base_path,
        dataset_name=dataset,
        n_trajectories=args.n_trajectories,
        n_steps=24,
        resolution=resolution,
        with_pressure=True,
        difficulty_ramp=True,
        speed_range=(lo, hi),
        seed=5,
    )

    overrides = [
        f"data.base_path={args.base_path}",
        f"data.dataset_name={dataset}",
        f"data.batch_size={args.batch}",
        "data.n_steps_output=16",
        "data.eval_steps_output=16",
        f"experiment={experiment}",
        f"trainer.max_epoch={args.epochs}",
        "trainer.n_steps_output=16",
        "trainer.n_steps_rollout=16",
        f"trainer.train_out_T={args.out_t}",
        f"trainer.rt_band_hi={args.out_t}",
        "trainer.rt_eps=3",
        f"trainer.rt_supervision={args.sup}",
        f"trainer.rt_sup_growth={args.growth}",
        f"trainer.rt_sup_mode={args.sup_mode}",
        f"trainer.rt_sup_tau={args.tau}",
    ]
    if args.small:
        overrides += [
            "model.embed_dim=64",
            "model.attn_axes=THWTHW",
            "model.patch_scale=8",
        ]
    overrides += list(args.overrides)

    if not args.skip_train:
        from tante_tpu.cli.train import main as train_main

        train_main(["--config-name=tante_adaptive"] + overrides)

    exp_dir = os.path.join(".", "experiments", experiment)

    report = None
    if not args.small:
        from eval_adaptive_accuracy import main as eval_main

        report = eval_main(
            [
                "--exp", exp_dir,
                "--choose", "best",
                "--per-trajectory",
                "--k", str(args.out_t),
                "--speeds", args.speeds,
                "--json-out", os.path.join(exp_dir, "adaptive_accuracy.json"),
            ]
        )

        if not args.skip_asset:
            from extract_interprator import main as extract_main

            extract_main([exp_dir, "--choose", "best", "--full"])

    print(json.dumps({
        "experiment": experiment,
        "dataset": dataset,
        "resolution": list(resolution),
        "train_overrides": overrides,
        "eval_report": "adaptive_accuracy.json" if report else None,
    }))


if __name__ == "__main__":
    main()
