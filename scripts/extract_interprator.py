"""Extract the trained interprator (confidence head) from an R_Trainer
checkpoint into ``tante_tpu/assets/interprator_flagship.npz``.

The asset feeds ``bench.py``'s adaptive lane: the interprator is the only
weight group whose VALUES change the benchmark (they set the realized call
count); everything else stays at init because weights don't change
throughput.  Provenance of the shipped asset: a flagship-geometry
(128x384x4, turbulent-radiative-layer channel schema) R_Trainer run,
rt_eps=7 band -> realized r_t = 8.0 (2 calls / 16-step rollout); see
docs/EVIDENCE.md round-4 rows.

Usage:
  python scripts/extract_interprator.py <experiment_dir> [--choose recent]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--choose", default="recent")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tante_tpu",
            "assets",
            "interprator_flagship.npz",
        ),
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    # Raw (target-free) restore: only the interprator subtree is needed, so
    # no template pytree is required.
    raw = ocp.StandardCheckpointer().restore(
        os.path.join(args.exp_dir, args.choose), None
    )
    head = raw["params"]["params"]["interprators_0"]

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v, np.float32)

    walk(head, "")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **flat)
    print(f"wrote {args.out}: " + ", ".join(f"{k}{flat[k].shape}" for k in sorted(flat)))


if __name__ == "__main__":
    main()
