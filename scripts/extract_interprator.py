"""Extract trained weights from an R_Trainer checkpoint into a bench asset.

Default: the interprator (confidence head) only ->
``tante_tpu/assets/interprator_flagship.npz``.  With ``--full``: the whole
param tree -> ``tante_tpu/assets/tante_flagship.npz`` (~17 MB f32) — the
honest bench mode, where the adaptive lane runs a REAL trained model on
on-distribution input and the realized call count is the trained
operating point, not a head reacting to out-of-distribution activations
(the head-only asset measured 3 calls on random input vs 2 calls
on-distribution; docs/EVIDENCE.md round 4).

Usage:
  python scripts/extract_interprator.py <experiment_dir> [--choose recent] [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--choose", default="recent")
    ap.add_argument("--full", action="store_true",
                    help="extract the whole param tree, not just the head")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    assets = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tante_tpu",
        "assets",
    )
    out = args.out or os.path.join(
        assets, "tante_flagship.npz" if args.full else "interprator_flagship.npz"
    )
    args.out = out

    import jax

    try:
        # CPU-only when jax hasn't been initialized yet (standalone use);
        # harmless no-op guard when a caller already holds a TPU backend.
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import orbax.checkpoint as ocp

    # Raw (target-free) restore: no template pytree is required.
    raw = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(args.exp_dir, args.choose)), None
    )
    head = raw["params"]["params"]
    if not args.full:
        head = head["interprators_0"]

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
