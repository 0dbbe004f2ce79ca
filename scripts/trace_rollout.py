"""Capture a device trace of one bench rollout and print the op-level
device-time breakdown (tensorboard_plugin_profile offline conversion)."""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from tante_tpu.utils.profiling import trace


def main():
    rollout, params, x = bench.build()

    @jax.jit
    def probe(y):
        return jnp.sum(y[..., 0, 0, 0])

    y = rollout(params, x)
    float(probe(y))  # compile + warm

    logdir = "/tmp/rollout_trace"
    with trace(logdir):
        y = rollout(params, x)
        float(probe(y))

    xplanes = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplanes[-1]], tool, params={})
            out = f"/tmp/rollout_trace/{tool}.json"
            with open(out, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print("wrote", out, flush=True)
        except Exception as e:
            print(tool, "failed:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
