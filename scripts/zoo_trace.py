"""Device-trace one zoo family's rollout and print the per-op device-time
table (the round-3/4 laggard-hunting tool: one XLA lowering pathology can
be >90% of a model — see docs/PERF.md partial-DFT and dense-de-patch
entries).

The tensorboard_plugin_profile converter is protobuf-broken in this image;
instead this parses the trace-viewer JSON (vm.trace.json.gz) that the axon
backend writes next to the xplane.pb, aggregating 'X' (complete) events by
op name per device process (the round-3 session parser, now checked in).

Usage:
  python scripts/zoo_trace.py unet_convnext [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import zoo_bench  # noqa: E402
from tante_tpu.utils.profiling import trace  # noqa: E402


def collect(logdir: str, top_n: int = 25) -> list:
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        return []
    with gzip.open(files[-1], "rt") as f:
        payload = json.load(f)
    events = payload.get("traceEvents", [])
    # pid -> process name (device rows are named like "/device:TPU:0 ...").
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pnames.items() if "TPU" in n or "device" in n.lower()}
    agg = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            agg[e["name"]] += float(e.get("dur", 0.0))
            counts[e["name"]] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]
    total = sum(agg.values())
    out = []
    for name, dur in rows:
        out.append(
            {
                "op": name[:120],
                "device_us": round(dur, 1),
                "count": counts[name],
                "pct": round(100.0 * dur / max(total, 1e-9), 1),
            }
        )
    out.append({"op": "TOTAL", "device_us": round(total, 1)})
    return out


def main():
    args = sys.argv[1:]
    overrides = [a for a in args if "=" in a]
    pos = [a for a in args if "=" not in a]
    name = pos[0]
    top_n = int(pos[1]) if len(pos) > 1 else 25
    rollout, params, x, _, probe = zoo_bench.build_rollout(name, overrides=overrides)
    y = rollout(params, x)
    float(probe(y))  # compile + warm
    logdir = f"/tmp/zoo_trace_{name}"
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        y = rollout(params, x)
        float(probe(y))
    for row in collect(logdir, top_n):
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
