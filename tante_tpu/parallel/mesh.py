"""Device mesh construction and axis conventions.

The framework's parallelism (replacing the reference's vestigial
DistributedSampler plumbing, SURVEY.md section 2.6):

  dp  -- data parallelism: the batch axis of every array is sharded over
         'dp'; parameters are replicated; gradient psums are inserted by
         XLA automatically under jit.
  tp  -- tensor parallelism: channel/head dimensions of the large Dense
         kernels (attention qkv/out, MLPs) sharded over 'tp'; activations
         keep a matching channel sharding so collectives ride ICI.
  sp  -- spatial sharding of the (H, W) grid for very large fields (halo
         exchange for convs via shard_map + ppermute, see halo.py).

PP and EP are not applicable to this model family (no MoE, shallow
models) — documented capability decision, mirroring SURVEY.md 2.6.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    If ``shape`` is omitted, all devices go to the first axis ('dp') and
    trailing axes get size 1 — the safe default for pure data parallelism.
    """
    if devices is None:
        devices = list(jax.devices())
        if n_devices is not None and len(devices) < n_devices:
            # Fall back to the host backend: the driver validates multi-chip
            # sharding with --xla_force_host_platform_device_count virtual
            # CPU devices while the default backend may be a single real TPU.
            try:
                cpu = list(jax.devices("cpu"))
                if len(cpu) >= n_devices:
                    devices = cpu
            except RuntimeError:
                pass
    devices = list(devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            kinds = sorted({d.platform for d in devices})
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available (platform(s): {kinds}); for CPU "
                f"virtual devices set XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} before importing jax"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (
        f"mesh shape {shape} (= {int(np.prod(shape))} devices) != {n} "
        f"devices on platform(s) {sorted({d.platform for d in devices})}"
    )
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def dp_tp_mesh(n_devices: int, tp: Optional[int] = None) -> Mesh:
    """A (dp, tp) mesh; tp defaults to 2 when divisible, else 1."""
    if tp is None:
        tp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    dp = n_devices // tp
    return make_mesh(n_devices, ("dp", "tp"), (dp, tp))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'dp'; replicate everything else."""
    return NamedSharding(mesh, P("dp"))


def input_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, T, H, ...) model inputs: batch over 'dp', and —
    when ``spatial`` and the mesh has an 'sp' axis — H (axis 2) over 'sp'.
    Used by the Trainer for sp-capable models (train/trainer.py)."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = "dp" if "dp" in axes else None
    if spatial and axes.get("sp", 1) > 1:
        return NamedSharding(mesh, P(dp, None, "sp"))
    return NamedSharding(mesh, P(dp))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
