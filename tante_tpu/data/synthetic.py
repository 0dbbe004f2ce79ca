"""Synthetic Well-format HDF5 fixture generator.

The reference repo ships only placeholder dataset stubs
(``datasets/*/stats.yaml``: "update to the latest version of The Well
dataset"), so tests and benchmarks need a generator that writes files with
the exact Well layout the dataset reader expects (see
``tante_tpu/data/dataset.py`` docstring and reference
``data/dataset.py:126-158,190-211``).

Fields are smooth traveling waves (so operator-learning models can actually
fit them in a few steps), with a scalar t0 field, a d-vector t1 field and an
optional t2 tensor field.
"""

from __future__ import annotations

import os
from typing import Sequence

import h5py as h5
import numpy as np
import yaml


def make_well_dataset(
    base_path: str,
    dataset_name: str = "synthetic_waves",
    splits: Sequence[str] = ("train", "valid", "test"),
    n_files_per_split: int = 1,
    n_trajectories: int = 3,
    n_steps: int = 24,
    resolution: tuple = (32, 64),
    with_t2: bool = False,
    seed: int = 0,
) -> str:
    """Write a synthetic Well dataset; returns its root directory."""
    rng = np.random.default_rng(seed)
    H, W = resolution
    root = os.path.join(base_path, dataset_name)
    os.makedirs(root, exist_ok=True)

    d = 2  # spatial dims
    field_specs = {"t0": ["density"], "t1": ["velocity"], "t2": ["stress"] if with_t2 else []}

    # stats.yaml: per-field mean/std; vector/tensor fields get per-component
    # stats arrays (the reference broadcasts them over trailing dims).
    stats = {"mean": {}, "std": {}}
    stats["mean"]["density"] = 0.0
    stats["std"]["density"] = 1.0
    stats["mean"]["velocity"] = [0.0] * d
    stats["std"]["velocity"] = [1.0] * d
    if with_t2:
        stats["mean"]["stress"] = [[0.0] * d] * d
        stats["std"]["stress"] = [[1.0] * d] * d
    with open(os.path.join(root, "stats.yaml"), "w") as f:
        yaml.safe_dump(stats, f)

    yy, xx = np.meshgrid(
        np.linspace(0, 2 * np.pi, H, endpoint=False),
        np.linspace(0, 2 * np.pi, W, endpoint=False),
        indexing="ij",
    )

    for split in splits:
        split_dir = os.path.join(root, "data", split)
        os.makedirs(split_dir, exist_ok=True)
        for fi in range(n_files_per_split):
            path = os.path.join(split_dir, f"{dataset_name}_{split}_{fi}.hdf5")
            with h5.File(path, "w") as f:
                f.attrs["n_trajectories"] = n_trajectories
                f.attrs["n_spatial_dims"] = d
                f.attrs["dataset_name"] = dataset_name

                dims = f.create_group("dimensions")
                dims.attrs["spatial_dims"] = ["x", "y"]
                dims.create_dataset("time", data=np.arange(n_steps, dtype=np.float32))
                dims.create_dataset("x", data=np.linspace(0, 1, H, dtype=np.float32))
                dims.create_dataset("y", data=np.linspace(0, 1, W, dtype=np.float32))

                bcs = f.create_group("boundary_conditions")
                for name in ("x", "y"):
                    g = bcs.create_group(name)
                    g.attrs["bc_type"] = "PERIODIC"

                t = np.arange(n_steps, dtype=np.float32)[None, :, None, None]
                phase = rng.uniform(0, 2 * np.pi, size=(n_trajectories, 1, 1, 1)).astype(
                    np.float32
                )
                speed = rng.uniform(0.1, 0.3, size=(n_trajectories, 1, 1, 1)).astype(
                    np.float32
                )

                def wave(kx, ky, amp=1.0):
                    return amp * np.sin(
                        kx * xx[None, None] + ky * yy[None, None] + phase + speed * t
                    ).astype(np.float32)

                t0 = f.create_group("t0_fields")
                t0.attrs["field_names"] = field_specs["t0"]
                ds = t0.create_dataset("density", data=wave(1, 2) + 0.5 * wave(3, 1))
                ds.attrs["sample_varying"] = True
                ds.attrs["time_varying"] = True

                t1 = f.create_group("t1_fields")
                t1.attrs["field_names"] = field_specs["t1"]
                vel = np.stack([wave(2, 1), wave(1, 3, 0.7)], axis=-1)
                ds = t1.create_dataset("velocity", data=vel)
                ds.attrs["sample_varying"] = True
                ds.attrs["time_varying"] = True

                t2 = f.create_group("t2_fields")
                t2.attrs["field_names"] = field_specs["t2"]
                if with_t2:
                    comps = [wave(1, 1), wave(2, 2, 0.5), wave(2, 2, 0.5), wave(3, 3, 0.3)]
                    stress = np.stack(comps, axis=-1).reshape(
                        n_trajectories, n_steps, H, W, d, d
                    )
                    ds = t2.create_dataset("stress", data=stress)
                    ds.attrs["sample_varying"] = True
                    ds.attrs["time_varying"] = True

    return root
