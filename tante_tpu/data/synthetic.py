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
    with_pressure: bool = False,
    seed: int = 0,
    speed_range: tuple = (0.1, 0.3),
    difficulty_ramp: bool = False,
) -> str:
    """Write a synthetic Well dataset; returns its root directory.

    ``resolution`` may be 2-D ``(H, W)`` or 3-D ``(D, H, W)`` — the Well
    format (and the dataset reader) is generic over ``n_spatial_dims``.
    ``with_pressure`` adds a second t0 scalar so a 2-D dataset has the
    turbulent_radiative_layer channel schema exactly (density, pressure,
    velocity_x, velocity_y = 4 fields — the bench geometry).

    ``difficulty_ramp``: give trajectory i the DETERMINISTIC wave speed
    ``lo + (hi - lo) * i / (n - 1)`` over ``speed_range`` instead of a
    random draw — a mixed-difficulty set where per-trajectory difficulty
    is known by construction (wave speed is the temporal-extrapolation
    difficulty knob: a Taylor expansion of sin(kx + wt) degrades over
    ~1/w frames).  Used to train/evaluate a content-adaptive confidence
    head (r_t should fall with speed).  The realized speeds are written
    to the file attr ``wave_speeds``.
    """
    rng = np.random.default_rng(seed)
    d = len(resolution)
    assert d in (2, 3), resolution
    root = os.path.join(base_path, dataset_name)
    os.makedirs(root, exist_ok=True)

    t0_names = ["density", "pressure"] if with_pressure else ["density"]
    field_specs = {"t0": t0_names, "t1": ["velocity"], "t2": ["stress"] if with_t2 else []}

    # stats.yaml: per-field mean/std; vector/tensor fields get per-component
    # stats arrays (the reference broadcasts them over trailing dims).
    stats = {"mean": {}, "std": {}}
    for nm in t0_names:
        stats["mean"][nm] = 0.0
        stats["std"][nm] = 1.0
    stats["mean"]["velocity"] = [0.0] * d
    stats["std"]["velocity"] = [1.0] * d
    if with_t2:
        stats["mean"]["stress"] = [[0.0] * d] * d
        stats["std"]["stress"] = [[1.0] * d] * d
    with open(os.path.join(root, "stats.yaml"), "w") as f:
        yaml.safe_dump(stats, f)

    dim_names = ("x", "y", "z")[:d]
    grids = np.meshgrid(
        *[np.linspace(0, 2 * np.pi, s, endpoint=False) for s in resolution],
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
                dims.attrs["spatial_dims"] = list(dim_names)
                dims.create_dataset("time", data=np.arange(n_steps, dtype=np.float32))
                for name, size in zip(dim_names, resolution):
                    dims.create_dataset(
                        name, data=np.linspace(0, 1, size, dtype=np.float32)
                    )

                bcs = f.create_group("boundary_conditions")
                for name in dim_names:
                    g = bcs.create_group(name)
                    g.attrs["bc_type"] = "PERIODIC"

                bshape = (1, 1) + (1,) * d
                t = np.arange(n_steps, dtype=np.float32).reshape(1, n_steps, *([1] * d))
                phase = rng.uniform(0, 2 * np.pi, size=(n_trajectories,)).reshape(
                    (n_trajectories,) + bshape[1:]
                ).astype(np.float32)
                lo, hi = speed_range
                if difficulty_ramp:
                    speeds = np.linspace(lo, hi, n_trajectories, dtype=np.float32)
                else:
                    speeds = rng.uniform(lo, hi, size=(n_trajectories,)).astype(
                        np.float32
                    )
                f.attrs["wave_speeds"] = speeds
                speed = speeds.reshape((n_trajectories,) + bshape[1:])

                def wave(*ks, amp=1.0):
                    space = sum(k * g for k, g in zip(ks, grids))
                    return amp * np.sin(
                        space[(None, None)] + phase + speed * t
                    ).astype(np.float32)

                k1 = (1, 2, 1)[:d]
                k2 = (3, 1, 2)[:d]
                t0 = f.create_group("t0_fields")
                t0.attrs["field_names"] = field_specs["t0"]
                ds = t0.create_dataset("density", data=wave(*k1) + 0.5 * wave(*k2))
                ds.attrs["sample_varying"] = True
                ds.attrs["time_varying"] = True
                if with_pressure:
                    ds = t0.create_dataset(
                        "pressure", data=wave(*k2) + 0.25 * wave(*k1)
                    )
                    ds.attrs["sample_varying"] = True
                    ds.attrs["time_varying"] = True

                t1 = f.create_group("t1_fields")
                t1.attrs["field_names"] = field_specs["t1"]
                comps = [wave(*np.roll(k1, i), amp=1.0 - 0.3 * i) for i in range(d)]
                vel = np.stack(comps, axis=-1)
                ds = t1.create_dataset("velocity", data=vel)
                ds.attrs["sample_varying"] = True
                ds.attrs["time_varying"] = True

                t2 = f.create_group("t2_fields")
                t2.attrs["field_names"] = field_specs["t2"]
                if with_t2:
                    comps = [
                        wave(*np.roll(k1, i), amp=1.0 - 0.1 * i) for i in range(d * d)
                    ]
                    stress = np.stack(comps, axis=-1).reshape(
                        n_trajectories, n_steps, *resolution, d, d
                    )
                    ds = t2.create_dataset("stress", data=stress)
                    ds.attrs["sample_varying"] = True
                    ds.attrs["time_varying"] = True

    return root
