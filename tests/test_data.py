"""Data layer: window math, dataset reads, datamodule, loader."""

import os

import numpy as np
import pytest

from tante_tpu.data import (
    DataLoader,
    TanteDataModule,
    TanteDataset,
    compute_windows,
)


def test_compute_windows():
    # reference data/dataset.py:39-41
    assert compute_windows(24, 4, 4, 1) == 24 - (1 + 1 * 7) + 1
    assert compute_windows(24, 6, 8, 2) == 0  # raw value -2, clamped by max(0, .)
    assert compute_windows(10, 4, 4, 1) == 3


def test_dataset_shapes_and_metadata(well_root):
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
        dt_stride=1,
    )
    md = ds.metadata
    assert md.n_fields == 3  # density (1) + velocity (2)
    assert md.spatial_resolution == (32, 64)
    assert md.n_spatial_dims == 2
    assert md.field_names[0] == ["density"]
    assert md.field_names[1] == ["velocity_x", "velocity_y"]
    assert len(ds) == 3 * compute_windows(24, 4, 2, 1)

    item = ds[0]
    assert item["input"].shape == (4, 32, 64, 3)
    assert item["output"].shape == (2, 32, 64, 3)
    assert item["input"].dtype == np.float32

    # Window sliding: item[1] input should equal item[0] shifted by one step.
    a, b = ds[0], ds[1]
    np.testing.assert_allclose(a["input"][1:], b["input"][:-1], atol=1e-6)


def test_dataset_dt_stride(well_root):
    ds1 = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=2,
        n_steps_output=1,
        dt_stride=2,
    )
    ds0 = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=1,
        dt_stride=1,
    )
    np.testing.assert_allclose(
        ds1[0]["input"][1], ds0[0]["input"][2], atol=1e-6
    )


def test_datamodule_and_loader(well_root):
    dm = TanteDataModule(
        base_path=well_root,
        dataset_name="synthetic_waves",
        batch_size=2,
        n_steps_input=4,
        n_steps_output=2,
        eval_steps_output=4,
        data_workers=2,
    )
    # val/test use eval_steps_output as output window
    assert dm.val_dataset.n_steps_output == 4
    loader = dm.train_dataloader()
    n = 0
    for batch in loader:
        assert batch["input"].shape == (2, 4, 32, 64, 3)
        assert batch["output"].shape == (2, 2, 32, 64, 3)
        n += 1
    assert n == len(loader)


def test_loader_shuffle_deterministic(well_root):
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=1,
    )
    l1 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    l2 = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=1)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_allclose(np.asarray(b1["input"]), np.asarray(b2["input"]))
    # Different epoch -> different order
    l1.set_epoch(1)
    b3 = next(iter(l1))
    assert not np.allclose(np.asarray(b1["input"]), np.asarray(b3["input"]))


def test_multi_file_dataset_indexing(tmp_path):
    """searchsorted across files with the -1 first offset (reference
    data/dataset.py:160,229-243): items must map to the right file."""
    from tante_tpu.data.synthetic import make_well_dataset
    from tante_tpu.data import TanteDataset

    make_well_dataset(
        str(tmp_path),
        dataset_name="multi",
        splits=("train",),
        n_files_per_split=3,
        n_trajectories=2,
        n_steps=12,
        resolution=(8, 16),
        seed=5,
    )
    ds = TanteDataset(
        base_path=str(tmp_path),
        dataset_name="multi",
        split_name="train",
        n_steps_input=2,
        n_steps_output=1,
    )
    windows = 12 - (1 + (2 + 1 - 1)) + 1  # compute_windows(12, 2, 1, 1)
    assert len(ds) == 3 * 2 * windows
    # Every index readable, shapes consistent; file boundaries exercised.
    for idx in [0, windows - 1, windows, 2 * windows, len(ds) - 1]:
        item = ds[idx]
        assert item["input"].shape == (2, 8, 16, 3)
    # Items from different files differ (different random trajectories).
    a = ds[0]["input"]
    b = ds[2 * 2 * windows]["input"]  # third file
    assert not np.allclose(a, b)


def test_include_exclude_filters(tmp_path):
    from tante_tpu.data.synthetic import make_well_dataset
    from tante_tpu.data import TanteDataset

    make_well_dataset(
        str(tmp_path),
        dataset_name="filt",
        splits=("train",),
        n_files_per_split=3,
        n_trajectories=1,
        n_steps=8,
        resolution=(8, 16),
    )
    ds_all = TanteDataset(
        base_path=str(tmp_path), dataset_name="filt", split_name="train",
        n_steps_input=2, n_steps_output=1,
    )
    ds_inc = TanteDataset(
        base_path=str(tmp_path), dataset_name="filt", split_name="train",
        n_steps_input=2, n_steps_output=1, include_filters=["train_0"],
    )
    ds_exc = TanteDataset(
        base_path=str(tmp_path), dataset_name="filt", split_name="train",
        n_steps_input=2, n_steps_output=1, exclude_filters=["train_0"],
    )
    assert ds_inc.metadata.n_files == 1
    assert ds_exc.metadata.n_files == 2
    assert ds_all.metadata.n_files == 3


def test_t2_tensor_fields(tmp_path):
    """Order-2 (tensor) fields contribute d^2 flattened channels
    (reference data/dataset.py:149-158,220-222)."""
    from tante_tpu.data.synthetic import make_well_dataset
    from tante_tpu.data import TanteDataset

    make_well_dataset(
        str(tmp_path),
        dataset_name="t2set",
        splits=("train",),
        n_trajectories=1,
        n_steps=8,
        resolution=(8, 16),
        with_t2=True,
    )
    ds = TanteDataset(
        base_path=str(tmp_path), dataset_name="t2set", split_name="train",
        n_steps_input=2, n_steps_output=1,
    )
    md = ds.metadata
    # density (1) + velocity (2) + stress (2x2 -> 4)
    assert md.n_fields == 7
    assert md.field_names[2] == ["stress_xx", "stress_xy", "stress_yx", "stress_yy"]
    item = ds[0]
    assert item["input"].shape == (2, 8, 16, 7)


def test_dataset_remote_uri_via_fsspec(well_root):
    """Remote (non-local) dataset paths read through fsspec blockcache
    (reference data/dataset.py:27-36,182-184): exercised with memory://."""
    import fsspec

    from tante_tpu.data.dataset import TanteDataset

    # Mirror the local synthetic Well tree into the in-memory filesystem.
    mem = fsspec.filesystem("memory")
    base = os.path.join(well_root, "synthetic_waves")
    for root, _dirs, files in os.walk(base):
        for fname in files:
            src = os.path.join(root, fname)
            dst = "/remote_well/synthetic_waves" + src[len(base):]
            with open(src, "rb") as f:
                mem.pipe_file(dst, f.read())

    local = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
    )
    remote = TanteDataset(
        base_path="memory://remote_well",
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
    )
    assert len(remote) == len(local)
    a, b = local[3], remote[3]
    np.testing.assert_array_equal(a["input"], b["input"])
    np.testing.assert_array_equal(a["output"], b["output"])


def test_multihost_loader_slicing(monkeypatch):
    """Simulated 2-host loading (VERDICT r2 next-step #6): with
    ``jax.process_count() == 2`` each process must collate only ITS slice of
    the global batch (``loader.py:local_slice``), the two slices must
    reassemble the exact single-host global batch in order, and the shard
    handed to ``make_array_from_process_local_data`` must be the per-host
    half.  (The real multi-host assembly is jax's contract; the slicing
    math here is ours — the rank arithmetic of the reference
    DistributedSampler, data/datamodule.py:98-108.)"""
    import jax as jax_mod

    from tante_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    sentinel = object()

    def run(rank, count):
        monkeypatch.setattr(jax_mod, "process_count", lambda: count)
        monkeypatch.setattr(jax_mod, "process_index", lambda: rank)
        if count > 1:
            monkeypatch.setattr(
                jax_mod,
                "make_array_from_process_local_data",
                lambda sharding, v: v,  # pass the local shard through
            )
        dl = DataLoader(
            _DS(), batch_size=8, shuffle=True, drop_last=True,
            num_workers=2, seed=3, sharding=sentinel if count > 1 else None,
        )
        return [np.asarray(b["x"]) for b in dl]

    shard0 = run(0, 2)
    shard1 = run(1, 2)
    ref = run(0, 1)
    assert len(shard0) == len(shard1) == len(ref) == 2
    for b0, b1, r in zip(shard0, shard1, ref):
        assert b0.shape[0] == b1.shape[0] == 4  # half the global batch each
        np.testing.assert_array_equal(np.concatenate([b0, b1], axis=0), r)
