"""Data layer: window math, dataset reads, datamodule, loader."""

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
