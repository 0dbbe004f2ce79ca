"""Native WellPack pipeline: cache build, C++ batch assembly, parity with
the pure-Python loader."""

import os

import numpy as np
import pytest

from tante_tpu.data import TanteDataset
from tante_tpu.data.wellpack import WellPackLoader, build_cache, get_library

needs_native = pytest.mark.skipif(
    get_library() is None, reason="g++ / native library unavailable"
)


@pytest.fixture(scope="module")
def cache_path(well_root, tmp_path_factory):
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
    )
    path = str(tmp_path_factory.mktemp("wpk") / "train.wpk")
    build_cache(ds, path)
    return path


@needs_native
def test_cache_roundtrip_matches_dataset(well_root, cache_path):
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
    )
    loader = WellPackLoader(
        cache_path,
        n_steps_input=4,
        n_steps_output=2,
        batch_size=1,
        shuffle=False,
        num_threads=2,
    )
    assert loader.n_items == len(ds)
    # Sequential order: batch i == dataset item i.
    for i, batch in enumerate(loader):
        want = ds[i]
        np.testing.assert_allclose(
            np.asarray(batch["input"])[0], want["input"], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(batch["output"])[0], want["output"], rtol=1e-6
        )
        if i >= 5:
            break
    loader.close()


@needs_native
def test_loader_batching_and_shuffle(cache_path):
    loader = WellPackLoader(
        cache_path,
        n_steps_input=4,
        n_steps_output=2,
        batch_size=4,
        shuffle=True,
        seed=3,
        num_threads=4,
    )
    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0]["input"].shape == (4, 4, 32, 64, 3)
    assert batches[0]["output"].shape == (4, 2, 32, 64, 3)
    first_epoch = np.asarray(batches[0]["input"])

    loader.set_epoch(1)
    batches2 = list(loader)
    assert not np.allclose(first_epoch, np.asarray(batches2[0]["input"]))
    loader.close()


@needs_native
def test_loader_dt_stride(well_root, tmp_path):
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=2,
        n_steps_output=1,
        dt_stride=2,
    )
    path = str(tmp_path / "s.wpk")
    build_cache(ds, path)
    loader = WellPackLoader(
        path, n_steps_input=2, n_steps_output=1, dt_stride=2, batch_size=1
    )
    batch = next(iter(loader))
    want = ds[0]
    np.testing.assert_allclose(np.asarray(batch["input"])[0], want["input"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(batch["output"])[0], want["output"], rtol=1e-6)
    loader.close()


@needs_native
def test_datamodule_wellpack_integration(well_root, tmp_path):
    from tante_tpu.data import TanteDataModule

    dm = TanteDataModule(
        base_path=well_root,
        dataset_name="synthetic_waves",
        batch_size=2,
        n_steps_input=4,
        n_steps_output=2,
        eval_steps_output=4,
        data_workers=2,
        use_wellpack=True,
        wellpack_cache_dir=str(tmp_path / "cache"),
    )
    loader = dm.train_dataloader()
    from tante_tpu.data.wellpack import WellPackLoader

    assert isinstance(loader, WellPackLoader)
    batch = next(iter(loader))
    assert batch["input"].shape == (2, 4, 32, 64, 3)
    # val split uses eval_steps_output
    vloader = dm.val_dataloader()
    vbatch = next(iter(vloader))
    assert vbatch["output"].shape == (2, 4, 32, 64, 3)
