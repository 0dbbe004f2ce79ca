"""Native WellPack pipeline: cache build, C++ batch assembly, parity with
the pure-Python loader."""

import os

import numpy as np
import pytest

from tante_tpu.data import TanteDataset
from tante_tpu.data.wellpack import (
    WellPackLoader,
    _build_cache_native,
    build_cache,
    get_h5_library,
    get_library,
)

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


@pytest.mark.skipif(
    get_h5_library() is None, reason="native HDF5 decode unavailable"
)
def test_native_h5_decode_matches_h5py(well_root, tmp_path):
    """The C++ H5Dread + normalize + interleave cache build must produce
    byte-identical output to the pure-h5py reconstruction path (VERDICT
    r3 item #8: drop the per-byte Python stage from the cache build)."""
    ds = TanteDataset(
        base_path=well_root,
        dataset_name="synthetic_waves",
        split_name="train",
        n_steps_input=4,
        n_steps_output=2,
    )
    native_path = str(tmp_path / "native.wpk")
    assert _build_cache_native(ds, native_path) == native_path

    # Pure-h5py reference bytes (the pre-round-4 path, inlined).
    import struct

    from tante_tpu.data.wellpack import _HEADER, _MAGIC

    md = ds.metadata
    h, w = md.spatial_resolution
    t_total = md.n_steps_per_trajectory[0]
    ref_path = str(tmp_path / "ref.wpk")
    with open(ref_path, "wb") as f:
        f.write(
            _HEADER.pack(
                _MAGIC, sum(md.n_trajectories_per_file), t_total, h, w, md.n_fields
            )
        )
        for file_idx in range(md.n_files):
            hf = ds._file(file_idx)
            for sample_idx in range(md.n_trajectories_per_file[file_idx]):
                blocks = ds._reconstruct_fields(hf, sample_idx, 0, t_total, 1)
                traj = np.concatenate(blocks, axis=-1).astype(np.float32)
                f.write(np.ascontiguousarray(traj).tobytes())

    with open(native_path, "rb") as a, open(ref_path, "rb") as b:
        na, nb = a.read(), b.read()
    assert len(na) == len(nb)
    a_arr = np.frombuffer(na[48:], np.float32)
    b_arr = np.frombuffer(nb[48:], np.float32)
    np.testing.assert_array_equal(a_arr, b_arr)
    assert na[:48] == nb[:48]


@pytest.mark.skipif(
    get_h5_library() is None, reason="native HDF5 decode unavailable"
)
def test_native_h5_decode_tensor_fields(tmp_path):
    """Order-1/2 fields: per-component stats + d^2 flattening through the
    native path."""
    from tante_tpu.data.synthetic import make_well_dataset

    root = make_well_dataset(
        str(tmp_path / "wd"),
        dataset_name="tens",
        n_trajectories=2,
        n_steps=8,
        resolution=(8, 16),
        with_t2=True,
    )
    ds = TanteDataset(
        base_path=str(tmp_path / "wd"),
        dataset_name="tens",
        split_name="train",
        n_steps_input=2,
        n_steps_output=2,
    )
    native_path = str(tmp_path / "t.wpk")
    assert _build_cache_native(ds, native_path) == native_path
    md = ds.metadata
    t_total = md.n_steps_per_trajectory[0]
    with open(native_path, "rb") as f:
        f.seek(48)
        got = np.frombuffer(f.read(), np.float32).reshape(
            sum(md.n_trajectories_per_file), t_total, 8, 16, md.n_fields
        )
    for sample_idx in range(2):
        blocks = ds._reconstruct_fields(ds._file(0), sample_idx, 0, t_total, 1)
        want = np.concatenate(blocks, axis=-1).astype(np.float32)
        np.testing.assert_array_equal(got[sample_idx], want)


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
