"""The Well HDF5 windowed dataset (host-side, numpy out).

Re-implements the reference's data layer (``data/dataset.py:65-268``) for a
TPU input pipeline: items come out as channels-last float32 numpy arrays
``{'input': (T_in, H, W, C), 'output': (T_out, H, W, C)}``; batching,
shuffling and device placement live in ``loader.py``.

File-format contract (identical to the reference / The Well):
  <base>/<name>/stats.yaml                  per-field mean/std
  <base>/<name>/data/<split>/*.hdf5         one or more trajectory files with
    attrs: n_trajectories, n_spatial_dims, dataset_name
    groups: dimensions (attrs spatial_dims; datasets time + spatial dims),
            boundary_conditions/<bc> (attr bc_type),
            t0_fields/t1_fields/t2_fields (attr field_names; per-field
            datasets with attrs sample_varying, time_varying)

Window math (reference ``data/dataset.py:39-41,229-243``):
  windows/trajectory = total_steps - (1 + dt*(n_in + n_out - 1)) + 1
  index -> (file, trajectory, window start) via cumulative offsets +
  searchsorted, first offset forced to -1.
"""

from __future__ import annotations

import contextlib

import itertools
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import h5py as h5
import numpy as np
import yaml

# HDF5 chunk-cache + remote-IO tuning (reference IO_PARAMS,
# data/dataset.py:27-36): 8 MiB chunk cache; for non-local paths, fsspec
# block-cached reads of 8 MiB blocks.
H5_PARAMS = {"rdcc_nbytes": 8 * 1024 * 1024}
FSSPEC_PARAMS = {"cache_type": "blockcache", "block_size": 8 * 1024 * 1024}


@contextlib.contextmanager
def _closing_h5(f):
    """Close an ``_open_h5`` handle AND its underlying fsspec file (h5py
    does not close user-provided file-like objects)."""
    try:
        yield f
    finally:
        TanteDataset._close_h5(f)


def compute_windows(total_steps: int, n_steps_input: int, n_steps_output: int, dt_stride: int) -> int:
    elapsed = 1 + dt_stride * (n_steps_input + n_steps_output - 1)
    return max(0, total_steps - elapsed + 1)


@dataclass
class TanteMetadata:
    """Dataset metadata passed to every model constructor (reference
    ``data/dataset.py:43-63``, consumed at ``train.py:31,35``)."""

    dataset_name: str
    n_spatial_dims: int
    spatial_resolution: Tuple[int, ...]
    field_names: Dict[int, List[str]]
    boundary_condition_types: List[str]
    n_files: int
    n_trajectories_per_file: List[int]
    n_steps_per_trajectory: List[int]
    n_fields: int

    @property
    def sample_shapes(self) -> Dict[str, List[int]]:
        return {
            "input_fields": [*self.spatial_resolution, self.n_fields],
            "output_fields": [*self.spatial_resolution, self.n_fields],
            "space_grid": [*self.spatial_resolution, self.n_spatial_dims],
        }


class TanteDataset:
    """Sliding-window dataset over a split directory of Well HDF5 files."""

    def __init__(
        self,
        base_path: str = "./dataset",
        dataset_name: Optional[str] = None,
        split_name: str = "train",
        include_filters: Optional[List[str]] = None,
        exclude_filters: Optional[List[str]] = None,
        n_steps_input: int = 1,
        n_steps_output: int = 1,
        dt_stride: int = 1,
        min_std: float = 1e-4,
        **_unused: Any,
    ):
        # fsspec filesystem resolution: local paths stay plain h5py opens;
        # remote URIs (s3://, gs://, http(s)://, ...) read through an 8 MiB
        # fsspec blockcache (reference data/dataset.py:27-36,182-184).
        import fsspec

        self._fs, _ = fsspec.core.url_to_fs(base_path)
        proto = self._fs.protocol
        proto = proto[0] if isinstance(proto, (tuple, list)) else proto
        self._is_local = proto in ("file", "local")

        self.data_path = "/".join([base_path.rstrip("/"), dataset_name, "data", split_name])
        self.normalization_path = "/".join([base_path.rstrip("/"), dataset_name, "stats.yaml"])
        self.n_steps_input = n_steps_input
        self.n_steps_output = n_steps_output
        self.dt_stride = dt_stride

        with self._fs.open(self.normalization_path, "r") as f:
            stats = yaml.safe_load(f)
        # Per-field z-score stats with std clipped from below
        # (reference data/dataset.py:86-89).
        self.means = {k: np.asarray(v, dtype=np.float32) for k, v in stats["mean"].items()}
        self.stds = {
            k: np.clip(np.asarray(v, dtype=np.float32), min_std, None)
            for k, v in stats["std"].items()
        }

        listed = self._fs.ls(self.data_path, detail=False)
        files = sorted(
            self._fs.unstrip_protocol(p) if not self._is_local else p
            for p in listed
            if p.endswith((".h5", ".hdf5"))
        )
        include_filters = include_filters or []
        exclude_filters = exclude_filters or []
        if include_filters:
            kept = []
            for inc in include_filters:
                kept += [f for f in files if inc in f]
            files = kept
        for exc in exclude_filters:
            files = [f for f in files if exc not in f]
        assert files, f"No HDF5 files found in path {self.data_path}"
        self.files_paths = sorted(files)

        self._handles: List[Optional[h5.File]] = [None] * len(self.files_paths)
        self.metadata = self._build_metadata()

    def _open_h5(self, path: str) -> h5.File:
        if self._is_local:
            return h5.File(path, "r", **H5_PARAMS)
        # h5py does NOT close user-provided file-like objects; keep the
        # fsspec handle (and its 8 MiB blockcache) attached to the h5.File
        # so close() below can release both.
        raw = self._fs.open(path, "rb", **FSSPEC_PARAMS)
        f = h5.File(raw, "r", **H5_PARAMS)
        f._tante_raw = raw
        return f

    @staticmethod
    def _close_h5(f: h5.File) -> None:
        raw = getattr(f, "_tante_raw", None)
        f.close()
        if raw is not None:
            raw.close()

    # ------------------------------------------------------------------
    def _build_metadata(self) -> TanteMetadata:
        self.n_trajectories_per_file: List[int] = []
        self.n_steps_per_trajectory: List[int] = []
        self.n_windows_per_trajectory: List[int] = []
        self.file_index_offsets: List[int] = [0]
        sizes, ndims, names, bcs = set(), set(), set(), set()
        self.field_names: Dict[int, List[str]] = {i: [] for i in range(3)}

        for index, path in enumerate(self.files_paths):
            with _closing_h5(self._open_h5(path)) as f:
                trajectories = int(f.attrs["n_trajectories"])
                steps = f["dimensions"]["time"].shape[-1]
                windows = compute_windows(
                    steps, self.n_steps_input, self.n_steps_output, self.dt_stride
                )
                assert windows > 0, (
                    f"{steps} steps is not enough for file {path} to allow "
                    f"{self.n_steps_input} input and {self.n_steps_output} output "
                    f"steps with stride {self.dt_stride}"
                )
                self.n_trajectories_per_file.append(trajectories)
                self.n_steps_per_trajectory.append(steps)
                self.n_windows_per_trajectory.append(windows)
                self.file_index_offsets.append(
                    self.file_index_offsets[-1] + trajectories * windows
                )
                spatial_dims = list(f["dimensions"].attrs["spatial_dims"])
                sizes.add(tuple(f["dimensions"][d].shape[-1] for d in spatial_dims))
                ndims.add(int(f.attrs["n_spatial_dims"]))
                names.add(str(f.attrs["dataset_name"]))
                for bc in f["boundary_conditions"]:
                    bcs.add(str(f["boundary_conditions"][bc].attrs["bc_type"]))
                if index == 0:
                    # Tensor-order field naming: order-k fields get one name
                    # per spatial-dim k-tuple (reference data/dataset.py:149-158).
                    for i in range(3):
                        group = f[f"t{i}_fields"]
                        dim_tuples = [
                            "".join(xyz)
                            for xyz in itertools.product(spatial_dims, repeat=i)
                        ]
                        for field in group.attrs["field_names"]:
                            for dims in dim_tuples:
                                if group[field].attrs["time_varying"]:
                                    self.field_names[i].append(
                                        f"{field}_{dims}" if dims else field
                                    )

        self.file_index_offsets[0] = -1  # searchsorted convention
        self.len = self.file_index_offsets[-1]
        self._offsets_np = np.asarray(self.file_index_offsets)

        return TanteMetadata(
            dataset_name=names.pop(),
            n_spatial_dims=ndims.pop(),
            spatial_resolution=tuple(map(int, sizes.pop())),
            field_names=self.field_names,
            boundary_condition_types=sorted(bcs),
            n_files=len(self.files_paths),
            n_trajectories_per_file=self.n_trajectories_per_file,
            n_steps_per_trajectory=self.n_steps_per_trajectory,
            n_fields=sum(map(len, self.field_names.values())),
        )

    # ------------------------------------------------------------------
    def _file(self, file_idx: int) -> h5.File:
        # Lazy per-process handle (reference data/dataset.py:182-184); with
        # thread workers h5py serializes access internally.
        if self._handles[file_idx] is None:
            self._handles[file_idx] = self._open_h5(self.files_paths[file_idx])
        return self._handles[file_idx]

    def _reconstruct_fields(
        self, f: h5.File, sample_idx: int, time_idx: int, n_steps: int, dt: int
    ) -> List[np.ndarray]:
        """Read + normalize one window; returns channels-last field blocks.

        Order-0 fields contribute 1 channel, order-1 d channels, order-2 d^2
        (reference ``data/dataset.py:190-227``).  Only time-varying fields
        participate (matches the metadata naming).
        """
        blocks: List[np.ndarray] = []
        for order in range(3):
            group = f[f"t{order}_fields"]
            for name in group.attrs["field_names"]:
                field = group[name]
                if not field.attrs["time_varying"]:
                    continue
                index: Tuple = ()
                if field.attrs["sample_varying"]:
                    index = index + (sample_idx,)
                index = index + (slice(time_idx, time_idx + n_steps * dt, dt),)
                data = np.asarray(field[index], dtype=np.float32)
                if name in self.means:
                    data = data - self.means[name]
                if name in self.stds:
                    data = data / self.stds[name]
                if order == 0:
                    data = data[..., None]  # (T, ..., 1)
                elif order == 2:
                    data = data.reshape(*data.shape[:-2], -1)  # flatten d x d
                blocks.append(data)
        return blocks

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        file_idx = int(np.searchsorted(self._offsets_np, index, side="right") - 1)
        windows = self.n_windows_per_trajectory[file_idx]
        local = index - max(self.file_index_offsets[file_idx], 0)
        sample_idx = local // windows
        time_idx = local % windows
        f = self._file(file_idx)
        blocks = self._reconstruct_fields(
            f,
            sample_idx,
            time_idx,
            self.n_steps_input + self.n_steps_output,
            self.dt_stride,
        )
        field = np.concatenate(blocks, axis=-1)  # (T, H, W, C)
        return {
            "input": field[: self.n_steps_input],
            "output": field[self.n_steps_input :],
        }

    def __len__(self) -> int:
        return self.len

    def close(self) -> None:
        for i, h in enumerate(self._handles):
            if h is not None:
                self._close_h5(h)
                self._handles[i] = None

    def __del__(self):  # pragma: no cover - best-effort cleanup
        try:
            self.close()
        except Exception:
            pass

    def __repr__(self) -> str:
        return f"<{self.__class__.__name__}: {self.data_path}>"
