"""DataModule + batch formatters (reference ``data/datamodule.py`` parity).

``TanteDataModule`` builds train/val/test ``TanteDataset``s (val & test use
``eval_steps_output`` as their output window, reference
``data/datamodule.py:60-84``) and hands out prefetching loaders.  Instead of
``DistributedSampler`` rank filtering, multi-device data parallelism happens
by sharding the *batch axis* of each already-collated batch over the mesh
(see ``loader.DataLoader`` and ``parallel/sharding.py``).

Formatters: the reference's ChannelsFirst formatter exists only because
PyTorch convs want NCHW (``data/datamodule.py:184-192``).  This framework is
channels-last end to end (TPU-native layout), so both formatter names map to
layout-preserving implementations; they still own ``nan_to_num`` and remain
the seam where a different layout could be injected.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Literal, Optional, Tuple

import jax.numpy as jnp

from tante_tpu.data.dataset import TanteDataset, TanteMetadata
from tante_tpu.data.loader import DataLoader


class AbstractDataModule(ABC):
    @abstractmethod
    def train_dataloader(self) -> DataLoader: ...

    @abstractmethod
    def val_dataloader(self) -> DataLoader: ...

    @abstractmethod
    def test_dataloader(self) -> DataLoader: ...


class TanteDataModule(AbstractDataModule):
    def __init__(
        self,
        base_path: str,
        dataset_name: str,
        batch_size: int,
        include_filters: Optional[List[str]] = None,
        exclude_filters: Optional[List[str]] = None,
        n_steps_input: int = 1,
        n_steps_output: int = 1,
        eval_steps_output: int = 2,
        dt_stride: int = 1,
        world_size: int = 1,
        data_workers: int = 4,
        rank: int = 0,
        seed: int = 0,
        sharding: Optional[Any] = None,
        use_wellpack: bool = False,
        wellpack_cache_dir: Optional[str] = None,
        dataset_kws: Optional[Dict[Literal["train", "val", "test"], Dict[str, Any]]] = None,
        **_unused: Any,
    ):
        def build(split: str, n_out: int, key: str) -> TanteDataset:
            return TanteDataset(
                base_path=base_path,
                dataset_name=dataset_name,
                split_name=split,
                include_filters=include_filters,
                exclude_filters=exclude_filters,
                n_steps_input=n_steps_input,
                n_steps_output=n_out,
                dt_stride=dt_stride,
                **((dataset_kws or {}).get(key) or {}),
            )

        self.train_dataset = build("train", n_steps_output, "train")
        self.val_dataset = build("valid", eval_steps_output, "val")
        self.test_dataset = build("test", eval_steps_output, "test")
        self.base_path = base_path
        self.dataset_name = dataset_name
        self.batch_size = batch_size
        self.world_size = world_size
        self.data_workers = data_workers
        self.rank = rank
        self.seed = seed
        self.sharding = sharding
        # Native (C++) batch-assembly fast path; falls back to the Python
        # loader when the shared library can't be built.
        self.use_wellpack = use_wellpack
        self.wellpack_cache_dir = wellpack_cache_dir or os.path.join(
            base_path, dataset_name, "wellpack_cache"
        )
        self._wellpack_paths: Dict[str, str] = {}

    @property
    def is_distributed(self) -> bool:
        return self.world_size > 1

    def _wellpack_loader(self, dataset, split: str, shuffle: bool):
        from tante_tpu.data.wellpack import WellPackLoader, build_cache, get_library

        if get_library() is None:
            return None
        key = f"{split}_{dataset.n_steps_output}"
        if key not in self._wellpack_paths:
            path = os.path.join(self.wellpack_cache_dir, f"{key}.wpk")
            if not os.path.exists(path):
                build_cache(dataset, path)
            self._wellpack_paths[key] = path
        return WellPackLoader(
            self._wellpack_paths[key],
            n_steps_input=dataset.n_steps_input,
            n_steps_output=dataset.n_steps_output,
            dt_stride=dataset.dt_stride,
            batch_size=self.batch_size,
            shuffle=shuffle,
            seed=self.seed,
            num_threads=self.data_workers,
            sharding=self.sharding,
        )

    def _loader(self, dataset, shuffle: bool, split: str = "train"):
        if self.use_wellpack:
            loader = self._wellpack_loader(dataset, split, shuffle)
            if loader is not None:
                return loader
        return DataLoader(
            dataset,
            batch_size=self.batch_size,
            shuffle=shuffle,
            drop_last=True,
            num_workers=self.data_workers,
            seed=self.seed,
            sharding=self.sharding,
        )

    def train_dataloader(self) -> DataLoader:
        return self._loader(self.train_dataset, shuffle=True, split="train")

    def val_dataloader(self) -> DataLoader:
        # Reference shuffles val too (data/datamodule.py:134).
        return self._loader(self.val_dataset, shuffle=True, split="valid")

    def test_dataloader(self) -> DataLoader:
        return self._loader(self.test_dataset, shuffle=False, split="test")

    def __repr__(self) -> str:
        return f"<{self.__class__.__name__}: {self.dataset_name} on {self.base_path}>"


class AbstractDataFormatter(ABC):
    def __init__(self, metadata: TanteMetadata):
        self.metadata = metadata

    @abstractmethod
    def process_input(self, data: Dict) -> Tuple: ...

    @abstractmethod
    def process_output(self, output): ...


class DefaultChannelsFirstFormatter(AbstractDataFormatter):
    """Reference-name parity; layout stays channels-last on TPU."""

    def process_input(self, data: Dict) -> Tuple:
        x = jnp.nan_to_num(data["input"])
        y = jnp.nan_to_num(data["output"])
        return (x,), y

    def process_output(self, output):
        return output


class DefaultChannelsLastFormatter(AbstractDataFormatter):
    def process_input(self, data: Dict) -> Tuple:
        x = jnp.nan_to_num(data["input"])
        y = jnp.nan_to_num(data["output"])
        return (x,), y

    def process_output(self, output):
        return output


def get_formatter(name: str, metadata: TanteMetadata) -> AbstractDataFormatter:
    if name == "channels_first_default":
        return DefaultChannelsFirstFormatter(metadata)
    if name == "channels_last_default":
        return DefaultChannelsLastFormatter(metadata)
    raise ValueError(f"Unknown formatter '{name}'")
