from tante_tpu.data.dataset import TanteDataset, TanteMetadata, compute_windows
from tante_tpu.data.datamodule import (
    AbstractDataFormatter,
    AbstractDataModule,
    DefaultChannelsFirstFormatter,
    DefaultChannelsLastFormatter,
    TanteDataModule,
    get_formatter,
)
from tante_tpu.data.loader import DataLoader
from tante_tpu.data.synthetic import make_well_dataset

__all__ = [
    "TanteDataset",
    "TanteMetadata",
    "compute_windows",
    "TanteDataModule",
    "AbstractDataModule",
    "AbstractDataFormatter",
    "DefaultChannelsFirstFormatter",
    "DefaultChannelsLastFormatter",
    "get_formatter",
    "DataLoader",
    "make_well_dataset",
]
