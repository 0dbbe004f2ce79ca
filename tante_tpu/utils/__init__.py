from tante_tpu.utils.seeding import set_seed
from tante_tpu.utils.checkpoint import CheckpointManager
from tante_tpu.utils.logging import MetricLogger

__all__ = ["set_seed", "CheckpointManager", "MetricLogger"]
