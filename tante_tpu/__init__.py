"""tante_tpu: a TPU-native (JAX/XLA/Pallas) operator-learning framework.

A from-scratch rebuild of the capabilities of zwu88/TANTE ("Time-Adaptive
Operator Learning via Neural Taylor Expansion") designed for TPU hardware:

- channels-last ``(B, T, H, W, C)`` tensors everywhere (MXU/VPU friendly),
- ``lax.scan`` / ``lax.while_loop`` autoregressive rollouts (compiled, static
  shapes; the adaptive step count is handled with masking, not Python loops),
- ``jax.sharding.Mesh`` + NamedSharding data/spatial parallelism over ICI,
- Pallas kernels for the truncated-mode spectral matmul and attention,
- an HDF5 (The Well format) input pipeline with host-side prefetch.

Layout (mirrors the reference's layer map, SURVEY.md section 1):
  config.py / registry.py  -- YAML + ``_target_`` instantiation (Hydra parity)
  data/                    -- Well HDF5 dataset, datamodule, loader, fixtures
  models/                  -- TANTE + baseline zoo (FNO, TFNO, AFNO, UNO,
                              DPOT, AViT, CViT, UNetConvNext, AttentionUNet)
  ops/                     -- spectral conv, attention, adaptive pooling,
                              Pallas kernels
  parallel/                -- mesh / sharding / halo-exchange helpers
  train/                   -- Trainer, R_Trainer, Evaler, R_Evaler, metrics,
                              schedules
  utils/                   -- seeding, checkpointing, logging, profiling
"""

__version__ = "0.1.0"
