"""Training CLI (reference ``train.py:22-83`` capabilities).

Usage:
  python -m tante_tpu.cli.train --config-name=tante [key=value ...]

Flow: resolve checkpoint (auto-resume), seed, instantiate datamodule ->
model -> optimizer -> scheduler -> trainer, dump ``extended_config.yaml``,
init metric logging (wandb-compatible), run ``trainer.train()``.
"""

from __future__ import annotations

import argparse
import logging
import os.path as osp

from tante_tpu.config import instantiate, load_config, set_ckpt
from tante_tpu.utils.compile_cache import enable_persistent_compile_cache
from tante_tpu.utils.logging import MetricLogger
from tante_tpu.utils.seeding import set_seed

logger = logging.getLogger("tante_tpu.train")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="tante")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    cfg = load_config(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    cfg, checkpoint_folder = set_ckpt(cfg, choose="recent")
    print(cfg.to_yaml())

    set_seed(cfg.seed)

    logger.info("Instantiate datamodule %s", cfg.data._target_)
    datamodule = instantiate(cfg.data, seed=cfg.seed)
    dset_metadata = datamodule.train_dataset.metadata
    print(dset_metadata)

    logger.info("Instantiate model %s", cfg.model._target_)
    model = instantiate(cfg.model, dset_metadata=dset_metadata)

    logger.info("Instantiate optimizer %s", cfg.optimizer._target_)
    optimizer = instantiate(cfg.optimizer)

    logger.info("Instantiate LR scheduler %s", cfg.lr_scheduler._target_)
    lr_scheduler = instantiate(
        cfg.lr_scheduler,
        max_epochs=cfg.trainer.max_epoch,
        lr=cfg.optimizer.lr,
        warmup_start_lr=cfg.optimizer.lr * 0.1,
        eta_min=cfg.optimizer.lr * 0.1,
    )

    metric_logger = MetricLogger(
        checkpoint_folder,
        project=cfg.get("wandb_project_name"),
        group=cfg.data.dataset_name,
        name=cfg.get("experiment"),
        config=cfg.to_dict(),
        use_wandb=bool(cfg.get("use_wandb", False)),
    )

    logger.info("Instantiate trainer %s", cfg.trainer._target_)
    trainer = instantiate(
        cfg.trainer,
        checkpoint_folder=checkpoint_folder,
        model=model,
        datamodule=datamodule,
        optimizer=optimizer,
        lr_scheduler=lr_scheduler,
        seed=cfg.seed,
        metric_logger=metric_logger,
    )

    # Model summary (reference uses torchinfo at train.py:36).
    import jax as _jax

    n_params = sum(
        int(p.size)
        for p in _jax.tree.leaves(trainer.params.get("params", trainer.params))
    )
    logger.info("Model parameters: %s", f"{n_params:,}")

    with open(osp.join(checkpoint_folder, "extended_config.yaml"), "w") as f:
        f.write(cfg.to_yaml())

    trainer.train()
    metric_logger.finish()


if __name__ == "__main__":
    main()
