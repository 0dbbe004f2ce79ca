"""Evaluation CLI (reference ``eval.py:21-60`` capabilities).

Usage:
  python -m tante_tpu.cli.eval --config-name=tante [--choose=best] [key=value ...]
"""

from __future__ import annotations

import argparse
import logging

from tante_tpu.config import instantiate, load_config, set_ckpt
from tante_tpu.utils.compile_cache import enable_persistent_compile_cache
from tante_tpu.utils.logging import MetricLogger
from tante_tpu.utils.seeding import set_seed

logger = logging.getLogger("tante_tpu.eval")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="tante")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--choose", default="recent", choices=["recent", "best"])
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = load_config(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    # Eval protocol forces the data window to the rollout length
    # (reference eval.py:23).
    cfg.data.eval_steps_output = cfg.evaler.n_steps_rollout
    cfg, checkpoint_folder = set_ckpt(cfg, choose=args.choose)

    set_seed(cfg.seed)

    logger.info("Instantiate datamodule %s", cfg.data._target_)
    datamodule = instantiate(cfg.data, seed=cfg.seed)
    dset_metadata = datamodule.train_dataset.metadata
    print(dset_metadata)

    logger.info("Instantiate model %s", cfg.model._target_)
    model = instantiate(cfg.model, dset_metadata=dset_metadata)

    metric_logger = MetricLogger(checkpoint_folder)

    logger.info("Instantiate evaler %s", cfg.evaler._target_)
    evaler = instantiate(
        cfg.evaler,
        checkpoint_folder=checkpoint_folder,
        model=model,
        datamodule=datamodule,
        batch_size=cfg.data.batch_size,
        metric_logger=metric_logger,
    )
    report = evaler.Eval(mode="common")
    print(report)


if __name__ == "__main__":
    main()
