"""Serving API: load a trained experiment, run fixed + adaptive rollouts."""

import os

import numpy as np
import pytest

from tante_tpu.config import load_config
from tante_tpu.serve import Predictor


@pytest.fixture(scope="module")
def trained_experiment(well_root, tmp_path_factory):
    """Train a tiny FNO via the real CLI entry point."""
    from tante_tpu.cli.train import main as train_main

    root = str(tmp_path_factory.mktemp("serve_exp"))
    overrides = [
        f"data.base_path={well_root}",
        "data.dataset_name=synthetic_waves",
        "data.batch_size=2",
        "data.n_steps_output=2",
        "data.eval_steps_output=4",
        "data.data_workers=2",
        "model.modes1=4",
        "model.modes2=4",
        "model.hidden_channels=8",
        "trainer.max_epoch=1",
        "trainer.n_steps_output=2",
        "trainer.n_steps_rollout=4",
        f"root_path={root}",
        "experiment=SERVE_TEST",
    ]
    train_main(["--config-name=fno"] + overrides)
    return root, overrides


def test_predictor_from_experiment(trained_experiment, well_root):
    root, overrides = trained_experiment
    p = Predictor.from_experiment(
        "fno", experiment="SERVE_TEST", root_path=root, choose="best",
        overrides=overrides,
    )
    rng = np.random.default_rng(0)
    history = rng.normal(size=(2, 4, 32, 64, 3)).astype(np.float32)
    frames = p.rollout(history, n_steps=6)
    assert frames.shape == (2, 6, 32, 64, 3)
    assert np.isfinite(frames).all()
    # Compile cache reused for the same n_steps
    frames2 = p.rollout(history, n_steps=6)
    np.testing.assert_allclose(frames, frames2)


def test_predictor_missing_checkpoint(tmp_path, well_root):
    with pytest.raises(FileNotFoundError):
        Predictor.from_experiment(
            "fno",
            experiment="DOES_NOT_EXIST",
            root_path=str(tmp_path),
            overrides=[
                f"data.base_path={well_root}",
                "data.dataset_name=synthetic_waves",
            ],
        )


def test_predictor_adaptive(well_root, tmp_path):
    """Adaptive predictor path with a trained-from-init TANTE (no training
    needed to exercise the rollout mechanics)."""
    import jax
    import jax.numpy as jnp

    from tante_tpu.data import TanteDataModule
    from tante_tpu.models import TANTE

    dm = TanteDataModule(
        base_path=well_root, dataset_name="synthetic_waves", batch_size=2,
        n_steps_input=4, n_steps_output=2, eval_steps_output=4, data_workers=1,
    )
    md = dm.train_dataset.metadata
    model = TANTE(
        in_T=4, dset_metadata=md, taylor_order=1, attn_axes="TH",
        embed_dim=32, patch_scale=8, n_head=4, deg=False,
    )
    x = jnp.zeros((2, 4, 32, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, 1.5)
    p = Predictor(model, params, metadata=md)
    frames, rts, n_calls = p.rollout_adaptive(np.zeros((2, 4, 32, 64, 3), np.float32), 4)
    assert frames.shape == (2, 4, 32, 64, 3)
    assert 1 <= n_calls <= 4
    assert len(rts) == n_calls
    # fixed-step helper rejects nothing: rollout() also works for adaptive
    frames2 = p.rollout(np.zeros((2, 4, 32, 64, 3), np.float32), 4)
    assert frames2.shape == (2, 4, 32, 64, 3)
