"""One optimizer step per zoo model: catches backward-pass issues (complex
grads in TFNO, stop_gradient in AViT norm, resize grads in UNO, ...) that
forward shape tests cannot."""

import numpy as np
import pytest

from tante_tpu.data import TanteDataModule
from tante_tpu.train import L2RE, MSE, AdamW, Trainer


@pytest.fixture(scope="module")
def dm8(well_root):
    return TanteDataModule(
        base_path=well_root,
        dataset_name="synthetic_waves",
        batch_size=2,
        n_steps_input=4,
        n_steps_output=1,
        eval_steps_output=2,
        data_workers=2,
        seed=0,
    )


def one_step(dm, model, tmp_path, **kw):
    trainer = Trainer(
        checkpoint_folder=str(tmp_path),
        formatter="channels_first_default",
        model=model,
        datamodule=dm,
        optimizer=AdamW(lr=1e-4),
        train_loss_fn=MSE(),
        eval_loss_fn=L2RE(),
        max_epoch=1,
        n_steps_output=1,
        n_steps_rollout=2,
        seed=0,
        **kw,
    )
    batch = next(iter(dm.train_dataloader()))
    (x,), y = trainer.formatter.process_input(batch)
    import jax

    # snapshot before the step: train_step donates the param buffers
    before = [np.asarray(p) for p in jax.tree.leaves(trainer.params["params"])]
    trainer.params, trainer.opt_state, loss = trainer._train_step(
        trainer.params, trainer.opt_state, x, y, trainer._next_dropout_key()
    )
    after = [np.asarray(p) for p in jax.tree.leaves(trainer.params["params"])]
    assert np.isfinite(float(loss)), f"non-finite loss {loss}"
    # At least one parameter must move (some leaves can sit in zero-grad
    # regions at init, e.g. AFNO's softshrink dead zone).
    assert any(not np.allclose(a, b) for a, b in zip(before, after)), "no update"
    return float(loss)


def _md(dm):
    return dm.train_dataset.metadata


def test_tfno_train_step(dm8, tmp_path):
    from tante_tpu.models import TFNO

    one_step(dm8, TFNO(in_T=4, dset_metadata=_md(dm8), modes1=4, modes2=4, hidden_channels=8), tmp_path)


def test_afno_train_step(dm8, tmp_path):
    from tante_tpu.models import AFNO

    one_step(dm8, AFNO(in_T=4, dset_metadata=_md(dm8), hidden_dim=32, n_blocks=1, patch_size=8), tmp_path)


def test_uno_train_step(tmp_path):
    # UNO's fixed D/32 bottleneck needs a larger grid than the shared
    # 32x64 fixture (the reference assumes >=128-ish resolutions).
    from tante_tpu.data.synthetic import make_well_dataset
    from tante_tpu.models import UNO

    make_well_dataset(
        str(tmp_path / "well"), dataset_name="big", n_trajectories=2,
        n_steps=8, resolution=(64, 128),
    )
    dm = TanteDataModule(
        base_path=str(tmp_path / "well"), dataset_name="big", batch_size=2,
        n_steps_input=4, n_steps_output=1, eval_steps_output=2, data_workers=1,
    )
    one_step(dm, UNO(in_T=4, dset_metadata=_md(dm), width=8), tmp_path)


def test_dpot_train_step(dm8, tmp_path):
    from tante_tpu.models import DPOT

    one_step(
        dm8,
        DPOT(
            in_T=4, dset_metadata=_md(dm8), patch_size=8, out_timesteps=1,
            depth=1, embed_dim=64, n_blocks=4, modes=4, out_layer_dim=8,
        ),
        tmp_path,
    )


def test_avit_train_step(dm8, tmp_path):
    from tante_tpu.models import AViT

    # AViT emits min(4, T) = 4 frames/call; rollout with n_steps_output=1
    # truncates, grads flow through frame 0.
    one_step(
        dm8,
        AViT(
            in_T=4, dset_metadata=_md(dm8), out_steps=1, patch_size=(16, 16),
            embed_dim=32, num_heads=4, processor_blocks=1,
        ),
        tmp_path,
    )


def test_unet_convnext_train_step(dm8, tmp_path):
    from tante_tpu.models import UNetConvNext

    one_step(
        dm8,
        UNetConvNext(in_T=4, dset_metadata=_md(dm8), stages=2, blocks_per_stage=1, init_features=4),
        tmp_path,
    )
