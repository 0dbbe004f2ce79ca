"""Learning-quality gates (slow): train small models on the synthetic
waves until the rollout error crosses a quality bar.

These are the round-level accuracy regression tests standing in for the
real Well benchmarks (absent from the image); they catch optimizer /
rollout / gradient wiring defects that shape tests can't.
Run with: python -m pytest -m slow tests/test_learning_quality.py
"""

import os

import numpy as np
import pytest

from tante_tpu.data import TanteDataModule
from tante_tpu.models import FNO, TANTE
from tante_tpu.train import (
    L2RE,
    MSE,
    NNMSE,
    VRMSE,
    AdamW,
    LinearWarmupCosineAnnealingLR,
    R_Evaler,
    R_Trainer,
    Trainer,
)


def make_dm(well_root, n_out=1, eval_out=4):
    return TanteDataModule(
        base_path=well_root,
        dataset_name="synthetic_waves",
        batch_size=4,
        n_steps_input=4,
        n_steps_output=n_out,
        eval_steps_output=eval_out,
        data_workers=2,
        seed=0,
    )


def run_training(dm, model, tmp_path, epochs, lr=2e-3):
    trainer = Trainer(
        checkpoint_folder=str(tmp_path),
        formatter="channels_first_default",
        model=model,
        datamodule=dm,
        optimizer=AdamW(lr=lr, weight_decay=1e-5),
        train_loss_fn=MSE(),
        eval_loss_fn=L2RE(),
        max_epoch=epochs,
        lr_scheduler=LinearWarmupCosineAnnealingLR(
            warmup_epochs=2, max_epochs=epochs, lr=lr,
            warmup_start_lr=0.1 * lr, eta_min=0.1 * lr,
        ),
        n_steps_output=dm.train_dataset.n_steps_output,
        n_steps_rollout=4,
        seed=0,
    )
    loader = dm.train_dataloader()
    for epoch in range(1, epochs + 1):
        loader.set_epoch(epoch)
        trainer.train_one_epoch(epoch, loader)
    return trainer.validation_loop(dm.val_dataloader())


@pytest.mark.slow
def test_fno_learns_synthetic_waves(well_root, tmp_path):
    dm = make_dm(well_root)
    md = dm.train_dataset.metadata
    model = FNO(in_T=4, dset_metadata=md, modes1=8, modes2=12, hidden_channels=32)
    val_l2re = run_training(dm, model, tmp_path, epochs=40)
    # Traveling waves are near-linear dynamics; a trained FNO should beat
    # the trivial predict-zero baseline (L2RE ~ 1.0) by a wide margin.
    assert val_l2re < 0.30, f"FNO failed to learn: 4-step rollout L2RE {val_l2re}"


@pytest.mark.slow
def test_tante_learns_synthetic_waves(well_root, tmp_path):
    dm = make_dm(well_root)
    md = dm.train_dataset.metadata
    model = TANTE(
        in_T=4,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THWTHW",
        embed_dim=64,
        patch_scale=8,
        n_head=4,
        mlp_ratio=1.0,
        output_length=1,
        deg=True,
    )
    val_l2re = run_training(dm, model, tmp_path, epochs=40)
    assert val_l2re < 0.35, f"TANTE failed to learn: 4-step rollout L2RE {val_l2re}"


@pytest.mark.slow
def test_adaptive_tante_converges_and_saves_calls(well_root, tmp_path):
    """Adaptive gate (VERDICT r3 item #5): the variable-frame R_Trainer
    must CONVERGE (train loss decreasing, finite; the unreachable-band
    divergence of docs/EVIDENCE.md round 4 would fail this) and the
    trained confidence head must realize fewer eval calls than rollout
    steps — the reference's adaptive-efficiency claim
    (trainer/r_evaler.py:160-164) as a regression test."""
    dm = make_dm(well_root, n_out=8, eval_out=8)
    md = dm.train_dataset.metadata
    model = TANTE(
        in_T=4,
        dset_metadata=md,
        taylor_order=1,
        attn_axes="THWTHW",
        embed_dim=64,
        patch_scale=8,
        n_head=4,
        mlp_ratio=1.0,
        deg=False,
        dropout=0.0,
    )
    epochs = 25
    lr = 2e-3
    trainer = R_Trainer(
        checkpoint_folder=str(tmp_path),
        formatter="channels_first_default",
        model=model,
        datamodule=dm,
        optimizer=AdamW(lr=lr, weight_decay=1e-5),
        train_loss_fn=MSE(),
        eval_loss_fn=L2RE(),
        max_epoch=epochs,
        lr_scheduler=LinearWarmupCosineAnnealingLR(
            warmup_epochs=2, max_epochs=epochs, lr=lr,
            warmup_start_lr=0.1 * lr, eta_min=0.1 * lr,
        ),
        n_steps_output=8,
        n_steps_rollout=8,
        train_out_T=4.0,
        rt_band_hi=4.0,
        rt_eps=3.0,  # band [4, 4], REACHABLE under the out_T=4 train cap
        seed=0,
    )
    loader = dm.train_dataloader()
    losses = []
    for epoch in range(1, epochs + 1):
        loader.set_epoch(epoch)
        loss, logs = trainer.train_one_epoch(epoch, loader)
        losses.append(loss)
    assert np.isfinite(losses).all(), f"diverged: {losses[-3:]}"
    assert losses[-1] < 0.5 * losses[0], f"not converging: {losses[0]} -> {losses[-1]}"
    val = trainer.validation_loop(dm.val_dataloader())
    assert np.isfinite(val)
    trainer.save_model(epochs, val, "recent")

    evaler = R_Evaler(
        checkpoint_folder=str(tmp_path),
        formatter="channels_first_default",
        model=model,
        datamodule=dm,
        eval_loss_fn1=MSE(),
        eval_loss_fn2=L2RE(),
        eval_loss_fn3=NNMSE(),
        eval_loss_fn4=VRMSE(),
        checkpoint_path=os.path.join(str(tmp_path), "recent"),
        n_steps_rollout=8,
        batch_size=4,
    )
    report = evaler.Eval(mode="common")
    # The head trained into the [4, 4] band must emit r_t >> 1 at eval:
    # an 8-step rollout in well under 8 calls.
    assert report["model_calls_per_rollout"] <= 4, report
    assert report["rt_mean"] >= 2.0, report
