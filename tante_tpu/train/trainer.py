"""Fixed-step Trainer (reference ``trainer/trainer.py:72-256`` capabilities).

Everything inside one epoch is a single jitted, donated ``train_step``:
scan rollout -> loss -> grad -> global-norm clip (1.0) -> AdamW update.
bf16 "AMP" is native mixed precision: activations in bfloat16 via the model
``dtype`` while parameters/optimizer state stay float32 — no GradScaler
(reference ``trainer/trainer.py:102-105`` disables it for bf16 too).

Per-epoch behaviors mirrored: LR staircase per epoch, save "recent" every
epoch + "best" on val improvement, ``saved_loss.txt`` appends, wandb-style
scalars {time_per_train_iter, train_loss, lr, valid}.  One reference bug is
fixed rather than ported: ``Trainer`` there never updates ``best_val_loss``
(``trainer/trainer.py:254-255``), so "best" was overwritten every epoch;
here best tracking works (as the reference's own ``R_Trainer`` does at
``r_trainer.py:230``).

CViT branch (reference ``trainer/trainer.py:36-69,161-172``): training
samples ``num_query_points`` random grid sites per batch and computes the
loss on those points only; coordinates are drawn host-side per batch and
passed into the jitted step (static shapes).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tante_tpu.data.datamodule import AbstractDataModule, get_formatter
from tante_tpu.train.rollout import rollout_fixed, rollout_fixed_stateful
from tante_tpu.utils.checkpoint import CheckpointManager
from tante_tpu.utils.logging import MetricLogger

logger = logging.getLogger(__name__)


def sample_query_coords(rng: np.random.Generator, h: int, w: int, m: int):
    """Random query sites for CViT training (reference trainer.py:36-49)."""
    flat = rng.permutation(h * w)[:m]
    h_idx = flat // w
    w_idx = flat % w
    coords = np.stack(
        [h_idx.astype(np.float32) / (h - 1), w_idx.astype(np.float32) / (w - 1)],
        axis=-1,
    )
    return coords, h_idx.astype(np.int32), w_idx.astype(np.int32)


class Trainer:
    def __init__(
        self,
        checkpoint_folder: str,
        formatter: str,
        model: Any,
        datamodule: AbstractDataModule,
        optimizer: Any,  # AdamW spec (train/optimizers.py)
        train_loss_fn: Callable,
        eval_loss_fn: Callable,
        max_epoch: int,
        lr_scheduler: Optional[Any] = None,
        enable_amp: bool = False,
        amp_type: str = "bfloat16",
        checkpoint_path: str = "",
        n_steps_output: int = 1,
        n_steps_rollout: int = 8,
        rt_eps: float = 0.5,
        rt_n: int = 2,
        cvit: bool = False,
        num_query_points: int = 1024,
        seed: int = 0,
        metric_logger: Optional[MetricLogger] = None,
        grad_clip: str = "norm",
        mesh: Optional[Any] = None,
        data_parallel: bool = False,
        **_unused: Any,
    ):
        self.checkpoint_folder = checkpoint_folder
        self.datamodule = datamodule
        self.train_loss_fn = train_loss_fn
        self.eval_loss_fn = eval_loss_fn
        self.max_epoch = max_epoch
        self.n_steps_output = n_steps_output
        self.n_steps_rollout = n_steps_rollout
        self.rt_eps = rt_eps
        self.rt_n = rt_n
        self.cvit = cvit
        self.num_query_points = num_query_points
        self.starting_epoch = 1
        self.best_val_loss: Optional[float] = None
        self.starting_val_loss = float("inf")

        self.dset_metadata = datamodule.train_dataset.metadata
        self.formatter = get_formatter(formatter, self.dset_metadata)
        self.metric_logger = metric_logger or MetricLogger(checkpoint_folder)

        # bf16 mixed precision: swap the model's compute dtype.
        if enable_amp:
            self.model = model.clone(dtype=jnp.bfloat16)
        else:
            self.model = model
        # Tensor parallelism + the fused block kernel: when the geometry
        # shards evenly, blocks run the Megatron-split fused kernel under
        # shard_map (ops/pallas_block.py:fused_block_apply_tp) — the two
        # half kernels per tp shard with one psum after each, so tp keeps
        # the ~2x kernel win (docs/PERF.md round-2 forfeit, now closed).
        # Uneven geometries fall back to the identical XLA block math,
        # which XLA's SPMD partitioner shards from the param NamedShardings.
        if (
            mesh is not None
            and dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1) > 1
            and getattr(self.model, "fused_blocks", False)
        ):
            from tante_tpu.ops.pallas_block import tp_fusable

            tp = dict(zip(mesh.axis_names, mesh.devices.shape))["tp"]
            c = getattr(self.model, "embed_dim", 0)
            heads = getattr(self.model, "n_head", 1)
            hidden = int(c * getattr(self.model, "mlp_ratio", 1.0))
            if tp_fusable(c, heads, hidden, tp) and hasattr(self.model, "tp_mesh"):
                self.model = self.model.clone(tp_mesh=mesh)
            else:
                self.model = self.model.clone(fused_blocks=False)

        # Spatial (H-axis) sharding — SURVEY.md section 2.6 item (b), a new
        # capability with no reference counterpart: fields larger than one
        # chip's HBM.  Two integration styles, keyed on what the model
        # exposes:
        #   sp_mesh  (FNO): the model embeds shard_map islands around its
        #     spectral convs (partial-DFT partial sums + one psum,
        #     parallel/halo.py); everything else is pointwise over H and
        #     jit's SPMD partitioner keeps it local given H-sharded inputs.
        #   sp_axis  (AttentionUNet): the whole forward runs inside
        #     shard_map — 3x3 convs halo-exchange boundary rows
        #     (halo_exchange), BatchNorm stats sync over all mesh axes.
        self.sp_shardmap = False
        self._mesh_axes = (
            dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh is not None else {}
        )
        if self._mesh_axes.get("sp", 1) > 1:
            if hasattr(self.model, "sp_mesh"):
                self.model = self.model.clone(sp_mesh=mesh)
            elif hasattr(self.model, "sp_axis"):
                self.model = self.model.clone(
                    sp_axis="sp", stat_axes=tuple(mesh.axis_names)
                )
                self.sp_shardmap = True
            else:
                logger.warning(
                    "mesh has an 'sp' axis but %s has no spatial-sharding "
                    "support (sp_mesh/sp_axis); the H axis stays replicated",
                    type(self.model).__name__,
                )

        self.rng = np.random.default_rng(seed)
        self.root_key = jax.random.PRNGKey(seed)

        # ---- parameter init -------------------------------------------
        md = self.dset_metadata
        t_in = datamodule.train_dataset.n_steps_input
        sample_shape = (1, t_in, *md.spatial_resolution, md.n_fields)
        init_key, self.dropout_key = jax.random.split(self.root_key)
        dummy = jnp.zeros(sample_shape, jnp.float32)
        # Param shapes don't depend on the sp wiring; init with the plain
        # model (halo_exchange/axis_index need shard_map context, and a
        # B=1 dummy can't shard over 'dp' inside the spectral shard_map).
        init_model = self.model
        if getattr(init_model, "sp_mesh", None) is not None:
            init_model = init_model.clone(sp_mesh=None)
        if getattr(init_model, "sp_axis", None) is not None:
            init_model = init_model.clone(sp_axis=None, stat_axes=())
        if self.cvit:
            dummy_coords = jnp.zeros((4, 2), jnp.float32)
            self.params = jax.jit(init_model.init)(init_key, dummy, dummy_coords)
        else:
            self.params = jax.jit(init_model.init)(init_key, dummy)

        # ---- mesh / data parallelism -----------------------------------
        # One jax.sharding.Mesh replaces the reference's DistributedSampler
        # plumbing (SURVEY.md section 2.6): batches are sharded over 'dp',
        # params are replicated (tp-sharded where the mesh has a 'tp' axis),
        # and XLA inserts the gradient psum under jit.
        if mesh is None and data_parallel and len(jax.devices()) > 1:
            from tante_tpu.parallel import make_mesh

            mesh = make_mesh(axis_names=("dp",))
        self.mesh = mesh
        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            from tante_tpu.parallel import shard_params
            from tante_tpu.parallel.mesh import input_sharding

            sp_capable = (
                getattr(self.model, "sp_mesh", None) is not None or self.sp_shardmap
            )
            self.batch_sharding = input_sharding(mesh, spatial=sp_capable)
            if hasattr(datamodule, "sharding"):
                datamodule.sharding = self.batch_sharding
            self.params = shard_params(
                self.params, mesh, enable_tp="tp" in mesh.axis_names
            )
        else:
            self.batch_sharding = None

        # ---- optimizer -------------------------------------------------
        # self.params is the full variables dict ({'params', maybe
        # 'batch_stats', ...}); the optimizer only touches the trainable
        # 'params' collection.
        steps_per_epoch = max(1, len(datamodule.train_dataloader()))
        if lr_scheduler is not None:
            schedule = lr_scheduler.as_step_schedule(steps_per_epoch)
        else:
            schedule = optimizer.lr
        self.lr_schedule = schedule
        self.steps_per_epoch = steps_per_epoch
        self.tx = optimizer.make(learning_rate=schedule, grad_clip=grad_clip)
        self.opt_state = self.tx.init(self.params["params"])
        self.global_step = 0

        self.ckpt = CheckpointManager(checkpoint_folder)
        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _model_chunk(self) -> int:
        """Frames emitted per model call (static)."""
        return int(getattr(self.model, "output_length", 1) or 1)

    def _apply(self, params, x, deterministic, rngs=None):
        kwargs = {"deterministic": deterministic}
        return self.model.apply(params, x, rngs=rngs, **kwargs)

    # ---- spatial sharding (sp_axis models): whole-forward shard_map ------
    def _sp_specs(self):
        from jax.sharding import PartitionSpec as P

        dp = "dp" if "dp" in self._mesh_axes else None
        return P(), P(dp, None, "sp")

    def _sp_apply_stateful(self, p, w, st, dropout_key):
        """Training apply under shard_map: (params, window, state, key) ->
        (y, new_state).  BatchNorm stats sync over all mesh axes inside the
        model (stat_axes), so the updated state is replicated (out_spec
        P()) and numerically equals the unsharded global-batch stats."""
        from jax import shard_map

        pspec, xspec = self._sp_specs()

        def local(p_, w_, st_, key_):
            out, new_st = self.model.apply(
                {"params": p_, **st_},
                w_,
                deterministic=False,
                rngs={"dropout": key_},
                mutable=list(st_.keys()),
            )
            return out, dict(new_st)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(pspec, xspec, pspec, pspec),
            out_specs=(xspec, pspec),
        )(p, w, st, dropout_key)

    def _sp_apply_eval(self, params, w):
        from jax import shard_map

        pspec, xspec = self._sp_specs()

        def local(p_, w_):
            return self.model.apply(p_, w_, deterministic=True)

        return shard_map(
            local, mesh=self.mesh, in_specs=(pspec, xspec), out_specs=xspec
        )(params, w)

    def _build_train_step(self):
        chunk = self._model_chunk()
        n_steps = self.n_steps_output
        loss_metric = self.train_loss_fn

        if self.cvit:

            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(variables, opt_state, x, y_pts, coords, dropout_key):
                params = variables["params"]
                state = {k: v for k, v in variables.items() if k != "params"}

                def loss_fn(p):
                    y_pred = self.model.apply(
                        {"params": p, **state},
                        x,
                        coords,
                        deterministic=False,
                        rngs={"dropout": dropout_key},
                    )
                    # Clear config-mismatch error (the in-loop shape assert
                    # of the non-CViT path, reference trainer/trainer.py:188):
                    # model.out_steps must equal trainer.n_steps_output, else
                    # the metric raises an opaque broadcast error.
                    assert y_pred.shape == y_pts.shape, (
                        f"CViT prediction {y_pred.shape} != sampled reference "
                        f"{y_pts.shape}; set model.out_steps == "
                        f"trainer.n_steps_output"
                    )
                    return jnp.mean(loss_metric(y_pred, y_pts, None))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return {"params": params, **state}, opt_state, loss

            return train_step

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(variables, opt_state, x, y, dropout_key):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                if state:
                    # Mutable model state (BatchNorm running stats): threaded
                    # through the scan carry, EMA-updated per model call just
                    # like sequential torch forwards.
                    if self.sp_shardmap:

                        def apply_fn(w, st):
                            return self._sp_apply_stateful(p, w, st, dropout_key)

                    else:

                        def apply_fn(w, st):
                            out, new_st = self.model.apply(
                                {"params": p, **st},
                                w,
                                deterministic=False,
                                rngs={"dropout": dropout_key},
                                mutable=list(st.keys()),
                            )
                            return out, dict(new_st)

                    y_pred, new_state = rollout_fixed_stateful(
                        apply_fn, x, n_steps, chunk, state
                    )
                else:
                    y_pred = rollout_fixed(
                        lambda w: self._apply(
                            {"params": p},
                            w,
                            deterministic=False,
                            rngs={"dropout": dropout_key},
                        ),
                        x,
                        n_steps,
                        chunk,
                    )
                    new_state = state
                loss = jnp.mean(loss_metric(y_pred.astype(y.dtype), y, None))
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return {"params": params, **new_state}, opt_state, loss

        return train_step

    def _build_eval_step(self):
        chunk = self._model_chunk()
        n_steps = self.n_steps_rollout
        loss_metric = self.eval_loss_fn

        if self.cvit:

            @jax.jit
            def eval_step(params, x, y):
                from tante_tpu.train.evaler import cvit_full_grid_rollout

                y_pred = cvit_full_grid_rollout(
                    self.model, params, x, y.shape, n_steps, self.num_query_points
                )
                return jnp.mean(loss_metric(y_pred.astype(y.dtype), y, None))

            return eval_step

        @jax.jit
        def eval_step(params, x, y):
            if self.sp_shardmap:
                apply_fn = lambda w: self._sp_apply_eval(params, w)
            else:
                apply_fn = lambda w: self._apply(params, w, deterministic=True)
            y_pred = rollout_fixed(apply_fn, x, n_steps, chunk)
            return jnp.mean(loss_metric(y_pred.astype(y.dtype), y, None))

        return eval_step

    # ------------------------------------------------------------------
    def save_model(self, epoch: int, validation_loss: float, name: str) -> None:
        self.ckpt.save(
            name,
            self.params,
            self.opt_state,
            epoch,
            validation_loss,
            self.best_val_loss,
        )

    def load_checkpoint(self, checkpoint_path: str) -> None:
        logger.info("Loading checkpoint from %s", checkpoint_path)
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": np.asarray(0, np.int64),
                "validation_loss": np.asarray(0.0, np.float64),
                "best_validation_loss": np.asarray(0.0, np.float64),
            },
        }
        restored = self.ckpt.restore(checkpoint_path, template)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.best_val_loss = restored["best_validation_loss"]
        self.starting_val_loss = (
            restored["validation_loss"]
            if restored["validation_loss"] is not None
            else float("inf")
        )
        self.starting_epoch = restored["epoch"] + 1
        # LR schedule is a pure function of the step; fast-forward the count.
        self.global_step = (self.starting_epoch - 1) * self.steps_per_epoch

    # ------------------------------------------------------------------
    def _next_dropout_key(self):
        self.dropout_key, sub = jax.random.split(self.dropout_key)
        return sub

    def train_one_epoch(self, epoch: int, dataloader) -> tuple:
        epoch_loss = 0.0
        n_batches = max(1, len(dataloader))
        batch_frames = 0
        start = time.time()
        for batch in dataloader:
            batch_frames = batch["input"].shape[0] * self.n_steps_output
            (x,), y = self.formatter.process_input(batch)
            if self.cvit:
                h, w = y.shape[2], y.shape[3]
                coords, h_idx, w_idx = sample_query_coords(
                    self.rng, h, w, self.num_query_points
                )
                y_pts = y[:, :, h_idx, w_idx, :]
                self.params, self.opt_state, loss = self._train_step(
                    self.params,
                    self.opt_state,
                    x,
                    y_pts,
                    jnp.asarray(coords),
                    self._next_dropout_key(),
                )
            else:
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, x, y, self._next_dropout_key()
                )
            self.global_step += 1
            epoch_loss += float(loss) / n_batches
        elapsed = time.time() - start
        n_chips = max(1, len(getattr(jax, "devices")()))
        logs = {
            "time_per_train_iter": elapsed / n_batches,
            "train_loss": epoch_loss,
            # North-star throughput: optimizer steps and emitted frames per
            # second per chip (SURVEY.md section 5, observability).
            "steps_per_sec_per_chip": n_batches / elapsed / n_chips,
            "frames_per_sec_per_chip": n_batches
            * batch_frames
            / elapsed
            / n_chips,
            "lr": float(self.lr_schedule(self.global_step))
            if callable(self.lr_schedule)
            else self.lr_schedule,
        }
        return epoch_loss, logs

    def validation_loop(self, dataloader, epoch: int = 0) -> float:
        total = 0.0
        n_batches = max(1, len(dataloader))
        for batch in dataloader:
            (x,), y = self.formatter.process_input(batch)
            total += float(self._eval_step(self.params, x, y))
        val_loss = total / n_batches
        self.metric_logger.append_scalar_file("saved_loss.txt", val_loss)
        return val_loss

    def train(self) -> None:
        train_loader = self.datamodule.train_dataloader()
        val_loader = self.datamodule.val_dataloader()
        val_loss = self.starting_val_loss

        for epoch in range(self.starting_epoch, self.max_epoch + 1):
            train_loader.set_epoch(epoch)
            logger.info("Epoch %d/%d: starting training", epoch, self.max_epoch)
            train_loss, train_logs = self.train_one_epoch(epoch, train_loader)
            logger.info("Epoch %d/%d: avg training loss %s", epoch, self.max_epoch, train_loss)
            self.metric_logger.log(train_logs, step=epoch)
            self.save_model(epoch, val_loss, "recent")

            logger.info("Epoch %d/%d: starting validation", epoch, self.max_epoch)
            val_loss = self.validation_loop(val_loader, epoch=epoch)
            logger.info("Epoch %d/%d: avg validation loss %s", epoch, self.max_epoch, val_loss)
            self.metric_logger.log({"valid": val_loss}, step=epoch)
            if self.best_val_loss is None or val_loss < self.best_val_loss:
                self.best_val_loss = val_loss
                self.save_model(epoch, val_loss, "best")
