"""Fixed-step Evaler (reference ``trainer/evaler.py:78-230`` capabilities).

Computes the 4-metric report (MSE, L2RE, NNMSE, VRMSE in config order) with
per-batch means, across-batch variances, and mean rollout wall-clock time.
The reference wires its reported list as [fn1, fn3, fn2, fn4]
(``trainer/evaler.py:204-211``); we report each metric under its own name so
nothing is crossed, and keep the same metric set.

CViT path: the full H*W query grid is evaluated in ``num_query_points``-
sized chunks and scattered back into the output canvas (reference
``trainer/evaler.py:37-76,140-165``) — implemented as a scan over static
chunks inside jit.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.data.datamodule import AbstractDataModule, get_formatter
from tante_tpu.train.rollout import rollout_fixed
from tante_tpu.utils.checkpoint import CheckpointManager
from tante_tpu.utils.logging import MetricLogger

logger = logging.getLogger(__name__)


def full_grid_coords(h: int, w: int) -> np.ndarray:
    """All (H*W, 2) normalized grid coordinates, row-major."""
    hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack(
        [hh.flatten() / (h - 1), ww.flatten() / (w - 1)], axis=-1
    ).astype(np.float32)


def cvit_full_grid_rollout(model, params, x, y_shape, n_steps, num_query_points):
    """Autoregressive CViT rollout reconstructing the full field per call."""
    b, _, h, w, c = y_shape
    coords = full_grid_coords(h, w)
    n = coords.shape[0]
    # Pad to a multiple of the chunk size; extra points are discarded.
    pad = (-n) % num_query_points
    coords_p = np.concatenate([coords, coords[: pad or 0]], axis=0) if pad else coords
    chunks = jnp.asarray(coords_p.reshape(-1, num_query_points, 2))

    def call_model(window):
        def chunk_body(_, coord_chunk):
            y = model.apply(params, window, coord_chunk, deterministic=True)
            return _, y  # (B, T', M, C)

        _, ys = jax.lax.scan(chunk_body, None, chunks)
        ys = jnp.moveaxis(ys, 0, 2)  # (B, T', n_chunks, M, C)
        flat = ys.reshape(b, ys.shape[1], -1, c)[:, :, :n]
        return flat.reshape(b, ys.shape[1], h, w, c)

    t_in = x.shape[1]

    def body(win, _):
        y = call_model(win)
        new_win = jnp.concatenate([win, y], axis=1)[:, -t_in:]
        return new_win, y

    import math

    out_steps = int(getattr(model, "output_length", 1) or 1)
    n_calls = math.ceil(n_steps / out_steps)
    _, ys = jax.lax.scan(body, x, None, length=n_calls)
    y_pred = jnp.moveaxis(ys, 0, 1).reshape(b, -1, h, w, c)
    return y_pred[:, :n_steps]


class Evaler:
    def __init__(
        self,
        checkpoint_folder: str,
        formatter: str,
        model: Any,
        datamodule: AbstractDataModule,
        eval_loss_fn1: Callable,
        eval_loss_fn2: Callable,
        eval_loss_fn3: Callable,
        eval_loss_fn4: Callable,
        enable_amp: bool = False,
        amp_type: str = "bfloat16",
        checkpoint_path: str = "",
        n_steps_rollout: int = 8,
        batch_size: int = 4,
        cvit: bool = False,
        num_query_points: int = 1024,
        metric_logger: Optional[MetricLogger] = None,
        **_unused: Any,
    ):
        self.checkpoint_folder = checkpoint_folder
        self.datamodule = datamodule
        self.loss_fns = [eval_loss_fn1, eval_loss_fn2, eval_loss_fn3, eval_loss_fn4]
        self.loss_names = ["MSE", "L2RE", "NNMSE", "VRMSE"]
        self.n_steps_rollout = n_steps_rollout
        self.batch_size = batch_size
        self.cvit = cvit
        self.num_query_points = num_query_points
        self.dset_metadata = datamodule.train_dataset.metadata
        self.formatter = get_formatter(formatter, self.dset_metadata)
        self.metric_logger = metric_logger or MetricLogger(checkpoint_folder)

        self.model = model.clone(dtype=jnp.bfloat16) if enable_amp else model

        md = self.dset_metadata
        t_in = datamodule.train_dataset.n_steps_input
        dummy = jnp.zeros((1, t_in, *md.spatial_resolution, md.n_fields), jnp.float32)
        if self.cvit:
            dummy_coords = jnp.zeros((4, 2), jnp.float32)
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy, dummy_coords)
        else:
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)

        self.ckpt = CheckpointManager(checkpoint_folder)
        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)

        self._rollout = self._build_rollout()

    def load_checkpoint(self, checkpoint_path: str) -> None:
        """Model weights only (reference ``trainer/evaler.py:113-118``);
        tree/shape-validated against the model so a stale checkpoint fails
        with a clear message (utils/checkpoint.py:_validate_tree)."""
        logger.info("Loading checkpoint from %s", checkpoint_path)
        restored = self.ckpt.restore_params(checkpoint_path, self.params)
        self.params = jax.tree.map(
            lambda t, r: jnp.asarray(r, dtype=t.dtype), self.params, restored
        )

    def _build_rollout(self):
        chunk = int(getattr(self.model, "output_length", 1) or 1)
        n_steps = self.n_steps_rollout

        if self.cvit:

            @jax.jit
            def do_rollout(params, x, y):
                return cvit_full_grid_rollout(
                    self.model, params, x, y.shape, n_steps, self.num_query_points
                )

            return do_rollout

        # Fast path: fixed-step TANTE rollouts cache frame latents (each
        # frame encoded once; equivalence-tested in tests/test_rollout.py).
        from tante_tpu.models.tante import TANTE as _TANTE

        if isinstance(self.model, _TANTE) and self.model.deg:
            from tante_tpu.train.rollout import rollout_tante_latent

            @jax.jit
            def do_rollout(params, x, y):
                return rollout_tante_latent(self.model, params, x, n_steps)

            return do_rollout

        @jax.jit
        def do_rollout(params, x, y):
            return rollout_fixed(
                lambda w: self.model.apply(params, w, deterministic=True),
                x,
                n_steps,
                chunk,
            )

        return do_rollout

    def Eval(self, mode: str = "common"):
        test_loader = self.datamodule.test_dataloader()
        if mode == "common":
            test_loss, std, time_used = self.validation_loop(test_loader)
            logger.info("Test Loss: %s", test_loss)
            logger.info("std: %s", std)
            logger.info("Time used: %s", time_used)
            report = {
                "metrics": dict(zip(self.loss_names, test_loss)),
                "variance": dict(zip(self.loss_names, std)),
                "mean_rollout_time_s": time_used,
            }
            self.metric_logger.log(report)
            return report

    def validation_loop(self, dataloader):
        seq_losses = [[] for _ in self.loss_fns]
        times = []
        n_batches = max(1, len(dataloader))
        for batch in dataloader:
            (x,), y = self.formatter.process_input(batch)
            t0 = time.perf_counter()
            y_pred = self._rollout(self.params, x, y)
            y_pred.block_until_ready()
            times.append(time.perf_counter() - t0)
            y_pred = y_pred.astype(y.dtype)
            assert y_pred.shape == y.shape, (
                f"Mismatching shapes between reference {y.shape} and prediction {y_pred.shape}"
            )
            for i, fn in enumerate(self.loss_fns):
                seq_losses[i].append(float(jnp.mean(fn(y_pred, y, None))))
        means = [sum(s) / n_batches for s in seq_losses]
        variances = [float(np.var(s, ddof=1)) if len(s) > 1 else 0.0 for s in seq_losses]
        return means, variances, sum(times) / max(1, len(times))
