"""Time-adaptive evaluator (reference ``trainer/r_evaler.py:46-177``).

Batch-level adaptive rollout with ``out_T = n_steps_rollout`` so the model
genuinely emits floor(r_t) frames per call (``r_evaler.py:95``); reports the
4 metrics plus mean r_t, mean model calls per rollout ("Step"), mean rollout
wall-clock, and five-number summaries of per-batch loss and r_t
(``r_evaler.py:160-177``).
"""

from __future__ import annotations

import logging
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.train.evaler import Evaler
from tante_tpu.train.rollout import rollout_adaptive_eval_tante

logger = logging.getLogger(__name__)


def five_number_summary(data):
    arr = np.asarray(data, dtype=np.float64)
    return {
        "min": float(np.min(arr)),
        "q1": float(np.percentile(arr, 25)),
        "median": float(np.median(arr)),
        "q3": float(np.percentile(arr, 75)),
        "max": float(np.max(arr)),
    }


class R_Evaler(Evaler):
    def __init__(
        self,
        *args: Any,
        rt_eps: float = 0.5,
        rt_n: int = 2,
        out_T_max: int = 0,
        **kwargs: Any,
    ):
        self.rt_eps = rt_eps
        self.rt_n = rt_n
        # Per-call Taylor frame cap (0 = n_steps_rollout, exact reference
        # semantics).  A cap K < n_steps cuts the decoded-frames-per-call
        # waste and is exact whenever realized floor(r_t) <= K (see
        # rollout.py:rollout_adaptive_eval).
        self.out_T_max = out_T_max
        super().__init__(*args, **kwargs)

    def _build_rollout(self):
        n_steps = self.n_steps_rollout
        k = min(self.out_T_max, n_steps) if self.out_T_max else n_steps

        @jax.jit
        def do_rollout(params, x, y):
            # Morton fast path when the model supports it (same emission
            # semantics; falls back to the generic engine internally).
            y_pred, rt_log, n_calls = rollout_adaptive_eval_tante(
                self.model, params, x, n_steps, max_frames_per_call=k
            )
            return y_pred, rt_log, n_calls

        return do_rollout

    def Eval(self, mode: str = "common"):
        test_loader = self.datamodule.test_dataloader()
        if mode == "common":
            (
                test_loss,
                std,
                rt_mean,
                step_mean,
                time_used,
                summary_error,
                summary_rt,
            ) = self.validation_loop(test_loader)
            logger.info("Test Loss: %s", test_loss)
            logger.info("std: %s", std)
            logger.info("rt: %s, Step: %s, Time used: %s", rt_mean, step_mean, time_used)
            logger.info("error: %s, rt: %s", summary_error, summary_rt)
            report = {
                "metrics": dict(zip(self.loss_names, test_loss)),
                "variance": dict(zip(self.loss_names, std)),
                "rt_mean": rt_mean,
                "model_calls_per_rollout": step_mean,
                "mean_rollout_time_s": time_used,
                "error_summary": summary_error,
                "rt_summary": summary_rt,
            }
            self.metric_logger.log(report)
            return report

    def validation_loop(self, dataloader):
        seq_losses = [[] for _ in self.loss_fns]
        times, rt_list, step_list = [], [], []
        n_batches = max(1, len(dataloader))
        for batch in dataloader:
            (x,), y = self.formatter.process_input(batch)
            t0 = time.perf_counter()
            y_pred, rt_log, n_calls = self._rollout(self.params, x, y)
            y_pred.block_until_ready()
            times.append(time.perf_counter() - t0)
            y_pred = y_pred.astype(y.dtype)
            assert y_pred.shape == y.shape, (
                f"Mismatching shapes between reference {y.shape} and prediction {y_pred.shape}"
            )
            for i, fn in enumerate(self.loss_fns):
                seq_losses[i].append(float(jnp.mean(fn(y_pred, y, None))))
            rt_np = np.asarray(rt_log)
            rt_list.append(float(np.nanmean(rt_np)))
            step_list.append(int(n_calls))
        means = [sum(s) / n_batches for s in seq_losses]
        variances = [float(np.var(s, ddof=1)) if len(s) > 1 else 0.0 for s in seq_losses]
        return (
            means,
            variances,
            sum(rt_list) / max(1, len(rt_list)),
            sum(step_list) / max(1, len(step_list)),
            sum(times) / max(1, len(times)),
            five_number_summary(seq_losses[1]),
            five_number_summary(rt_list),
        )
