"""Batch-inference serving API.

The reference has no serving surface (eval only); this wraps a trained
experiment into a jit-compiled predictor for production rollouts:

    from tante_tpu.serve import Predictor
    p = Predictor.from_experiment("tante", experiment="TANTE_AM",
                                  root_path=".", choose="best")
    frames = p.rollout(history, n_steps=16)         # (B, 16, H, W, C)
    frames, rt, calls = p.rollout_adaptive(history, 16)   # adaptive models

Design: one compile per (batch shape, n_steps); TANTE fixed-step rollouts
use the latent-caching path (each frame encoded once); adaptive models use
the while-loop rollout so large r_t genuinely skips model calls.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tante_tpu.config import instantiate, load_config, set_ckpt


class Predictor:
    def __init__(self, model: Any, params: Any, metadata: Any = None):
        self.model = model
        self.params = params
        self.metadata = metadata
        self._fixed_cache: Dict[Tuple, Any] = {}
        self._adaptive_cache: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------
    @classmethod
    def from_experiment(
        cls,
        config_name: str,
        experiment: Optional[str] = None,
        root_path: Optional[str] = None,
        choose: str = "best",
        overrides: Optional[List[str]] = None,
        config_dir: Optional[str] = None,
    ) -> "Predictor":
        """Build from a config + trained experiment folder."""
        cfg = load_config(config_name, config_dir=config_dir, overrides=overrides or [])
        if experiment is not None:
            cfg.experiment = experiment
        if root_path is not None:
            cfg.root_path = root_path
        cfg, _ = set_ckpt(cfg, choose=choose)
        ckpt_path = cfg.evaler.checkpoint_path
        if not ckpt_path:
            raise FileNotFoundError(
                f"no '{choose}' checkpoint under {cfg.root_path}/experiments/{cfg.experiment}"
            )

        datamodule = instantiate(cfg.data, seed=cfg.seed)
        md = datamodule.train_dataset.metadata
        model = instantiate(cfg.model, dset_metadata=md)

        t_in = datamodule.train_dataset.n_steps_input
        dummy = jnp.zeros((1, t_in, *md.spatial_resolution, md.n_fields), jnp.float32)
        if getattr(model, "deg", True):
            params = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)
        else:
            params = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy, 1.5)

        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(ckpt_path, None)
        params = jax.tree.map(
            lambda t, r: jnp.asarray(r, dtype=t.dtype), params, restored["params"]
        )
        return cls(model, params, metadata=md)

    # ------------------------------------------------------------------
    def _fixed_fn(self, n_steps: int):
        key = ("fixed", n_steps)
        if key not in self._fixed_cache:
            from tante_tpu.models.tante import TANTE
            from tante_tpu.train.rollout import rollout_fixed, rollout_tante_latent

            if isinstance(self.model, TANTE) and self.model.deg:

                @jax.jit
                def fn(params, x):
                    return rollout_tante_latent(self.model, params, x, n_steps)

            else:
                chunk = int(getattr(self.model, "output_length", 1) or 1)

                @jax.jit
                def fn(params, x):
                    return rollout_fixed(
                        lambda w: self.model.apply(params, w), x, n_steps, chunk
                    )

            self._fixed_cache[key] = fn
        return self._fixed_cache[key]

    def _adaptive_fn(self, n_steps: int):
        if n_steps not in self._adaptive_cache:
            from tante_tpu.train.rollout import rollout_adaptive_eval_tante

            @jax.jit
            def fn(params, x):
                # Morton fast path when available; generic engine otherwise
                # (same emission semantics either way).
                return rollout_adaptive_eval_tante(
                    self.model, params, x, n_steps
                )

            self._adaptive_cache[n_steps] = fn
        return self._adaptive_cache[n_steps]

    # ------------------------------------------------------------------
    def rollout(self, history, n_steps: int) -> np.ndarray:
        """history: (B, T, H, W, C) -> predicted frames (B, n_steps, H, W, C)."""
        x = jnp.asarray(history, jnp.float32)
        if getattr(self.model, "deg", True):
            y = self._fixed_fn(n_steps)(self.params, x)
        else:
            y, _, _ = self._adaptive_fn(n_steps)(self.params, x)
        return np.asarray(y)

    def rollout_adaptive(self, history, n_steps: int):
        """Adaptive rollout with diagnostics: (frames, rt_per_call, n_calls)."""
        if getattr(self.model, "deg", True):
            raise ValueError("model is fixed-step (deg=True); use rollout()")
        x = jnp.asarray(history, jnp.float32)
        y, rt_log, n_calls = self._adaptive_fn(n_steps)(self.params, x)
        rt = np.asarray(rt_log)
        return np.asarray(y), rt[~np.isnan(rt)], int(n_calls)
