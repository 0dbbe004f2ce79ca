"""Persistent XLA compilation cache for the CLI entry points.

The flagship variable-frame train step is a large program (16-slot scan,
per-slot lax.cond over a rematerialized TANTE forward + backward) whose
first compile costs tens of minutes on a 1-CPU host.  The reference has
no analog (eager PyTorch never compiles); on TPU the compile is the
dominant restart cost, so both CLIs persist compiled executables across
process restarts — crash-resume then pays only the checkpoint restore,
not the compile.

Cache location: ``$TANTE_JAX_CACHE`` if set, else ``~/.cache/tante_jax``.
Entries are keyed by (HLO, backend, jax version, compile options), so CPU
test programs and TPU executables coexist in one directory.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("tante_tpu.compile_cache")


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Must run before the first compilation (call it at CLI startup).
    Returns the cache directory, or None when the running jax has no
    persistent-cache support.
    """
    import jax

    cache_dir = (
        path
        or os.environ.get("TANTE_JAX_CACHE")
        or os.path.join(os.path.expanduser("~"), ".cache", "tante_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took a noticeable compile; size floor off so
        # small-but-slow programs (scan bodies) are kept too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - older jax
        logger.info("persistent compile cache unavailable: %s", e)
        return None
    return cache_dir
