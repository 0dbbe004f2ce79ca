"""Tracing / profiling hooks (SURVEY.md section 5: the reference has only
ad-hoc ``time.time()`` prints; this is the formal replacement).

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device + host activity.
- ``annotate(name)``: named trace span (shows up in the profiler timeline).
- ``block_until_ready_tree``: sync helper for honest wall-clock timing; on
  the tunneled axon backend ``block_until_ready`` alone does not wait for
  device completion, so this materializes a tiny probe reduction.
"""

from __future__ import annotations

import contextlib
from typing import Any, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span: ``with annotate("rollout"): ...``."""
    return jax.profiler.TraceAnnotation(name)


@jax.jit
def _probe(x):
    return jnp.sum(jnp.ravel(x)[:8])


def hard_sync(tree: Any) -> None:
    """Force device completion of every leaf (works on tunneled backends
    where block_until_ready is advisory)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype"):
            float(_probe(leaf.astype(jnp.float32)))
