"""Profiling: phase timers and jax.profiler traces.

The reference instruments pooling/graph-construction/layer phases with
ad-hoc ``time.time()`` counters (reference ``Modules/gMRT/Models/
HGNN_GMM.py:89-100,177-234``; dead ``profiling`` blocks in
``BipartiteClassification/Models/HGNN_GMM.py:237-296``) and logs epoch
times.  TPU equivalent: ``jax.profiler`` traces for kernel-level analysis,
plus host-side phase timers with explicit result materialization (under
the axon tunnel ``block_until_ready`` does not block -- a scalar readback
is forced instead).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


def force(x):
    """Materialize a pytree's computation (tunnel-safe barrier)."""
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype")]
    if not leaves:
        return x
    # scalar readback forces full execution even where block_until_ready
    # returns early (axon remote backend)
    total = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) if l.dtype != bool
                else jnp.sum(l) for l in leaves[:1])
    float(total)
    return x


class PhaseTimer:
    """Accumulating named phase timers (epoch-resettable).

    Mirrors the gMRT counters: cluster_time / center_time / construct_time /
    graph_init_time / layer_time and the per-epoch ``pooling_time`` /
    ``graph_construct_time`` logs (reference ``gmrt_base.py:61-73``).
    """

    def __init__(self, materialize: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.materialize = materialize

    @contextlib.contextmanager
    def phase(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if self.materialize and result_ref:
            force(result_ref[0])
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.materialize:
            force(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def reset(self) -> dict[str, float]:
        out = self.summary()
        self.totals.clear()
        self.counts.clear()
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
