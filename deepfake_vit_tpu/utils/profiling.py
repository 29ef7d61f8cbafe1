"""Profiling / tracing hooks (SURVEY.md §5 auxiliary subsystem).

The reference's observability is wall-clock prints + tqdm
(``trainer.py:240-287``); here profiling is first-class:

- ``trace(logdir)``: context manager around ``jax.profiler`` traces viewable
  in TensorBoard/Perfetto.
- ``StepTimer``: per-step wall-clock statistics with true device sync on
  request (on the axon tunnel, ``block_until_ready`` does NOT synchronize —
  only a device→host transfer does; ``device_sync`` encapsulates that).
- ``annotate``: named trace region for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax


def device_sync(tree: Any) -> None:
    """True device synchronization: pull one scalar per array leaf.

    ``jax.block_until_ready`` is a no-op on the tunnelled TPU platform used
    here; transferring a scalar derived from each leaf is the only reliable
    barrier (and is what bench.py uses for timing).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    jax.device_get([leaf.ravel()[0] for leaf in leaves if hasattr(leaf, "ravel")])


@contextlib.contextmanager
def trace(logdir: str = "runs/profile", create_perfetto_link: bool = False):
    """jax.profiler trace context (open in TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


class StepTimer:
    """Rolling per-step timing: mean/p50/p90, steps/s, samples/s."""

    def __init__(self, window: int = 200):
        self.window = window
        self._durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on: Any = None) -> float:
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        return dt

    @contextlib.contextmanager
    def step(self, sync_on: Any = None):
        self.start()
        yield
        self.stop(sync_on)

    def stats(self, batch_size: Optional[int] = None) -> Dict[str, float]:
        if not self._durations:
            return {}
        xs = sorted(self._durations)
        n = len(xs)
        mean = sum(xs) / n
        stats = {
            "steps_timed": n,
            "step_ms_mean": mean * 1e3,
            "step_ms_p50": xs[n // 2] * 1e3,
            "step_ms_p90": xs[min(int(n * 0.9), n - 1)] * 1e3,
            "steps_per_sec": 1.0 / mean if mean > 0 else float("inf"),
        }
        if batch_size:
            stats["samples_per_sec"] = batch_size / mean
        return stats
