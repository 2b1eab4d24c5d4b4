"""Lightweight tracing and timing helpers.

The reference has no observability beyond prints (SURVEY §5); these wrap
jax.profiler for device traces and provide a wall-clock timer that forces
completion (block_until_ready is unreliable on some experimental
platforms, so timers read a scalar back).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "Timer", "force_completion"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_completion(tree) -> float:
    """Force execution of a pytree of arrays; returns a scalar touchpoint.

    Reads one element back to host — unlike block_until_ready this is
    reliable on every platform.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    acc = 0.0
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            acc += float(np.asarray(jnp.ravel(leaf)[0]))
    return acc


class Timer:
    """Accumulating section timer with forced device completion."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            force_completion(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force_completion(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = ["%-30s %10s %8s" % ("section", "total_s", "calls")]
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            lines.append("%-30s %10.4f %8d" % (k, self.totals[k], self.counts[k]))
        return "\n".join(lines)
