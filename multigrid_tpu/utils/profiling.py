"""Tracing / profiling hooks.

The reference has no profiling machinery at all (SURVEY.md §5); here the
benchmark and training loops get named trace scopes (visible in TensorBoard/
Perfetto via ``jax.profiler``) and a small wall-clock phase timer that forces
device completion so numbers are honest — on remote-tunnel backends,
``block_until_ready`` alone can return before execution finishes, so the
timer checksums a leaf through a host transfer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def trace_annotation(name: str):
    """Named profiler scope (shows up in captured traces)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace for the enclosed block."""
    with jax.profiler.trace(log_dir):
        yield


def force_completion(tree) -> float:
    """Block until a pytree's computation truly finished; returns a checksum
    (a host transfer is the only reliable barrier through remote backends —
    and it must touch EVERY leaf: remote runtimes can surface individual
    output buffers before the whole program retires, so pulling one leaf
    under-measures by whole phases)."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        total += float(np.asarray(leaf).ravel()[0])
    return total


class PhaseTimer:
    """Accumulating wall-clock timer for named phases.

    >>> timer = PhaseTimer()
    >>> with timer.phase('rollout'):
    ...     out = rollout(...)
    ...     timer.sync(out)
    >>> timer.summary()  # {'rollout': {'total_s': ..., 'calls': ...}}
    """

    def __init__(self):
        self._total = defaultdict(float)
        self._calls = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._calls[name] += 1

    def sync(self, tree) -> None:
        force_completion(tree)

    def summary(self) -> dict:
        return {
            name: {'total_s': round(self._total[name], 4),
                   'calls': self._calls[name]}
            for name in self._total
        }
