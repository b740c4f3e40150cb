"""Profiling / tracing utilities (SURVEY §5 tracing row).

The reference has only wall-clock meters (train_mmwhs_noPad.py:155-218) and a
dead --throughput flag. TPU-native equivalents:
  - `trace(logdir)`: jax.profiler context — produces a Perfetto/TensorBoard
    trace of device execution.
  - `Throughput`: steps/sec + volumes/sec meter with block_until_ready-correct
    timing.
  - `time_fn`: compile-aware microbenchmark helper (warmup + timed reps).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def update(self, n_items: int = 1):
        self.steps += 1
        self.items += n_items

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.steps / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.items / dt if dt > 0 else 0.0


def time_fn(fn, *args, warmup: int = 1, reps: int = 10):
    """(mean_s, p50_s) of fn(*args) with device-sync timing."""
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return float(ts.mean()), float(np.percentile(ts, 50))


def enable_nan_debugging(enable: bool = True):
    """Turn on JAX's NaN checker (jax_debug_nans): any op producing NaN raises
    with the offending primitive — the deterministic-functional counterpart of
    the reference's cudnn-determinism knobs + print-only NaN check (SURVEY §5
    race-detection row). Expensive; use for debugging runs only."""
    import jax

    jax.config.update("jax_debug_nans", enable)
