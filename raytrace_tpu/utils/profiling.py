"""Profiling harness: wall-clock + ray-steps/sec accounting.

The reference imports BenchmarkTools in four files but never calls it
(SURVEY.md section 5.1); its only cost visibility is a step-size plot.
Here: a timing context that blocks on device results and computes the
BASELINE.json metric (ray-steps/sec/chip), plus jax.profiler trace hooks.
"""

import contextlib
import time

import jax
import numpy as np


class Timing:
    def __init__(self):
        self.wall_s = None


@contextlib.contextmanager
def timed(result_holder: Timing):
    """Times a block, blocking on every jax array assigned to .value."""
    t0 = time.perf_counter()
    yield result_holder
    if getattr(result_holder, "value", None) is not None:
        jax.block_until_ready(result_holder.value)
    result_holder.wall_s = time.perf_counter() - t0


def ray_steps_per_sec(result, wall_s, valid=None, n_devices=1):
    """The headline metric: attempted steps of valid rays / wall / chips."""
    acc = np.asarray(result.n_accept)
    rej = np.asarray(result.n_reject)
    if valid is not None:
        acc, rej = acc[np.asarray(valid)], rej[np.asarray(valid)]
    return float((acc.sum() + rej.sum()) / wall_s / n_devices)


@contextlib.contextmanager
def device_trace(path):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
