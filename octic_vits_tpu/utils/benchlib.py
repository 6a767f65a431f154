"""On-device throughput measurement.

Through the axon relay every Python dispatch costs O(100ms), so repeated
`f(x)` calls measure the relay, not the TPU. `measure_steps` times a SINGLE
dispatch that runs K forward passes inside `lax.fori_loop` with a real data
dependence between iterations (an epsilon feedback term XLA cannot fold or
CSE away), then differences two K values to cancel the dispatch+fetch
constant:

    step_time = (t(K2) - t(K1)) / (K2 - K1)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_looped_runner(apply_fn: Callable, k: int):
    """apply_fn(params, images) -> array. Returns jitted (params, images) ->
    scalar running apply k times sequentially on-device."""

    @jax.jit
    def run(params, images):
        def body(_, carry):
            x = images + (carry * jnp.asarray(1e-30, images.dtype))
            out = apply_fn(params, x)
            return jnp.max(out).astype(images.dtype)

        return jax.lax.fori_loop(0, k, body, jnp.zeros((), images.dtype))

    return run


def _timed(run, params, images) -> float:
    t0 = time.perf_counter()
    out = run(params, images)
    # scalar output: device_get is the only reliable queue drain here
    float(np.asarray(jax.device_get(out)))
    return time.perf_counter() - t0


def measure_steps(
    apply_fn: Callable, params, images, k1: int = 2, k2: int = 12,
    repeats: int = 3,
) -> float:
    """Seconds per forward pass (dispatch/fetch overhead cancelled)."""
    run1 = make_looped_runner(apply_fn, k1)
    run2 = make_looped_runner(apply_fn, k2)
    _timed(run1, params, images)  # compile
    _timed(run2, params, images)  # compile
    t1 = min(_timed(run1, params, images) for _ in range(repeats))
    t2 = min(_timed(run2, params, images) for _ in range(repeats))
    return max((t2 - t1) / (k2 - k1), 1e-9)
