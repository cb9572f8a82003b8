"""Tracing & timing utilities.

The reference has no profiling beyond ad-hoc ``time.time()`` wall-clocks
(SURVEY.md §5.1).  Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
* :func:`time_compiled` — robust latency measurement for a jitted step on
  remote/async backends: folds N dependent iterations inside one compiled
  ``fori_loop`` so host-dispatch pipelining cannot fake the number (the
  failure mode we measured on the tunneled TPU backend).
* :func:`annotate` — ``jax.named_scope`` wrapper so framework phases show
  up by name in traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.named_scope(name)


def time_compiled(step_fn: Callable, carry_init, *args, iters: int = 50,
                  repeats: int = 3) -> float:
    """Milliseconds per iteration of ``carry = step_fn(carry, *args)``.

    ``step_fn`` must be jit-compatible and keep the carry's pytree/shape
    fixed.  The loop is compiled as a single ``fori_loop`` program.
    """

    @jax.jit
    def run(carry, *a):
        return jax.lax.fori_loop(0, iters, lambda i, c: step_fn(c, *a), carry)

    carry = run(carry_init, *args)
    jax.block_until_ready(carry)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(carry, *args)
        jax.block_until_ready(carry)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3
