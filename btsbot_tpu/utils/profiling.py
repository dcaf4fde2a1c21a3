"""Profiling / timing harness.

The reference's only instrumentation is wall-clock per-batch stdout lines
(`/root/reference/btsbot/train.py:63-72`).  Here:

* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (kernel timeline, HBM usage);
* ``time_device_fn`` — an HONEST device timer: chains ``iters`` dependent
  invocations inside one jitted ``lax.scan`` (the per-step carry perturbs
  the inputs so XLA cannot hoist the body) and fences with a host readback.
  Required because per-dispatch ``block_until_ready`` through a remote-TPU
  relay acknowledges without real synchronization (see bench.py);
* ``annotate`` — named profiler regions (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/btsbot_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def time_device_fn(fn: Callable, args: tuple, iters: int = 50,
                   reps: int = 3) -> float:
    """Mean seconds per invocation of ``fn(*args)`` measured on device.

    ``fn`` must return an array (or pytree); its first argument tree is
    perturbed by a vanishing carry each iteration to defeat CSE/hoisting.

    This is the general-purpose form of the methodology; bench.py and the
    scripts/ sweeps inline specialized variants (their carries must
    perturb specific inputs — e.g. the images but not the params, or the
    train-step PRNG path) rather than call this helper.  Any fix to the
    methodology (carry semantics, fencing) must be mirrored there.
    """

    @jax.jit
    def chained(*args):
        def body(carry, _):
            perturbed = jax.tree_util.tree_map(
                lambda x: x + carry.astype(x.dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
                else x,
                args[0])
            out = fn(perturbed, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (jnp.mean(leaf).astype(jnp.float32) * 1e-20), \
                jnp.mean(leaf)
        _, means = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return jnp.mean(means)

    float(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters
