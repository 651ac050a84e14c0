"""Reliable device timing through the axon relay.

`block_until_ready` does not reliably block through the remote-TPU relay, and
a host<->device roundtrip costs ~26 ms. To time a function: run it N times
inside one jitted fori_loop with a data-dependence chain, read back one
scalar, and divide out the single roundtrip.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def roundtrip_ms(n: int = 5) -> float:
    f = jax.jit(lambda x: x + 1)
    x = jnp.ones(())
    np.asarray(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def device_time_ms(fn: Callable, *args, iters: int = 10, rt_ms: float = None):
    """Median per-iteration device time of fn(*args) -> pytree.

    fn must be jax-traceable; its first output leaf is used to build the
    dependence chain (a scalar derived from it is folded into the first arg).
    """
    if rt_ms is None:
        rt_ms = roundtrip_ms()

    def chained(args):
        def body(_, a):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            eps = (leaf.ravel()[0].astype(jnp.float32) * 0.0)
            a0 = jax.tree.map(lambda x: x + eps.astype(x.dtype)
                              if jnp.issubdtype(x.dtype, jnp.floating) else x,
                              a[0])
            return (a0,) + tuple(a[1:])
        a = jax.lax.fori_loop(0, iters, body, tuple(args))
        return jax.tree.leaves(a[0])[0].ravel()[0]

    g = jax.jit(chained)
    np.asarray(g(args))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return (float(np.median(ts)) - rt_ms) / iters
