"""Shared helpers for the profiling/benchmark scripts in tools/."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def fence(x):
    """Force the device to drain.  Through the axon TPU tunnel
    block_until_ready returns before execution finishes; only a host value
    fetch is a reliable fence (programs execute in enqueue order).  Works
    for real and complex outputs (the abs happens inside jit)."""
    f = fence._chk
    if f is None:
        f = fence._chk = jax.jit(
            lambda v: jnp.sum(jnp.abs(jnp.ravel(v)[:16]))
            .astype(jnp.float32))
    return float(f(x))


fence._chk = None


def bench(name, fn, *args, iters=30):
    """Time a jitted callable (compile excluded), print one line."""
    f = jax.jit(fn)
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:26s} {dt*1e3:8.2f} ms   out={getattr(out, 'shape', None)}",
          flush=True)
    return out, dt
