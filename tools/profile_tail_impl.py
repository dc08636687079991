"""END-TO-END A/B of the planar tail implementations: the full jitted
vv009 step with impl="einsum" vs impl="pallas" (ops/ifft_pallas.py).

profile_ifft4.py isolates the tail but feeds it raw arrays in the OLD
untransposed formulation, so its numbers do not reflect the shipped
in-context tail (where the frame builder's gather emits the transposed
layout directly and XLA fuses across the stage boundary).  This tool
measures the only number that matters: whole-step wall time.

Usage: python tools/profile_tail_impl.py [batch] [iters] [config] [reps]
"""
import functools
import statistics
import sys
import time

from _common import fence

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.pipeline import transmit_step_iq_planar
from dvbt2ll_tpu.plan import build_plan


def _reps(f, args, reps, iters):
    out = f(*args)
    fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return times


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    config = sys.argv[3] if len(sys.argv) > 3 else "vv009_4kshort"
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    cfg = _named_config(config)
    plan = build_plan(cfg, batch, strict=False)
    for pp in plan.plps:
        pp.use_pallas = True  # LDPC kernel on in both arms
    ts = synthetic_ts(plan.ts_bytes_in, seed=3)
    w = jnp.asarray(np.concatenate([np.zeros(187, np.uint8), ts]))
    fi = jnp.int32(0)

    outs = {}
    res = {}
    impls = (sys.argv[5].split(",") if len(sys.argv) > 5
             else ("einsum", "pallas"))
    for impl in impls:
        f = jax.jit(functools.partial(transmit_step_iq_planar, plan,
                                      impl=impl))
        times = _reps(f, (w, fi), reps, iters)
        outs[impl] = np.asarray(f(w, fi))
        med = statistics.median(times)
        rate = batch * cfg.samples_per_frame / med
        res[impl] = (med, min(times), max(times), rate)
        print(f"{impl:8s} median {med*1e3:7.3f} ms  min {min(times)*1e3:7.3f}"
              f"  max {max(times)*1e3:7.3f}  -> {rate/1e6:7.1f} Msamp/s",
              flush=True)

    base = impls[0]
    for other in impls[1:]:
        err = np.max(np.abs(outs[base] - outs[other]))
        scale = np.max(np.abs(outs[base]))
        print(f"{base} vs {other}: max|d| {err:.3e} of {scale:.3e} "
              f"({'OK' if err <= 1e-4 * scale else 'MISMATCH'})")
        a, b = res[base], res[other]
        sep = "SEPARABLE" if (a[2] < b[1] or b[2] < a[1]) else "OVERLAP"
        print(f"{base}/{other} step ratio = {b[0]/a[0]:.3f}x  ({sep})")


if __name__ == "__main__":
    main()
