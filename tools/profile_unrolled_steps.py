"""A/B: per-step dispatch vs an UNROLLED K-step program (tuple output).

Round 4 rejected lax.scan chaining because stacking each 64 MB step
output into the scan carry cost a dynamic-update-slice copy per step
(BENCH.md).  This variant unrolls K independent steps into ONE jitted
program returning a K-tuple — no stacking, no copies — so it isolates
the pure per-program dispatch/launch overhead (wall 3.09 ms vs
device-op 2.62 ms at vv009/256 = ~0.47 ms/step of gap).

Usage: python tools/profile_unrolled_steps.py [batch] [steps] [config]
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    config = sys.argv[3] if len(sys.argv) > 3 else "vv009_4kshort"

    cfg = _named_config(config)
    plan = build_plan(cfg, batch, strict=False)
    for pp in plan.plps:
        pp.use_pallas = True
    wins = []
    carry = np.zeros(187, np.uint8)
    for s in range(4):
        ts = synthetic_ts(plan.ts_bytes_in, seed=s)
        padded = np.concatenate([carry, ts])
        wins.append(jax.device_put(jnp.asarray(padded)))
        carry = padded[-187:]
    fi = jnp.int32(0)

    step1 = jax.jit(functools.partial(transmit_step_iq_planar, plan))

    def reps(run, label, steps_per_call, calls):
        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            times.append(dt / (steps_per_call * calls))
        med = statistics.median(times)
        rate = batch * cfg.samples_per_frame / med
        print(f"{label:18s} median {med*1e3:7.3f} ms/step "
              f"-> {rate/1e6:7.1f} Msamp/s", flush=True)
        return med

    chk = jax.jit(lambda o: jnp.sum(o[..., 0].astype(jnp.float32)))

    def run_single():
        outs = [step1(wins[i % 4], fi) for i in range(total)]
        fence(chk(outs[-1]))

    base = reps(run_single, "per-step", 1, total)

    for k in (4, 8):
        def stepk(ws, fis, k=k):
            return tuple(transmit_step_iq_planar(plan, w, f)
                         for w, f in zip(ws, fis))
        fk = jax.jit(stepk)
        fis = tuple(jnp.int32(0) for _ in range(k))

        def run_k(k=k, fk=fk, fis=fis):
            outs = None
            for c in range(total // k):
                ws = tuple(wins[(c * k + i) % 4] for i in range(k))
                outs = fk(ws, fis)
            fence(chk(outs[-1]))

        med = reps(run_k, f"unrolled K={k}", k, total // k)
        print(f"  K={k} vs per-step: {base/med:.3f}x", flush=True)


if __name__ == "__main__":
    main()
