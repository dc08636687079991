"""Benchmark: sustained baseband throughput of the vv009-4kshort chain.

Prints ONE JSON line.  ``vs_baseline`` is the real-time factor against the
reference example app's output sample rate of (8e6*8)/7 ~= 9.142857 Msamp/s
(apps/vv009-4kshort.grc `samp_rate`; BASELINE.md) — the rate the reference
C++ chain must sustain (and was designed to barely exceed) on a desktop CPU.
"""
import json
import sys
import time

import numpy as np

BASELINE_SAMP_RATE = 8e6 * 8 / 7  # reference app real-time sample rate


def main():
    import jax
    import jax.numpy as jnp

    from dvbt2ll_tpu.config import vv009_config
    from dvbt2ll_tpu.io import synthetic_ts
    from dvbt2ll_tpu.pipeline import Transmitter

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = vv009_config()
    tx = Transmitter(cfg, batch, strict=False)
    n = tx.bytes_per_step
    rng = np.random.default_rng(0)
    # pre-generate distinct inputs so no step is trivially cached
    inputs = [synthetic_ts(n, seed=s) for s in range(4)]

    # warmup / compile
    tx.step_device(inputs[0]).block_until_ready()
    tx.step_device(inputs[1]).block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for i in range(steps):
        outs.append(tx.step_device(inputs[i % len(inputs)]))
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0

    samples = steps * batch * cfg.samples_per_frame
    rate = samples / dt
    print(json.dumps({
        "metric": "vv009_4kshort_throughput",
        "value": round(rate / 1e6, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(rate / BASELINE_SAMP_RATE, 2),
    }))


if __name__ == "__main__":
    main()
