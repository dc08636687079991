"""A/B: per-step dispatch vs lax.scan-chained multi-step dispatch.

The step bench (bench.py) enqueues one XLA program per transmit step; each
enqueue is an RPC through the axon dev tunnel, and the round-4 xprof trace
shows pure device-op time (~2.62 ms/step at vv009/256 = 3.09 Gsamp/s)
sitting well above the measured wall-clock (2.61 Gsamp/s) - the difference
is enqueue overhead.  This tool measures the same 50-step workload chained
K steps per dispatch with `lax.scan` (full IQ materialized for every step,
stacked (K, B, samples, 2); checksum fence on the last element) - the
command-buffer formulation a steps-per-dispatch knob would give.
MEASURED SLOWER (BENCH.md round-4 rejected list), so no such knob exists.

Usage: python tools/profile_scan_steps.py [batch] [steps] [config]
"""
import sys
import time

import numpy as np

from _common import fence, jax, jnp  # noqa: F401  (path setup)


def main():
    from bench import _named_config
    from dvbt2ll_tpu.io import synthetic_ts
    from dvbt2ll_tpu.pipeline import Transmitter

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    name = sys.argv[3] if len(sys.argv) > 3 else "vv009_4kshort"

    cfg = _named_config(name)
    tx = Transmitter(cfg, batch, strict=False)
    n = tx.bytes_per_step

    carry = np.zeros(187, np.uint8)
    wins = []
    for s in range(4):
        ts = synthetic_ts(n, seed=s)
        padded = np.concatenate([carry, ts])
        wins.append(padded)
        carry = padded[-187:]
    dev_in = [jax.device_put(jnp.asarray(w)) for w in wins]
    fi = jnp.int32(0)
    step = tx._step
    samples = batch * cfg.samples_per_frame

    # --- baseline: one dispatch per step (bench.py protocol) -------------
    chk = jax.jit(lambda o: jnp.sum(o[..., 0].astype(jnp.float32)))
    float(chk(step(dev_in[0], fi)))
    float(chk(step(dev_in[1], fi)))
    t0 = time.perf_counter()
    outs = [step(dev_in[i % 4], fi) for i in range(steps)]
    float(chk(outs[-1]))
    dt = time.perf_counter() - t0
    print(f"per-step dispatch   {steps} steps  {dt*1e3/steps:7.2f} ms/step  "
          f"{steps*samples/dt/1e6:7.1f} Msamp/s", flush=True)

    # --- scan: K steps per dispatch --------------------------------------
    for k in (4, 8, 16):
        if steps % k:
            continue
        stacked = jax.device_put(jnp.stack([jnp.asarray(wins[i % 4])
                                            for i in range(k)]))

        @jax.jit
        def scan_steps(windows, fi0):
            def body(c, w):
                return c, step(w, c)
            _, ys = jax.lax.scan(body, fi0, windows)
            return ys

        float(chk(scan_steps(stacked, fi)[-1]))  # compile
        t0 = time.perf_counter()
        last = None
        for _ in range(steps // k):
            last = scan_steps(stacked, fi)
        float(chk(last[-1]))
        dt = time.perf_counter() - t0
        print(f"scan k={k:<2d} dispatch  {steps} steps  "
              f"{dt*1e3/steps:7.2f} ms/step  "
              f"{steps*samples/dt/1e6:7.1f} Msamp/s", flush=True)


if __name__ == "__main__":
    main()
