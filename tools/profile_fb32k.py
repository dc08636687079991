"""Root-cause + fix candidate for the 32K large-batch regression.

xprof at 32k_extended shows the two frame-builder gather fusions going
from 0.30 ms each at batch 128 to 2.18 ms each at batch 160 (7x per op
for 1.25x the rows) - an XLA gather-strategy flip at that operand
shape, NOT HBM capacity (live buffers are ~1 GB of 16).  This tool
isolates the gather `seq[:, shaped_idx]` (pipeline.build_frames:326)
and A/Bs it against a `lax.map` over fixed-size batch chunks, which
pins the known-good strategy shape at any total batch.

Usage: python tools/profile_fb32k.py [iters] [reps]
"""
import statistics
import sys
import time

from _common import fence

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu.pipeline import Transmitter, _consts


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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = _named_config("32k_extended")
    tx = Transmitter(cfg, 128, strict=False, allow_phase_drift=True)
    plan = tx.plan
    c = _consts(plan)
    src = c["grid_src"]
    # synthetic seq of the real length: the sentinel is seq[-1]
    seq_len = int(src.max()) + 2
    gather = np.where(src >= 0, src, seq_len - 1)

    rng = np.random.default_rng(0)

    def make_seq(b):
        re = rng.standard_normal((b, seq_len)).astype(np.float32)
        im = rng.standard_normal((b, seq_len)).astype(np.float32)
        return jax.device_put(jnp.asarray(re)), jax.device_put(jnp.asarray(im))

    idx = jnp.asarray(gather)

    def v0(re, im):  # the shipped formulation (complex gather, materialized)
        seq = jax.lax.complex(re, im)
        return seq[:, idx]

    def make_chunked(chunk):
        def v1(re, im):
            seq = jax.lax.complex(re, im)
            b = seq.shape[0]
            s3 = seq.reshape(b // chunk, chunk, seq_len)
            out = jax.lax.map(lambda s: s[:, idx], s3)
            return out.reshape((b,) + idx.shape)
        return v1

    for b in (128, 160, 256):
        re, im = make_seq(b)
        f0 = jax.jit(v0)
        t0s = _reps(f0, (re, im), reps, iters)
        line = f"B={b:<4d} v0 {statistics.median(t0s)*1e3:7.2f} ms"
        for chunk in (32, 64, 128):
            if b % chunk:
                continue
            f1 = jax.jit(make_chunked(chunk))
            t1s = _reps(f1, (re, im), reps, iters)
            line += f"   map{chunk} {statistics.median(t1s)*1e3:7.2f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
