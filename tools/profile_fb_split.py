"""32K batch-256 gather-flip probe: split the frame-builder gather.

Round 4 pinned 32K's batch optimum at 128 because the two frame-builder
gather fusions jump 0.30 -> 2.18 ms EACH above 128 rows (an XLA
gather-strategy flip; BENCH.md "32K batch sweep").  lax.map over
128-row chunks did not beat it.  This probe tries the remaining
formulation: TWO parallel half-batch gathers separated by
optimization_barrier (so XLA cannot re-fuse them into one >128-row
gather), inside the otherwise unchanged full chain at batch 256.

If the split step at 256 beats 2x the batch-128 step, the flip is
avoidable and the chain should adopt the split; otherwise this closes
the last open 32K-batch hypothesis.

Usage: python tools/profile_fb_split.py [iters]
"""
import statistics
import sys
import time

from _common import fence

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu import pipeline as P
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.plan import build_plan


def step_split(plan, ts_padded, frame_idx0, parts=2):
    """transmit_step_iq with build_frames' gather split over the batch."""
    cfg = plan.cfg
    c = P._consts(plan)
    b = plan.batch_frames
    payloads = []
    for pp, w in zip(plan.plps, P._as_windows(plan, ts_padded)):
        cells = P.map_cells(pp, P.bb_and_fec(pp, w))
        payloads.append(cells.reshape(b, pp.cfg.stream_cells))
    payload = (payloads[0] if len(payloads) == 1
               else jnp.concatenate(payloads, axis=1))

    idx = (frame_idx0 + jnp.arange(b)) % cfg.t2_frames
    l1post = jnp.asarray(c["l1post_all"])[idx]
    seq = jnp.concatenate([
        jnp.tile(c["l1pre"][None, :], (b, 1)), l1post, payload,
        jnp.tile(c["dummy"][None, :], (b, 1)),
        jnp.zeros((b, cfg.n_fc - cfg.c_fc + 1), jnp.complex64)], axis=1)
    src = c["grid_src"]
    gather = jnp.where(src >= 0, src, seq.shape[1] - 1)
    h = b // parts
    outs = []
    for p in range(parts):
        part = jax.lax.optimization_barrier(seq[p * h:(p + 1) * h])
        outs.append(part[:, gather])
    grids = jnp.concatenate(outs, axis=0) + c["pilot_plane"].astype(
        jnp.complex64)
    out = P.modulate(plan, grids)
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)


def bench(label, f, args, iters):
    out = f(*args)
    fence(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times), out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = _named_config("32k_extended")
    import functools

    results = {}
    for batch, variant in ((128, "std"), (256, "std"), (256, "split2")):
        plan = build_plan(cfg, batch, strict=False)
        for pp in plan.plps:
            pp.use_pallas = True
        ts = synthetic_ts(plan.ts_bytes_in, seed=4)
        w = jnp.asarray(np.concatenate([np.zeros(187, np.uint8), ts]))
        fn = (functools.partial(step_split, plan) if variant == "split2"
              else functools.partial(P.transmit_step_iq, plan))
        f = jax.jit(fn)
        med, out = bench(f"{variant}@{batch}", f, (w, jnp.int32(0)), iters)
        rate = batch * cfg.samples_per_frame / med
        results[(batch, variant)] = (med, rate, np.asarray(out))
        print(f"{variant:7s} batch {batch:3d}: {med*1e3:8.3f} ms/step "
              f"-> {rate/1e6:7.1f} Msamp/s", flush=True)

    a = results[(256, "std")][2]
    bspl = results[(256, "split2")][2]
    err = np.max(np.abs(a - bspl))
    print(f"split vs std agreement at 256: max|d| {err:.3e} "
          f"({'OK' if err == 0 else 'check'})")


if __name__ == "__main__":
    main()
