"""A/B the OFDM output-assembly formulations on real hardware.

The xprof trace of the 32K step (BENCH.md) shows ~17% of device time in
the output assembly: the GI concatenate, the P1 concatenate and the
final real/imag stack each rewrite an output-sized buffer
(pad+maximum fusions).  Candidate V1 assembles the final float32
(B, samples, 2) in ONE pass: stack(real, imag) of the IFFT result into
(..., 2) float32 pairs, then a single gather whose index map encodes the
guard-interval wrap, with a select folding in the constant P1 prefix.

Usage: python tools/profile_modulate.py [batch] [iters] [config] [reps]
"""
import statistics
import sys
import time

from _common import fence

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu import pipeline as P
from dvbt2ll_tpu.pipeline import Transmitter, _consts


def v0(plan, grids):
    out = P.modulate(plan, grids)
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)


def v2(plan, grids):
    """modulate + BITCAST view instead of stack(real, imag).  REJECTED
    (round 4): TPU complex64 is NOT stored as interleaved (re, im) pairs,
    so the "free" view forces a relayout that measured 0.65x END-TO-END
    (2298 -> 1482 Msamp/s) when wired into the chain - keep the explicit
    stack (pipeline.py, CLAUDE.md perf rules).  Benchmarked below so the
    rejection stays reproducible."""
    out = P.modulate(plan, grids)
    return out.view(jnp.float32).reshape(out.shape + (2,))


P1_SAMPLES = 2048  # the P1 preamble is always 2048 samples in T2


def make_v1(plan):
    cfg = plan.cfg
    c = _consts(plan)
    fft, gi, s = cfg.fft_points, cfg.guard_samples, cfg.num_symbols
    scale = np.complex64(fft * cfg.ofdm_normalization)
    body = s * (fft + gi)
    # per-output-sample source index into the flattened (S*fft) IFFT
    # stream; the GI wrap is k < gi -> fft-gi+k
    jj = np.arange(body, dtype=np.int64)
    sym, k = jj // (fft + gi), jj % (fft + gi)
    src = sym * fft + (k + fft - gi) % fft
    map_full = np.concatenate(
        [np.zeros(P1_SAMPLES, np.int64), src]).astype(np.int32)
    mask = np.zeros(P1_SAMPLES + body, bool)
    mask[:P1_SAMPLES] = True
    p1 = np.zeros((P1_SAMPLES + body, 2), np.float32)
    p1[:P1_SAMPLES, 0] = np.real(c["p1"])
    p1[:P1_SAMPLES, 1] = np.imag(c["p1"])
    eq = c["eq"]

    def fn(grids):
        g = grids * eq if eq is not None else grids
        t = (jnp.fft.ifft(g, axis=-1) * scale).astype(jnp.complex64)
        tf = jnp.stack([jnp.real(t), jnp.imag(t)], axis=-1)  # (B,S,fft,2)
        tf = tf.reshape(grids.shape[0], s * fft, 2)
        return jnp.where(mask[None, :, None], p1[None],
                         tf[:, map_full, :])

    return fn


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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = _named_config(sys.argv[3] if len(sys.argv) > 3 else "32k_extended")
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    tx = Transmitter(cfg, batch, strict=False, allow_phase_drift=True)
    plan = tx.plan
    ts = np.concatenate([np.zeros(187, np.uint8),
                         synthetic_ts(tx.bytes_per_step)])
    w = jax.device_put(jnp.asarray(ts))
    fi = jnp.int32(0)

    @jax.jit
    def grids_fn(wi, f):
        payloads = []
        for pp, ww in zip(plan.plps, P._as_windows(plan, wi)):
            cells = P.map_cells(pp, P.bb_and_fec(pp, ww))
            payloads.append(cells.reshape(plan.batch_frames,
                                          pp.cfg.stream_cells))
        payload = (payloads[0] if len(payloads) == 1
                   else jnp.concatenate(payloads, axis=1))
        return P.build_frames(plan, payload, f)

    grids = grids_fn(w, fi)
    fence(grids)

    f0 = jax.jit(lambda g: v0(plan, g))
    f1 = jax.jit(make_v1(plan))
    f2 = jax.jit(lambda g: v2(plan, g))
    a = np.asarray(f0(grids))
    b = np.asarray(f1(grids))
    c2 = np.asarray(f2(grids))
    print("V1 bit-identical:", np.array_equal(a, b),
          " max|d|:", float(np.abs(a - b).max()), flush=True)
    print("V2 bit-identical:", np.array_equal(a, c2), flush=True)

    t0s = _reps(f0, (grids,), reps, iters)
    t1s = _reps(f1, (grids,), reps, iters)
    t2s = _reps(f2, (grids,), reps, iters)
    m0, m1 = statistics.median(t0s), statistics.median(t1s)
    m2 = statistics.median(t2s)
    print(f"V0 concat/stack median {m0*1e3:7.3f} ms  "
          f"min {min(t0s)*1e3:7.3f} max {max(t0s)*1e3:7.3f}")
    print(f"V1 fused gather median {m1*1e3:7.3f} ms  "
          f"min {min(t1s)*1e3:7.3f} max {max(t1s)*1e3:7.3f}")
    print(f"V2 bitcast view median {m2*1e3:7.3f} ms  "
          f"min {min(t2s)*1e3:7.3f} max {max(t2s)*1e3:7.3f}")
    sep = max(t1s) < min(t0s) or max(t0s) < min(t1s)
    print(f"speedup V0/V1 = {m0/m1:.3f}x  V0/V2 = {m0/m2:.3f}x  "
          f"distributions {'SEPARABLE' if sep else 'OVERLAP'}")


if __name__ == "__main__":
    main()
