"""A/B the planar-f32 4-step (matmul) IFFT tail against modulate+stack.

Hypothesis (round 4): the tail's cost is not the FFT itself but the
complex64 layout traffic around it (the xprof profile shows copies /
reshapes / pad fusions spread across the tail).  The 4-step
decomposition N = N1*N2 (Bailey) computes the IFFT as two MXU matmuls
plus a twiddle, entirely on separate real/imag f32 planes - no complex
dtype anywhere - and the output assembly (transpose + GI + P1 + IQ
interleave) becomes one XLA copy fusion from the planar result.

    A = X.reshape(N2, N1);  R = ((W2 @ A) * T) @ W1;  x[N2*n1+n2] = R[n2,n1]

with W2/T/W1 the inverse-DFT factor matrices (validated to 1.5e-15 vs
np.fft.ifft).  einsum precision=HIGHEST keeps f32 accuracy on the MXU
(bf16 default would be ~40 dB).

Usage: python tools/profile_ifft4.py [batch] [iters] [config] [reps]
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

P1_SAMPLES = 2048
HI = jax.lax.Precision.HIGHEST


def v0(plan, grids):
    out = P.modulate(plan, grids)
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)


def make_v1(plan):
    """Planar 4-step: inputs are (B, S, fft) f32 re/im planes."""
    cfg = plan.cfg
    c = _consts(plan)
    fft, gi, s = cfg.fft_points, cfg.guard_samples, cfg.num_symbols
    n1 = 128
    n2 = fft // n1
    scale = fft * cfg.ofdm_normalization / fft  # ifft 1/N folded: net norm
    w2 = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / fft)
    w1 = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w1 = w1 * scale
    w2r, w2i = np.float32(w2.real), np.float32(w2.imag)
    twr, twi = np.float32(tw.real), np.float32(tw.imag)
    w1r, w1i = np.float32(w1.real), np.float32(w1.imag)
    p1 = np.stack([np.float32(np.real(c["p1"])),
                   np.float32(np.imag(c["p1"]))], -1)  # (2048, 2)
    eq = c["eq"]

    def fn(gr, gi_):
        if eq is not None:
            gr, gi_ = gr * eq, gi_ * eq
        b = gr.shape[0]
        ar = gr.reshape(b, s, n2, n1)
        ai = gi_.reshape(b, s, n2, n1)
        br = (jnp.einsum("kb,xybn->xykn", w2r, ar, precision=HI)
              - jnp.einsum("kb,xybn->xykn", w2i, ai, precision=HI))
        bi = (jnp.einsum("kb,xybn->xykn", w2r, ai, precision=HI)
              + jnp.einsum("kb,xybn->xykn", w2i, ar, precision=HI))
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr
        rr = (jnp.einsum("xykn,nm->xykm", cr, w1r, precision=HI)
              - jnp.einsum("xykn,nm->xykm", ci, w1i, precision=HI))
        ri = (jnp.einsum("xykn,nm->xykm", cr, w1i, precision=HI)
              + jnp.einsum("xykn,nm->xykm", ci, w1r, precision=HI))
        # x[N2*m + k] = R[k, m]: natural order = transpose (k,m)->(m,k)
        xr = rr.transpose(0, 1, 3, 2).reshape(b, s, fft)
        xi = ri.transpose(0, 1, 3, 2).reshape(b, s, fft)
        gr_ = jnp.concatenate([xr[..., fft - gi:], xr], -1)
        gi2 = jnp.concatenate([xi[..., fft - gi:], xi], -1)
        body = jnp.stack([gr_.reshape(b, -1), gi2.reshape(b, -1)], -1)
        return jnp.concatenate(
            [jnp.tile(p1[None], (b, 1, 1)), body], axis=1)

    return fn


def make_v2(plan):
    """Pallas fused 4-step IFFT + GI kernel on transposed planar grids."""
    from dvbt2ll_tpu.ops.ifft_pallas import N1, ifft_gi_pallas
    cfg = plan.cfg
    c = _consts(plan)
    fft, gi, s = cfg.fft_points, cfg.guard_samples, cfg.num_symbols
    p1r = np.float32(np.real(c["p1"]))
    p1i = np.float32(np.imag(c["p1"]))

    def fn(gr_t, gi_t):
        b = gr_t.shape[0]
        body_re, body_im = ifft_gi_pallas(gr_t, gi_t, fft, gi,
                                          cfg.ofdm_normalization)
        out_re = jnp.concatenate(
            [jnp.tile(p1r[None], (b, 1)), body_re.reshape(b, -1)], 1)
        out_im = jnp.concatenate(
            [jnp.tile(p1i[None], (b, 1)), body_im.reshape(b, -1)], 1)
        return jnp.stack([out_re, out_im], -1)

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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = _named_config(sys.argv[3] if len(sys.argv) > 3
                        else "vv009_4kshort")
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
    # planar inputs staged once (the integrated chain would produce these
    # directly from a planar build_frames)
    gr = jax.jit(lambda g: jnp.real(g))(grids)
    gim = jax.jit(lambda g: jnp.imag(g))(grids)
    fence(gr)

    from dvbt2ll_tpu.ops.ifft_pallas import N1
    n2 = cfg.fft_points // N1
    tidx = n2 * np.arange(N1)[None, :] + np.arange(n2)[:, None]
    grt = jax.jit(lambda g: jnp.real(g)[:, :, tidx])(grids)
    git = jax.jit(lambda g: jnp.imag(g)[:, :, tidx])(grids)
    fence(grt)

    f0 = jax.jit(lambda g: v0(plan, g))
    f1 = jax.jit(make_v1(plan))
    f2 = jax.jit(make_v2(plan))
    a = np.asarray(f0(grids)).astype(np.float64)
    for label, fn, args in (("V1", f1, (gr, gim)), ("V2", f2, (grt, git))):
        b = np.asarray(fn(*args)).astype(np.float64)
        err = ((a - b) ** 2).sum()
        snr = 10 * np.log10((a ** 2).sum() / max(err, 1e-30))
        print(f"{label} vs V0 agreement: {snr:.1f} dB (>=120 required)",
              flush=True)
        assert snr > 120

    t0s = _reps(f0, (grids,), reps, iters)
    t1s = _reps(f1, (gr, gim), reps, iters)
    t2s = _reps(f2, (grt, git), reps, iters)
    m0 = statistics.median(t0s)
    m1 = statistics.median(t1s)
    m2 = statistics.median(t2s)
    print(f"V0 fft+concats+stack median {m0*1e3:7.3f} ms  "
          f"min {min(t0s)*1e3:7.3f} max {max(t0s)*1e3:7.3f}")
    print(f"V1 planar 4-step     median {m1*1e3:7.3f} ms  "
          f"min {min(t1s)*1e3:7.3f} max {max(t1s)*1e3:7.3f}")
    print(f"V2 pallas ifft+gi    median {m2*1e3:7.3f} ms  "
          f"min {min(t2s)*1e3:7.3f} max {max(t2s)*1e3:7.3f}")
    for label, t in (("V1", t1s), ("V2", t2s)):
        sep = max(t) < min(t0s) or max(t0s) < min(t)
        print(f"speedup V0/{label} = {m0/statistics.median(t):.3f}x  "
              f"distributions {'SEPARABLE' if sep else 'OVERLAP'}")


if __name__ == "__main__":
    main()
