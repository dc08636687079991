"""32K OFDM tail shootout: XLA complex FFT vs planar einsum variants.

The 32K xprof trace (round 4) shows XLA's own complex-FFT decomposition
plus its layout copies and the GI/P1/stack assembly at ~5.6 ms of the
8.84 ms step.  The planar 4-step einsum tail measured flat at HIGHEST
precision (6-pass f32 emulation over N*(256+128) MACs/sample swamps the
layout savings); the two levers tested here:

  T1  4-step einsum, precision HIGHEST   (the 8K-class formulation)
  T2  4-step einsum, precision HIGH      (3-pass f32: ~2x cheaper MXU)
  T3  3-factor einsum (128 x 16 x 16), HIGHEST: the 256-row DFT factor
      splits again, cutting MACs/sample from 384 to 160
  T4  3-factor einsum, precision HIGH

All variants assemble the same (B, samples, 2) output and are checked
against the complex-path reference to >100 dB in f64.

Usage: python tools/profile_ifft32k.py [batch] [iters] [reps]
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
from dvbt2ll_tpu.ops.ifft_pallas import N1, factor_matrices

HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def v0(plan, grids):
    out = P.modulate(plan, grids)
    return jnp.stack([jnp.real(out), jnp.imag(out)], axis=-1)


def _assemble(plan, body_re, body_im):
    c = _consts(plan)
    b = body_re.shape[0]
    p1r = np.float32(np.real(c["p1"]))
    p1i = np.float32(np.imag(c["p1"]))
    out_re = jnp.concatenate(
        [jnp.tile(p1r[None], (b, 1)), body_re.reshape(b, -1)], 1)
    out_im = jnp.concatenate(
        [jnp.tile(p1i[None], (b, 1)), body_im.reshape(b, -1)], 1)
    return jnp.stack([out_re, out_im], -1)


def make_4step(plan, prec):
    from dvbt2ll_tpu.ops.ifft_pallas import ifft_gi_einsum
    cfg = plan.cfg

    def fn(gr_t, gi_t):
        br, bi = ifft_gi_einsum(gr_t, gi_t, cfg.fft_points,
                                cfg.guard_samples, cfg.ofdm_normalization,
                                precision=prec)
        return _assemble(plan, br, bi)

    return fn


def make_3factor(plan, prec):
    """Stage-2 (the n2-row inverse DFT) split as 16 x 16."""
    cfg = plan.cfg
    fft, gi = cfg.fft_points, cfg.guard_samples
    n2 = fft // N1
    m = int(np.sqrt(n2))
    assert m * m == n2, "3-factor needs n2 = m^2"
    gi_rows = gi // N1
    w1r, w1i, ttr, tti, _, _ = factor_matrices(
        fft, cfg.ofdm_normalization)
    k = np.arange(m)
    wm = np.exp(2j * np.pi * np.outer(k, k) / m)
    tm = np.exp(2j * np.pi * np.outer(k, k) / n2)  # T16[a0, b0]
    wmr, wmi = np.float32(wm.real), np.float32(wm.imag)
    tmr, tmi = np.float32(tm.real), np.float32(tm.imag)

    def rowdft(cr, ci):
        b, s = cr.shape[:2]
        c4r = cr.reshape(b, s, m, m, N1)   # rows (b1, b0)
        c4i = ci.reshape(b, s, m, m, N1)
        dr = (jnp.einsum("ab,xsbcn->xsacn", wmr, c4r, precision=prec)
              - jnp.einsum("ab,xsbcn->xsacn", wmi, c4i, precision=prec))
        di = (jnp.einsum("ab,xsbcn->xsacn", wmr, c4i, precision=prec)
              + jnp.einsum("ab,xsbcn->xsacn", wmi, c4r, precision=prec))
        tr_ = tmr[None, None, :, :, None]
        ti_ = tmi[None, None, :, :, None]
        er = dr * tr_ - di * ti_
        ei = dr * ti_ + di * tr_
        # X[a0 + 16 a1] -> output dims ordered (a1, a0): 'xsacn,cd->xsdan'
        xr = (jnp.einsum("xsacn,cd->xsdan", er, wmr, precision=prec)
              - jnp.einsum("xsacn,cd->xsdan", ei, wmi, precision=prec))
        xi = (jnp.einsum("xsacn,cd->xsdan", er, wmi, precision=prec)
              + jnp.einsum("xsacn,cd->xsdan", ei, wmr, precision=prec))
        return (xr.reshape(b, s, n2, N1), xi.reshape(b, s, n2, N1))

    def fn(gr_t, gi_t):
        b, s = gr_t.shape[:2]
        br = (jnp.einsum("xskn,nm->xskm", gr_t, w1r, precision=prec)
              - jnp.einsum("xskn,nm->xskm", gi_t, w1i, precision=prec))
        bi = (jnp.einsum("xskn,nm->xskm", gr_t, w1i, precision=prec)
              + jnp.einsum("xskn,nm->xskm", gi_t, w1r, precision=prec))
        cr = br * ttr - bi * tti
        ci = br * tti + bi * ttr
        xr, xi = rowdft(cr, ci)
        body_re = jnp.concatenate([xr[:, :, n2 - gi_rows:], xr], axis=2)
        body_im = jnp.concatenate([xi[:, :, n2 - gi_rows:], xi], axis=2)
        return _assemble(plan, body_re.reshape(b, s, fft + gi),
                         body_im.reshape(b, s, fft + gi))

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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cfg = _named_config("32k_extended")

    tx = Transmitter(cfg, batch, strict=False, allow_phase_drift=True)
    plan = tx.plan
    ts = np.concatenate([np.zeros(187, np.uint8),
                         synthetic_ts(tx.bytes_per_step)])
    w = jax.device_put(jnp.asarray(ts))

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

    grids = grids_fn(w, jnp.int32(0))
    fence(grids)
    n2 = cfg.fft_points // N1
    tidx = n2 * np.arange(N1)[None, :] + np.arange(n2)[:, None]
    grt = jax.jit(lambda g: jnp.real(g)[:, :, tidx])(grids)
    git = jax.jit(lambda g: jnp.imag(g)[:, :, tidx])(grids)
    fence(grt)

    f0 = jax.jit(lambda g: v0(plan, g))
    cands = [
        ("T1 4step HIGHEST", jax.jit(make_4step(plan, HI))),
        ("T2 4step HIGH   ", jax.jit(make_4step(plan, H3))),
        ("T3 3fact HIGHEST", jax.jit(make_3factor(plan, HI))),
        ("T4 3fact HIGH   ", jax.jit(make_3factor(plan, H3))),
    ]
    a = np.asarray(f0(grids)).astype(np.float64)
    keep = []
    for label, fn in cands:
        b = np.asarray(fn(grt, git)).astype(np.float64)
        snr = 10 * np.log10((a ** 2).sum()
                            / max(((a - b) ** 2).sum(), 1e-30))
        print(f"{label} vs complex: {snr:6.1f} dB "
              f"{'OK' if snr > 100 else 'FAIL'}", flush=True)
        if snr > 100:
            keep.append((label, fn))

    t0s = _reps(f0, (grids,), reps, iters)
    m0 = statistics.median(t0s)
    print(f"T0 complex fft tail  median {m0*1e3:7.3f} ms  "
          f"min {min(t0s)*1e3:7.3f} max {max(t0s)*1e3:7.3f}")
    for label, fn in keep:
        t = _reps(fn, (grt, git), reps, iters)
        mt = statistics.median(t)
        sep = max(t) < min(t0s) or max(t0s) < min(t)
        print(f"{label} median {mt*1e3:7.3f} ms  min {min(t)*1e3:7.3f} "
              f"max {max(t)*1e3:7.3f}  T0/x = {m0/mt:.3f}x "
              f"{'SEPARABLE' if sep else 'OVERLAP'}")


if __name__ == "__main__":
    main()
