"""Does the gather-strategy flip also explain the 4K batch-512
regression?  Round 4 re-swept vv009 at 512 (2269 vs 2606 at 256) and
attributed it to HBM pressure; the 32K result (profile_fb_split.py)
shows the frame-builder gather flips strategy above ~128 rows.  This
probe runs the PLANAR vv009 step at batch 512 with its two grid
gathers split into <=128-row quarters behind optimization_barrier,
against the unsplit 512 and the 256 baseline.

Usage: python tools/profile_fb_split_4k.py [iters]
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
from dvbt2ll_tpu import pipeline as P
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.plan import build_plan


def planar_split(plan, ts_padded, frame_idx0, rows=128):
    """transmit_step_iq_planar (einsum tail) with split grid gathers."""
    from dvbt2ll_tpu.ops.ifft_pallas import ifft_gi_einsum

    cfg = plan.cfg
    pc = P._planar_consts(plan)
    b = plan.batch_frames

    res, ims = [], []
    for pp, w in zip(plan.plps, P._as_windows(plan, ts_padded)):
        i_p, q_p = P.map_cells_planes(pp, P.bb_and_fec(pp, w))
        res.append(i_p.reshape(b, pp.cfg.stream_cells))
        ims.append(q_p.reshape(b, pp.cfg.stream_cells))
    pay_re = res[0] if len(res) == 1 else jnp.concatenate(res, axis=1)
    pay_im = ims[0] if len(ims) == 1 else jnp.concatenate(ims, axis=1)

    idx = (frame_idx0 + jnp.arange(b)) % cfg.t2_frames
    zeros = jnp.zeros((b, cfg.n_fc - cfg.c_fc + 1), jnp.float32)
    seq_re = jnp.concatenate([
        jnp.tile(pc["l1pre_re"][None, :], (b, 1)),
        jnp.asarray(pc["l1post_re"])[idx], pay_re,
        jnp.tile(pc["dummy_re"][None, :], (b, 1)), zeros], axis=1)
    seq_im = jnp.concatenate([
        jnp.tile(pc["l1pre_im"][None, :], (b, 1)),
        jnp.asarray(pc["l1post_im"])[idx], pay_im,
        jnp.tile(pc["dummy_im"][None, :], (b, 1)), zeros], axis=1)

    src = pc["grid_src_t"]
    gather = jnp.where(src >= 0, src, seq_re.shape[1] - 1)
    parts = -(-b // rows)
    h = -(-b // parts)
    gr, gi_ = [], []
    for p in range(parts):
        sr = jax.lax.optimization_barrier(seq_re[p * h:(p + 1) * h])
        si = jax.lax.optimization_barrier(seq_im[p * h:(p + 1) * h])
        gr.append(sr[:, gather])
        gi_.append(si[:, gather])
    g_re = jnp.concatenate(gr, axis=0) + pc["pilot_t"]
    g_im = jnp.concatenate(gi_, axis=0)
    if pc["eq_t"] is not None:
        g_re = g_re * pc["eq_t"]
        g_im = g_im * pc["eq_t"]
    body_re, body_im = ifft_gi_einsum(
        g_re, g_im, cfg.fft_points, cfg.guard_samples,
        cfg.ofdm_normalization)
    p1r = jnp.tile(pc["p1_re"][None, :], (b, 1))
    p1i = jnp.tile(pc["p1_im"][None, :], (b, 1))
    out_re = jnp.concatenate([p1r, body_re.reshape(b, -1)], axis=1)
    out_im = jnp.concatenate([p1i, body_im.reshape(b, -1)], axis=1)
    return jnp.stack([out_re, out_im], axis=-1)


def bench(f, args, iters):
    out = f(*args)
    fence(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = _named_config("vv009_4kshort")
    for batch, variant in ((256, "std"), (512, "std"), (512, "split128")):
        plan = build_plan(cfg, batch, strict=False)
        for pp in plan.plps:
            pp.use_pallas = True
        ts = synthetic_ts(plan.ts_bytes_in, seed=6)
        w = jnp.asarray(np.concatenate([np.zeros(187, np.uint8), ts]))
        fn = (functools.partial(planar_split, plan) if variant != "std"
              else functools.partial(P.transmit_step_iq_planar, plan))
        med = bench(jax.jit(fn), (w, jnp.int32(0)), iters)
        rate = batch * cfg.samples_per_frame / med
        print(f"{variant:9s} batch {batch:3d}: {med*1e3:8.3f} ms/step "
              f"-> {rate/1e6:7.1f} Msamp/s", flush=True)


if __name__ == "__main__":
    main()
