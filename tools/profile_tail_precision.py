"""Measure the einsum-tail dot precision tradeoff END-TO-END: HIGHEST
(6-pass bf16x6, shipped) vs HIGH (3-pass bf16x3) on the full vv009 step,
reporting both wall time and the SNR of each arm against the float64
numpy oracle (refmodel) - the chain invariant requires >100 dB and the
test suite pins >120/130, so a speed win only counts if accuracy holds.

Usage: python tools/profile_tail_precision.py [batch] [iters] [config]
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
from dvbt2ll_tpu import refmodel
from dvbt2ll_tpu.io import synthetic_ts
from dvbt2ll_tpu.ops import ifft_pallas as _ifft_mod
from dvbt2ll_tpu.pipeline import transmit_step_iq_planar
from dvbt2ll_tpu.plan import build_plan


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    config = sys.argv[3] if len(sys.argv) > 3 else "vv009_4kshort"

    cfg = _named_config(config)
    plan = build_plan(cfg, batch, strict=False)
    for pp in plan.plps:
        pp.use_pallas = True
    ts = synthetic_ts(plan.ts_bytes_in, seed=3)
    w = jnp.asarray(np.concatenate([np.zeros(187, np.uint8), ts]))
    fi = jnp.int32(0)

    # small-batch oracle comparison (the f64 chain is slow): first 2 frames
    oracle = refmodel.transmit_chain(cfg, ts[: 2 * (plan.ts_bytes_in
                                                    // batch)], 2)
    oracle = oracle.reshape(2, cfg.samples_per_frame)

    orig = _ifft_mod.ifft_gi_einsum
    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH)):
        _ifft_mod.ifft_gi_einsum = functools.partial(orig, precision=prec)
        try:
            f = jax.jit(functools.partial(transmit_step_iq_planar, plan,
                                          impl="einsum"))
            out = f(w, fi)
            fence(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = f(w, fi)
                fence(out)
                times.append((time.perf_counter() - t0) / iters)
            med = statistics.median(times)
            iq = np.asarray(out)[:2]
            got = (iq[..., 0] + 1j * iq[..., 1]).reshape(
                2, cfg.samples_per_frame)
            err = np.sum(np.abs(got - oracle) ** 2)
            snr = 10 * np.log10(np.sum(np.abs(oracle) ** 2) / err)
            rate = batch * cfg.samples_per_frame / med
            print(f"{name:8s} median {med*1e3:7.3f} ms "
                  f"-> {rate/1e6:7.1f} Msamp/s   SNR vs oracle "
                  f"{snr:6.1f} dB", flush=True)
        finally:
            _ifft_mod.ifft_gi_einsum = orig


if __name__ == "__main__":
    main()
