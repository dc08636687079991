"""Pallas QC-LDPC encoder (the shipped ops/ldpc_pallas.py kernel) vs the
XLA slice-schedule, on real hardware - statistically clean A/B.

Usage: python tools/profile_pallas_ldpc.py [F] [config] [reps]
  config: vv009_4kshort (default) | 8k_normal | 32k_extended
  reps:   independent timed repetitions (default 10); each rep times
          `iters` kernel calls and the report gives median +- spread, so
          tunnel run-to-run variance is visible instead of averaged away.

The verdict line prints the median speedup and whether the two
distributions are separable (min/max overlap) - the keep/delete evidence
for BENCH.md "Pallas LDPC".
"""
import statistics
import sys
import time

from _common import fence

import jax
import jax.numpy as jnp
import numpy as np

from bench import _named_config
from dvbt2ll_tpu.ops.ldpc_pallas import _tile_for, qc_ldpc_parity_pallas
from dvbt2ll_tpu.tables.ldpc import qc_entries


def _xla_path(cols_sched, nbch, plen, q, f):
    def fn(nbb):
        g = nbb.reshape(f, nbch // 360, 360)
        g2 = jnp.concatenate([g, g], axis=2)
        cols = []
        for entries in cols_sched:
            acc = None
            for (r, s) in entries:
                t = g2[:, r, 360 - s : 720 - s]
                acc = t if acc is None else acc ^ t
            cols.append(acc if acc is not None
                        else jnp.zeros((f, 360), jnp.uint8))
        run = cols[0]
        incl = [run]
        for cc in range(1, q):
            run = run ^ cols[cc]
            incl.append(run)
        incl = jnp.stack(incl, axis=2)
        row_inc = jax.lax.associative_scan(jnp.bitwise_xor, run, axis=1)
        row_excl = jnp.concatenate(
            [jnp.zeros((f, 1), jnp.uint8), row_inc[:, :-1]], axis=1)
        return (incl ^ row_excl[:, :, None]).reshape(f, plen)
    return fn


def _reps(f, args, reps, iters):
    out = f(*args)
    fence(out)                      # compile + drain
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return times


def main():
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    name = sys.argv[2] if len(sys.argv) > 2 else "vv009_4kshort"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    iters = 20
    cfg = _named_config(name)
    q, plen, nbch = cfg.q_ldpc, cfg.ldpc_parity_bits, cfg.nbch
    cols_sched = qc_entries(cfg.frame_size, cfg.code_rate, q)
    tiling = _tile_for(nbch, plen, f)
    print(f"{name}: F={f} nbch={nbch} plen={plen} q={q} "
          f"tiling(f_tile, group_rows)={tiling}", flush=True)
    rng = np.random.default_rng(0)
    nb = jnp.asarray(rng.integers(0, 2, (f, nbch), dtype=np.uint8))

    xla = jax.jit(_xla_path(cols_sched, nbch, plen, q, f))
    pal = jax.jit(lambda b: qc_ldpc_parity_pallas(
        cols_sched, nbch, plen, q, b, packed=False))
    pak = jax.jit(lambda b: qc_ldpc_parity_pallas(
        cols_sched, nbch, plen, q, b, packed=True))

    a = np.asarray(xla(nb))
    b = np.asarray(pal(nb))
    c = np.asarray(pak(nb))
    assert np.array_equal(a, b), "pallas != xla"
    assert np.array_equal(a, c), "packed pallas != xla"
    print("outputs bit-identical (xla == pallas == packed)", flush=True)

    tx = _reps(xla, (nb,), reps, iters)
    tp = _reps(pal, (nb,), reps, iters)
    tk = _reps(pak, (nb,), reps, iters)
    mx = statistics.median(tx)
    mp = statistics.median(tp)
    mk = statistics.median(tk)
    print(f"xla      median {mx*1e3:7.3f} ms  min {min(tx)*1e3:7.3f}  "
          f"max {max(tx)*1e3:7.3f}  ({reps} reps x {iters} iters)")
    print(f"pallas   median {mp*1e3:7.3f} ms  min {min(tp)*1e3:7.3f}  "
          f"max {max(tp)*1e3:7.3f}")
    print(f"packed   median {mk*1e3:7.3f} ms  min {min(tk)*1e3:7.3f}  "
          f"max {max(tk)*1e3:7.3f}")
    for label, t in (("pallas", tp), ("packed", tk)):
        sep = max(t) < min(tx) or max(tx) < min(t)
        print(f"speedup xla/{label} = {mx/statistics.median(t):.3f}x  "
              f"distributions {'SEPARABLE' if sep else 'OVERLAP'}")
    sep = max(tk) < min(tp) or max(tp) < min(tk)
    print(f"speedup pallas/packed = {mp/mk:.3f}x  "
          f"distributions {'SEPARABLE' if sep else 'OVERLAP'}")


if __name__ == "__main__":
    main()
